"""CSV/TSV contrastive dataset: (image, caption) pairs with curriculum
sidecar columns.

Behavioral spec from `/root/reference/src/datasets/laion.py:35-163`:

* TSV columns: ``filepath``, ``title`` (caption), optional ``label``,
  ``guidance`` (curriculum strength), ``img_id``, and extra caption columns
  ``title_1..title_k``.
* ``guidance=g`` filters rows to that curriculum strength; ``datalimit``
  subsamples them.
* ``ori_proportion`` mixes in guidance-100 ("original data") rows at the
  requested fraction of the final set.
* ``list_selection`` keeps rows whose label is in the set.  (The reference
  also *intends* to add 20% out-of-set rows but drops the result of its
  non-inplace ``sample``, adding duplicate in-set rows instead — we keep the
  effective behavior: in-set rows twice is a bug; we just keep in-set rows
  and note the divergence.)
* Items return the transformed image, tokenized caption, and whichever of
  label / path / guidance / img_id / multi-caption stack were requested.

Images may be image files (any PIL format) or ``.npy`` HWC uint8/float
arrays (the reference's ``.pkl`` torch-tensor path, re-expressed without
pickle for safety).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np
import pandas as pd
from PIL import Image

from flyp_tpu.tokenizer import tokenize


class CsvContrastiveDataset:
    def __init__(
        self,
        input_filename: str,
        transform: Callable,
        img_key: str = "filepath",
        caption_key: str = "title",
        sep: str = "\t",
        label_key: Optional[str] = None,
        guidance: Optional[int] = None,
        datalimit: int = -1,
        list_selection: Optional[Sequence[int]] = None,
        ori_proportion: Optional[float] = None,
        return_guidance: bool = False,
        return_img_id: bool = False,
        only_img_id: bool = False,
        seed: int = 0,
    ):
        df = pd.read_csv(input_filename, sep=sep)
        rng = np.random.default_rng(seed)

        if only_img_id:
            df = df[df["img_id"] != -1].sort_values(by="img_id")

        df_ori = df[df["guidance"] == 100] if ori_proportion is not None else None

        if guidance is not None:
            df = df[df["guidance"] == guidance]
            if datalimit != -1 and len(df) > datalimit:
                df = df.sample(n=datalimit, replace=False, ignore_index=True, random_state=seed)

        if ori_proportion is not None:
            num_df = len(df)
            num_ori = min(len(df_ori), int(num_df / (1.0 - ori_proportion) * ori_proportion))
            df_ori = df_ori.sample(n=num_ori, replace=False, ignore_index=True, random_state=seed)
            df = pd.concat([df, df_ori])

        if list_selection is not None:
            df = df[df["label"].isin(list_selection)]

        self.images = df[img_key].tolist()
        self.captions = df[caption_key].tolist()

        caption_cols = [c for c in df.columns if caption_key in c]
        self.extra_captions = [df[f"{caption_key}_{k}"].tolist() for k in range(1, len(caption_cols))]

        self.return_guidance = return_guidance
        self.guidance = df["guidance"].tolist() if return_guidance else None
        self.return_img_id = return_img_id
        self.img_id = df["img_id"].tolist() if return_img_id else None

        self.return_label = label_key is not None
        if self.return_label:
            self.labels = [int(v) for v in df[label_key].tolist()]
            self.paths = df["filepath"].tolist()

        self.transform = transform
        self._rng = rng

    def __len__(self) -> int:
        return len(self.captions)

    def __getitem__(self, idx: int) -> dict:
        return self.get(idx, np.random.default_rng(self._rng.integers(0, 2**63)))

    def get(self, idx: int, rng: np.random.Generator) -> dict:
        path = str(self.images[idx])
        if not path.endswith(".npy") and hasattr(self.transform, "from_path"):
            # Native C++ decode+transform path (GIL-free end to end).
            image = self.transform.from_path(path, rng)
        elif path.endswith(".npy"):
            arr = np.load(path)
            if np.issubdtype(arr.dtype, np.floating):
                # torchvision ToPILImage semantics for float arrays: [0,1]
                # scales by 255 with a truncating byte cast
                # (`pic.mul(255).byte()`) — matching the reference's
                # .pkl-tensor branch (`laion.py:123-127`); a plain uint8
                # cast would truncate [0,1] floats to black.
                arr = arr * 255
            image = self.transform(Image.fromarray(arr.astype(np.uint8)), rng)
        else:
            image = self.transform(Image.open(path), rng)

        sample = {
            "image": image.astype(np.float32),
            "tokens": tokenize(str(self.captions[idx]))[0],
        }

        if self.extra_captions:
            stack = [tokenize(str(col[idx]))[0] for col in self.extra_captions]
            stack.append(sample["tokens"])
            stack = np.stack(stack, axis=0)
            sample["tokens_multi"] = stack[rng.permutation(stack.shape[0])]

        if self.return_label:
            sample["label"] = np.int32(self.labels[idx])
            sample["path"] = self.paths[idx]
        if self.return_guidance:
            sample["guidance"] = np.int32(self.guidance[idx])
        if self.return_img_id:
            sample["img_id"] = np.int64(self.img_id[idx])
        return sample
