"""Production serving front-end for (fine-tuned) CLIP models.

The reference has no serving story — deployment means hand-rolling a torch
loop around ``ImageClassifier`` (`/root/reference/src/models/modeling.py:
78-104`).  On TPU the serving problem is shape discipline: every distinct
input shape is a separate XLA compilation (minutes on a tunneled pod), so a
server must quantize request sizes onto a small set of pre-compiled buckets
and keep the device busy while the host shuttles bytes.

``ClipServer`` packages the measured-fast pieces of this repo behind a
stable API:

* **Batch buckets** — requests pad to the smallest compiled batch bucket;
  oversize requests split into max-bucket chunks plus a bucketed tail.  All
  chunks are dispatched before any is fetched, so the host↔device
  round-trips overlap device compute (the zeroshot-builder launch pattern,
  evaluation/zeroshot.py).
* **Exact text width bucketing** — captions tokenize to the context length
  and are sliced to the batch's bucketed max-EOT width
  (``tokenizer.shrink_context``): bit-identical features (causal tower +
  EOT pooling), ~2.4x less text-tower work on prompt-length captions.
* **bf16 host casts** — float images cast on the host when the model
  computes in bf16, halving H2D bytes (utils/pipeline.host_cast_images).
* **Pipelined streams** — ``stream_logits``/``stream_features`` keep one
  batch in flight (utils/pipeline.OneStepLag; a synchronous per-batch fetch
  costs 13-21% on a tunneled chip, docs/BENCHMARKS.md).
* **AOT warmup** — compile every serving shape before the first request.

The forward routes to the inference attention kernel automatically (no
backward-residual writes, models/layers.py); measured serving rates for all
nine model configs are in docs/SERVING.md (ViT-B/16 bs256: 3947 img/s,
72.1% fwd MFU on one v5e chip).
"""

from __future__ import annotations

import collections
import functools
from typing import Iterable, Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flyp_tpu.models.clip import CLIPModel
from flyp_tpu.models.head import ClassificationHead
from flyp_tpu.tokenizer import shrink_context, tokenize
from flyp_tpu.utils.pipeline import OneStepLag, host_cast_images


@functools.lru_cache(maxsize=8)
def _server_fns(model: CLIPModel, normalize: bool):
    """One jitted (image-features, text-features, logits) triple per model
    config: servers built for successive checkpoints of the same config
    reuse the compiled executables (head/params are traced arguments)."""

    def img_fn(variables, images):
        return model.apply(variables, images, normalize=normalize, method="encode_image")

    def txt_fn(variables, tokens):
        return model.apply(variables, tokens, normalize=normalize, method="encode_text")

    def logits_fn(variables, head, images):
        # Raw tower features: zero-shot heads normalize internally
        # (ClassificationHead.create(normalize=True)); normalizing here too
        # would divide twice (by ~1.0) and drift bitwise from the evaluator
        # path (evaluation/classifier.py) this must match exactly.
        feats = model.apply(variables, images, method="encode_image")
        return head(feats)

    return jax.jit(img_fn), jax.jit(txt_fn), jax.jit(logits_fn)


class ClipServer:
    """Bucketed, pipelined CLIP inference on one device.

    ``image_buckets`` are the compiled batch sizes (ascending); a request of
    n rows pads to the smallest bucket >= n, and n > max(buckets) splits
    into max-bucket chunks + a bucketed tail.  ``head`` (optional) enables
    :meth:`classify`; build one from classnames with
    :meth:`for_classification`.  Features are L2-normalized (``normalize=
    False`` for raw tower outputs).  Multi-chip serving is just this object
    under ``jax.jit`` sharding — feature extraction is embarrassingly
    batch-parallel; one chip is usually latency-optimal per replica.

    **Concurrency**: every request method (``encode_images``,
    ``encode_texts``, ``classify``, ``top_k``, and the ``stream_*``
    iterators) is REENTRANT — each call owns its buffers/lag queue, the
    instance attributes it reads (``variables``, ``head``, buckets) are
    never mutated after construction, and JAX's dispatch is thread-safe —
    so concurrent callers are safe and simply share device throughput
    (asserted by ``test_serving.py::test_concurrent_callers_match_sequential``).
    Results within one call stay ordered; fairness across callers is
    whatever the device queue does.  Setup-time operations (``warmup``, or
    swapping ``variables``/``head`` by hand) are NOT synchronized with
    in-flight requests — finish them before serving traffic.
    """

    def __init__(
        self,
        model: CLIPModel,
        variables: dict,
        head: Optional[ClassificationHead] = None,
        image_buckets: Sequence[int] = (8, 64, 256),
        normalize: bool = True,
    ):
        if not image_buckets or list(image_buckets) != sorted(set(image_buckets)):
            raise ValueError(f"image_buckets must be ascending and unique, got {image_buckets!r}")
        self.model = model
        self.variables = variables
        self.head = head
        self.image_buckets = tuple(int(b) for b in image_buckets)
        self.normalize = normalize
        self._img_fn, self._txt_fn, self._logits_fn = _server_fns(model, normalize)

    @classmethod
    def for_classification(
        cls,
        model: CLIPModel,
        variables: dict,
        classnames: Sequence[str],
        template,
        **kwargs,
    ) -> "ClipServer":
        """Server with a zero-shot head built from the model's own text tower
        (mean-of-templates class embeddings, evaluation/zeroshot.py)."""
        from flyp_tpu.evaluation.zeroshot import get_zeroshot_classifier

        head = get_zeroshot_classifier(model, variables, classnames, template)
        return cls(model, variables, head=head, **kwargs)

    @classmethod
    def from_checkpoint(
        cls,
        path: str,
        model: str = "ViT-B/16",
        classnames: Optional[Sequence[str]] = None,
        template=None,
        compute_dtype: str = "bfloat16",
        config_override=None,
        **kwargs,
    ) -> "ClipServer":
        """One call from a training artifact to a running server.

        ``path`` accepts everything ``--clip_load`` does (models/factory.py
        sniffs the layout): a trainer ``checkpoint_{e}`` /
        ``checkpoint_{e}_step_{i}`` directory (optimizer + cursor state
        dropped, batch_stats kept for BN towers), a bare ``save_params``
        tree, or a torch CLIP ``.pt``/``.bin`` via the converter.  Pass
        ``classnames`` (+ ``template``) to also build the zero-shot head.
        ``compute_dtype`` defaults to the measured serving configuration
        (bf16, docs/SERVING.md); use ``"float32"`` for bitwise CPU parity
        with fp32 evaluators.
        """
        from types import SimpleNamespace

        from flyp_tpu.models.factory import build_clip_model

        cfg = SimpleNamespace(
            model=model, clip_load=path, compute_dtype=compute_dtype, remat=False, seed=0
        )
        clip_model, variables = build_clip_model(cfg, config_override=config_override)
        if classnames is not None:
            if template is None:
                from flyp_tpu.templates import simple_template

                template = simple_template
            return cls.for_classification(clip_model, variables, classnames, template, **kwargs)
        return cls(clip_model, variables, **kwargs)

    # -- bucketing -----------------------------------------------------------

    def bucket_for(self, n: int) -> int:
        for b in self.image_buckets:
            if n <= b:
                return b
        return self.image_buckets[-1]

    def _chunks(self, n: int) -> list:
        """(start, count, bucket) spans covering n rows."""
        out, start, bmax = [], 0, self.image_buckets[-1]
        while n - start > bmax:
            out.append((start, bmax, bmax))
            start += bmax
        out.append((start, n - start, self.bucket_for(n - start)))
        return out

    def _pad_rows(self, arr: np.ndarray, bucket: int) -> np.ndarray:
        if arr.shape[0] == bucket:
            return arr
        pad = np.zeros((bucket - arr.shape[0], *arr.shape[1:]), arr.dtype)
        return np.concatenate([arr, pad], axis=0)

    def _prep_images(self, images) -> np.ndarray:
        return host_cast_images(np.asarray(images), self.model.compute_dtype)

    def _run_chunks(self, arr: np.ndarray, dispatch, window: int = 4) -> np.ndarray:
        """Dispatch bucket-padded chunks with at most ``window`` in flight.

        The lookahead overlaps host<->device transfers with device compute
        (the zeroshot-builder launch pattern) while bounding live device
        buffers — an unbounded dispatch of a huge request would queue every
        chunk's input in HBM before the first fetch releases one."""
        out: list = []
        pending: collections.deque = collections.deque()
        for s, c, b in self._chunks(arr.shape[0]):
            pending.append((dispatch(jnp.asarray(self._pad_rows(arr[s : s + c], b))), c))
            if len(pending) > window:
                h, cc = pending.popleft()
                out.append(np.asarray(h)[:cc])
        while pending:
            h, cc = pending.popleft()
            out.append(np.asarray(h)[:cc])
        return np.concatenate(out, axis=0)

    # -- request APIs ---------------------------------------------------------

    def encode_images(self, images) -> np.ndarray:
        """[n, H, W, C] host array -> [n, D] features (any n)."""
        images = self._prep_images(images)
        return self._run_chunks(images, lambda x: self._img_fn(self.variables, x))

    def encode_texts(self, texts) -> np.ndarray:
        """Captions (list of str, or a pre-tokenized [n, ctx] int array) ->
        [n, D] features.  Width is sliced to the bucketed max EOT — exact."""
        tokens = tokenize(list(texts)) if not isinstance(texts, np.ndarray) else texts
        tokens = shrink_context(np.asarray(tokens))
        return self._run_chunks(tokens, lambda t: self._txt_fn(self.variables, t))

    def classify(self, images) -> np.ndarray:
        """[n, H, W, C] -> [n, num_classes] zero-shot logits."""
        if self.head is None:
            raise ValueError("classify() needs a head; use for_classification(...) or pass head=")
        images = self._prep_images(images)
        return self._run_chunks(images, lambda x: self._logits_fn(self.variables, self.head, x))

    def top_k(self, images, k: int = 5) -> Tuple[np.ndarray, np.ndarray]:
        """(probs [n, k], class indices [n, k]), descending.  ``k`` clamps
        to the number of classes."""
        logits = self.classify(images).astype(np.float32)
        probs = np.exp(logits - logits.max(axis=1, keepdims=True))
        probs /= probs.sum(axis=1, keepdims=True)
        k = min(int(k), probs.shape[1])
        idx = np.argpartition(-probs, min(k, probs.shape[1] - 1), axis=1)[:, :k]
        order = np.take_along_axis(probs, idx, axis=1).argsort(axis=1)[:, ::-1]
        idx = np.take_along_axis(idx, order, axis=1)
        return np.take_along_axis(probs, idx, axis=1), idx

    def similarity(self, image_features: np.ndarray, text_features: np.ndarray) -> np.ndarray:
        """[n, D] x [m, D] -> [n, m] cosine-similarity logits scaled by the
        model's learned temperature (the retrieval score, `clip/model.py:
        371-378`).  Features must come from this server (normalized)."""
        scale = float(np.exp(np.asarray(self.variables["params"]["logit_scale"], np.float32)))
        return scale * np.asarray(image_features, np.float32) @ np.asarray(text_features, np.float32).T

    # -- throughput mode ------------------------------------------------------

    def _stream(self, batches: Iterable, dispatch) -> Iterator[np.ndarray]:
        lag = OneStepLag()
        for batch in batches:
            arr = self._prep_images(batch)
            n = arr.shape[0]
            if n > self.image_buckets[-1]:
                raise ValueError(
                    f"stream batches must fit the largest bucket ({self.image_buckets[-1]}); got {n}"
                )
            handle = dispatch(jnp.asarray(self._pad_rows(arr, self.bucket_for(n))))
            prev = lag.push((handle, n))
            if prev is not None:
                yield np.asarray(prev[0])[: prev[1]]
        prev = lag.flush()
        if prev is not None:
            yield np.asarray(prev[0])[: prev[1]]

    def stream_features(self, batches: Iterable) -> Iterator[np.ndarray]:
        """Pipelined :meth:`encode_images` over an iterator of batches: one
        batch always in flight, results yielded in order."""
        return self._stream(batches, lambda x: self._img_fn(self.variables, x))

    def stream_logits(self, batches: Iterable) -> Iterator[np.ndarray]:
        if self.head is None:
            raise ValueError("stream_logits() needs a head")
        return self._stream(batches, lambda x: self._logits_fn(self.variables, self.head, x))

    # -- warmup ---------------------------------------------------------------

    def warmup(self, text_widths: Sequence[int] = (16, 32)) -> int:
        """Compile every serving shape before the first request: all image
        buckets (features + logits when a head is set) and the full
        (batch bucket x text width) grid.  Returns the number of programs
        warmed.  On a tunneled TPU each distinct shape costs minutes to
        compile — warm exactly the shapes the deployment serves."""
        px = self.model.config.vision.image_size
        img_dtype = np.dtype("float32")
        ctx = self.model.config.text.context_length
        count = 0
        last = None
        for b in self.image_buckets:
            images = host_cast_images(np.zeros((b, px, px, 3), img_dtype), self.model.compute_dtype)
            last = self._img_fn(self.variables, jnp.asarray(images))
            count += 1
            if self.head is not None:
                last = self._logits_fn(self.variables, self.head, jnp.asarray(images))
                count += 1
        for w in text_widths:
            for b in self.image_buckets:  # text batches bucket the same way
                tokens = np.zeros((b, min(int(w), ctx)), np.int32)
                tokens[:, 0] = 1  # a nonzero EOT so pooling indexes sanely
                last = self._txt_fn(self.variables, jnp.asarray(tokens))
                count += 1
        if last is not None:
            # Only a host transfer synchronizes on the tunneled TPU platform.
            float(jax.device_get(last.ravel()[0]))
        return count
