"""Curriculum-learning machinery: guidance sequencing and setup.

Reproduces the guidance state machine of the reference trainer
(`/root/reference/src/models/flyp_loss.py:30-65,197-254`): training CSVs
carry a ``guidance`` column (diffusion-strength curricula); the trainer
walks guidance values in order, optionally looping each one ``loop_times``
within a fixed ``curriculum_epoch`` budget, or picks the next guidance by
per-guidance eval progress (with a 15% exploration rate).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd


def seq_curri_guid(
    list_guidance: Sequence[int],
    cur_guidance_id: Optional[int] = None,
    cur_str_times: Optional[int] = None,
    ctype: str = "out_curri",
    loop_times: int = 1,
):
    """Advance the guidance cursor (`flyp_loss.py:30-65`)."""
    if ctype == "no_curri":
        cur_guidance_id += 1
        if cur_guidance_id >= len(list_guidance):
            cur_guidance_id = 0
        return cur_guidance_id, list_guidance[cur_guidance_id]

    if ctype == "in_curri":
        if cur_str_times < loop_times:
            cur_str_times += 1
        else:
            cur_str_times = 1
            cur_guidance_id += 1
            if cur_guidance_id >= len(list_guidance):
                cur_guidance_id = len(list_guidance) - 1
        return cur_guidance_id, list_guidance[cur_guidance_id], cur_str_times

    if ctype == "out_curri":
        cur_guidance = 100
        return list(list_guidance).index(cur_guidance), cur_guidance, 1

    raise ValueError(f"invalid ctype {ctype}")


@dataclasses.dataclass
class GuidanceSetting:
    cur_guidance_id: int = 0
    cur_guidance: Optional[int] = None
    list_guidance: Optional[List[int]] = None
    loop_times: int = 1
    len_data: Optional[int] = None
    num_batch_ori: Optional[int] = None


def init_guidance_setting(cfg, logger=None, list_classes=None) -> GuidanceSetting:
    """Derive the curriculum plan from the training CSV
    (`flyp_loss.py:197-254`)."""
    s = GuidanceSetting()

    if cfg.curriculum:
        df = pd.read_csv(cfg.ft_data, delimiter=cfg.csv_separator)
        if cfg.cont_finetune and list_classes is not None:
            df = df[df["label"].isin(list_classes)]
        s.len_data = len(df)
        s.list_guidance = sorted(set(df["guidance"].tolist()))
        s.cur_guidance_id = 0
        s.cur_guidance = s.list_guidance[0]
        if cfg.curriculum_epoch is not None:
            len_ori = len(df[df["guidance"] == 100])
            s.num_batch_ori = int(len_ori / cfg.batch_size)
            len_all_guid = len(df[df["guidance"] != 100])
            total_viewing = s.num_batch_ori * cfg.curriculum_epoch * cfg.batch_size
            s.loop_times = math.ceil(total_viewing / max(len_all_guid, 1))

    elif cfg.baseline:
        s.cur_guidance = 100
        s.list_guidance = [100]
        s.cur_guidance_id = 0

    if cfg.guidance != -1:
        df = pd.read_csv(cfg.ft_data, delimiter=cfg.csv_separator)
        df = df[df["guidance"] == cfg.guidance]
        s.len_data = len(df)
        if cfg.datalimit != -1:
            if logger is not None:
                logger.info(f"Sample {cfg.datalimit} from original dataset")
            df = df.sample(n=min(s.len_data, cfg.datalimit), random_state=1)
            s.len_data = len(df)
        s.list_guidance = [cfg.guidance]
        s.cur_guidance_id = 0
        s.cur_guidance = cfg.guidance

    return s


def choose_guidance_by_progress(
    res_progress: dict,
    list_guidance: Sequence[int],
    explore: bool,
    rng: np.random.Generator,
) -> Tuple[int, int]:
    """Progress-driven guidance selection with 15% exploration
    (`flyp_loss.py:458-475`)."""
    ranked = sorted(res_progress.items(), key=lambda kv: kv[1], reverse=True)
    if explore and rng.uniform() <= 0.15:
        pick = ranked[int(rng.integers(0, len(ranked)))]
    else:
        pick = ranked[0]
    cur_guidance = pick[0]
    return list(list_guidance).index(cur_guidance), cur_guidance
