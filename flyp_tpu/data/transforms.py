"""CLIP image preprocessing on the host (PIL + numpy, NHWC output).

Reproduces the reference pipelines (`/root/reference/clip/clip.py:66-82`):

* train: RandomResizedCrop(n_px, scale=(0.9, 1.0), bicubic) -> RGB -> tensor
  -> normalize
* eval:  Resize(shortest side, bicubic) -> CenterCrop -> RGB -> tensor ->
  normalize

The crop-sampling algorithm matches torchvision's RandomResizedCrop (10
area/ratio attempts, center-crop fallback) so augmentation statistics match
the reference run; RNG is an explicit ``numpy.random.Generator`` for
reproducibility across loader workers.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np
from PIL import Image

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)

_BICUBIC = Image.BICUBIC


def _to_rgb(img: Image.Image) -> Image.Image:
    return img.convert("RGB") if img.mode != "RGB" else img


def to_normalized_array(img: Image.Image) -> np.ndarray:
    """PIL -> float32 HWC in CLIP-normalized space."""
    arr = np.asarray(_to_rgb(img), dtype=np.float32) / 255.0
    return (arr - CLIP_MEAN) / CLIP_STD


def resize_shortest(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    if w <= h:
        new_w, new_h = size, max(1, round(size * h / w))
    else:
        new_w, new_h = max(1, round(size * w / h)), size
    return img.resize((new_w, new_h), _BICUBIC)


def center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    left = round((w - size) / 2)
    top = round((h - size) / 2)
    return img.crop((left, top, left + size, top + size))


def sample_resized_crop_box(
    w: int,
    h: int,
    rng: np.random.Generator,
    scale: Tuple[float, float] = (0.9, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> Tuple[int, int, int, int]:
    """torchvision RandomResizedCrop.get_params: (top, left, height, width)."""
    area = w * h
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            top = int(rng.integers(0, h - ch + 1))
            left = int(rng.integers(0, w - cw + 1))
            return top, left, ch, cw
    # Fallback: center crop at the closest valid aspect.
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        ch, cw = h, int(round(h * ratio[1]))
    else:
        cw, ch = w, h
    top = (h - ch) // 2
    left = (w - cw) // 2
    return top, left, ch, cw


def train_transform(n_px: int):
    """RandomResizedCrop(0.9-1.0, bicubic) + normalize. Returns fn(img, rng)."""

    def apply(img: Image.Image, rng: np.random.Generator) -> np.ndarray:
        w, h = img.size
        top, left, ch, cw = sample_resized_crop_box(w, h, rng)
        img = img.resize((n_px, n_px), _BICUBIC, box=(left, top, left + cw, top + ch))
        return to_normalized_array(img)

    return apply


def eval_transform(n_px: int):
    """Resize shortest side + center crop + normalize. Returns fn(img)."""

    def apply(img: Image.Image, rng: np.random.Generator | None = None) -> np.ndarray:
        img = center_crop(resize_shortest(img, n_px), n_px)
        return to_normalized_array(img)

    return apply
