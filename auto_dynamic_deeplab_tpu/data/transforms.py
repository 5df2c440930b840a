"""Preprocessing pipelines — behavioral match of dataloaders/custom_transforms.py
(:238-347), NumPy/PIL on host.

train_preprocess: random hflip → random log-uniform scale in [0.5, 2] (or a
fixed scale for search) → normalize → zero-pad to crop (mask pad 255) →
random crop. eval/full_image variants pad only.

Output layout is NHWC float32 (TPU-native) + int32 masks.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
from PIL import Image

CITYSCAPES_MEAN = (0.29866842, 0.30135223, 0.30561872)
CITYSCAPES_STD = (0.23925215, 0.23859318, 0.2385942)
IGNORE_LABEL = 255


def _normalize(img: Image.Image, mean, std) -> np.ndarray:
    x = np.asarray(img, np.float32) / 255.0
    return (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def _pad_to(image: np.ndarray, mask: np.ndarray, crop: Tuple[int, int]):
    h, w = image.shape[:2]
    pad_tb = max(0, crop[0] - h)
    pad_lr = max(0, crop[1] - w)
    if pad_tb or pad_lr:
        image = np.pad(image, ((0, pad_tb), (0, pad_lr), (0, 0)))
        mask = np.pad(mask, ((0, pad_tb), (0, pad_lr)), constant_values=IGNORE_LABEL)
    return image, mask


def train_preprocess(
    img: Image.Image,
    mask: Image.Image,
    crop_size: Tuple[int, int],
    mean=CITYSCAPES_MEAN,
    std=CITYSCAPES_STD,
    scale: float = 0.0,
    rng: Optional[np.random.RandomState] = None,
):
    rng = rng or np.random
    if rng.random_sample() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
        mask = mask.transpose(Image.FLIP_LEFT_RIGHT)

    w, h = img.size
    if scale == 0.0:
        lo, hi = math.log(0.5, 2), math.log(2.0, 2)
        random_scale = 2.0 ** (lo + rng.random_sample() * (hi - lo))
    else:
        random_scale = scale
    new_size = (int(round(w * random_scale)), int(round(h * random_scale)))
    if new_size != (w, h):
        img = img.resize(new_size, Image.LANCZOS)  # reference: Image.ANTIALIAS
        mask = mask.resize(new_size, Image.NEAREST)

    image = _normalize(img, mean, std)
    m = np.asarray(mask, np.int64).astype(np.int32)
    image, m = _pad_to(image, m, crop_size)

    h, w = image.shape[:2]
    i = rng.randint(0, h - crop_size[0] + 1)
    j = rng.randint(0, w - crop_size[1] + 1)
    image = image[i : i + crop_size[0], j : j + crop_size[1]]
    m = m[i : i + crop_size[0], j : j + crop_size[1]]
    return image, m


def eval_preprocess(
    img: Image.Image,
    mask: Image.Image,
    crop_size: Tuple[int, int],
    mean=CITYSCAPES_MEAN,
    std=CITYSCAPES_STD,
    rng: Optional[np.random.RandomState] = None,
):
    """Random-crop eval (custom_transforms.py:289-320)."""
    rng = rng or np.random
    image = _normalize(img, mean, std)
    m = np.asarray(mask, np.int64).astype(np.int32)
    image, m = _pad_to(image, m, crop_size)
    h, w = image.shape[:2]
    i = rng.randint(0, h - crop_size[0] + 1)
    j = rng.randint(0, w - crop_size[1] + 1)
    return (
        image[i : i + crop_size[0], j : j + crop_size[1]],
        m[i : i + crop_size[0], j : j + crop_size[1]],
    )


def full_image_eval_preprocess(
    img: Image.Image,
    mask: Image.Image,
    crop_size: Tuple[int, int],
    mean=CITYSCAPES_MEAN,
    std=CITYSCAPES_STD,
):
    """Pad-only full-image eval (custom_transforms.py:322-347): e.g.
    1024x2048 → 1025x2049 padded (image 0, mask 255)."""
    image = _normalize(img, mean, std)
    m = np.asarray(mask, np.int64).astype(np.int32)
    return _pad_to(image, m, crop_size)


# ---------------------------------------------------------------- native path

def train_preprocess_native(
    img: Image.Image,
    mask: Image.Image,
    crop_size: Tuple[int, int],
    mean=CITYSCAPES_MEAN,
    std=CITYSCAPES_STD,
    scale: float = 0.0,
    rng: Optional[np.random.RandomState] = None,
):
    """Fused single-pass C++ augmentation (csrc/augment.cpp). Draws the same
    random decisions in the same order as ``train_preprocess`` so seeded runs
    stay comparable; the image resampling filter is a separable triangle
    (antialiased) rather than PIL LANCZOS — an augmentation-equivalent
    substitution, exact at scale==1.
    """
    from .native import augment_train_native

    rng = rng or np.random
    flip = rng.random_sample() < 0.5
    w, h = img.size
    if scale == 0.0:
        lo, hi = math.log(0.5, 2), math.log(2.0, 2)
        random_scale = 2.0 ** (lo + rng.random_sample() * (hi - lo))
    else:
        random_scale = scale
    nh, nw = int(round(h * random_scale)), int(round(w * random_scale))
    pad_h, pad_w = max(nh, crop_size[0]), max(nw, crop_size[1])
    i = rng.randint(0, pad_h - crop_size[0] + 1)
    j = rng.randint(0, pad_w - crop_size[1] + 1)
    return augment_train_native(
        np.asarray(img, np.uint8),
        np.asarray(mask, np.uint8),
        crop_size, mean, std, float(random_scale), bool(flip), int(i), int(j),
    )


def full_image_eval_preprocess_native(
    img: Image.Image,
    mask: Image.Image,
    crop_size: Tuple[int, int],
    mean=CITYSCAPES_MEAN,
    std=CITYSCAPES_STD,
):
    """Fused normalize+pad (exact parity with the Python path)."""
    from .native import eval_full_native

    return eval_full_native(
        np.asarray(img, np.uint8), np.asarray(mask, np.uint8),
        crop_size, mean, std,
    )
