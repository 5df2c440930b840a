"""ON-DEVICE input preprocessing: the host ships raw uint8 pixels, one jitted
XLA program does flip/scale/crop/normalize/pad on the TPU.

TPU-native answer to dataloaders/custom_transforms.py:238-347 (SURVEY §7
step 4 north star). The host augmentation engines (transforms.py /
csrc/augment.cpp) cost ~10-77 ms/sample of host time; at bs8/133 ms-step the
chip needs a sample every 16.6 ms, so on few-core hosts the input pipeline —
not the device — bounds training throughput. This module moves every
per-pixel stage on device:

  train:  random hflip → random log-uniform scale [0.5, 2] → normalize →
          zero-pad (mask 255) → random crop     (one fused program)
  eval:   normalize → pad to eval canvas        (one fused program)

Design: the scaled image is NEVER materialized. For a fixed (static) output
crop, flip+scale+crop+pad compose into an affine index map per axis, so the
whole augmentation is two axis-separable gathers (`jnp.take` along rows, then
columns) with bilinear weights — dense vectorized loads, no scatter, no
dynamic shapes; the four augmentation scalars (scale, flip, crop offsets)
enter as ARRAYS so one compiled program serves every draw. Bilinear replaces
the host path's LANCZOS (an augmentation-equivalent substitution, like the
native engine's triangle filter — exact at scale==1); labels sample nearest
with out-of-canvas → 255, matching the host semantics (normalize-then-pad:
pad value 0 in NORMALIZED space).

Randomness: `sample_augment_params` draws (flip, scale, i, j) on host with
the SAME draw order as transforms.train_preprocess_native, so seeded runs
are comparable across host/native/device engines.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .transforms import CITYSCAPES_MEAN, CITYSCAPES_STD, IGNORE_LABEL


def sample_augment_params(
    src_hw: Tuple[int, int],
    crop_size: Tuple[int, int],
    scale: float = 0.0,
    rng: Optional[np.random.RandomState] = None,
):
    """Host-side draw of one sample's augmentation scalars.

    Same draw order as transforms.train_preprocess_native (flip, scale, crop
    i, crop j) so a seeded rng yields the same augmentation decisions on
    either engine."""
    rng = rng or np.random
    h, w = src_hw
    flip = rng.random_sample() < 0.5
    if scale == 0.0:
        lo, hi = math.log(0.5, 2), math.log(2.0, 2)
        s = 2.0 ** (lo + rng.random_sample() * (hi - lo))
    else:
        s = scale
    nh, nw = int(round(h * s)), int(round(w * s))
    pad_h, pad_w = max(nh, crop_size[0]), max(nw, crop_size[1])
    i = rng.randint(0, pad_h - crop_size[0] + 1)
    j = rng.randint(0, pad_w - crop_size[1] + 1)
    return np.float32(s), bool(flip), np.int32(i), np.int32(j)


def _axis_indices(out_len, off, scale, src_len, flip):
    """Bilinear source indices+weights along one axis for output pixels
    [off, off+out_len) of the virtually-scaled (and optionally flipped)
    image. Returns (i0, i1, frac, valid)."""
    dst = jnp.arange(out_len, dtype=jnp.float32) + off.astype(jnp.float32)
    # pixel-center convention (PIL): src = (dst + 0.5) / s - 0.5
    src = (dst + 0.5) / scale - 0.5
    src = jnp.where(flip, (src_len - 1) - src, src)
    valid = dst < jnp.round(src_len * scale)  # inside the scaled image
    src = jnp.clip(src, 0.0, src_len - 1)  # border replicate (PIL-like)
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, src_len - 1)
    return i0, i1, src - i0.astype(jnp.float32), valid


def _augment_one(img, mask, s, flip, i, j, *, crop, mean, std):
    """(H, W, 3) uint8 + (H, W) uint8 → (ch, cw, 3) f32 + (ch, cw) i32."""
    h, w = img.shape[:2]
    ch, cw = crop
    y0, y1, fy, vy = _axis_indices(ch, i, s, h, flip=jnp.bool_(False))
    x0, x1, fx, vx = _axis_indices(cw, j, s, w, flip=flip)

    imf = img.astype(jnp.float32)
    # rows first (gather along H), then columns — two dense takes per tap
    rows = (
        jnp.take(imf, y0, axis=0) * (1.0 - fy)[:, None, None]
        + jnp.take(imf, y1, axis=0) * fy[:, None, None]
    )  # (ch, W, 3)
    out = (
        jnp.take(rows, x0, axis=1) * (1.0 - fx)[None, :, None]
        + jnp.take(rows, x1, axis=1) * fx[None, :, None]
    )  # (ch, cw, 3)
    out = (out / 255.0 - jnp.asarray(mean)) / jnp.asarray(std)
    valid = vy[:, None] & vx[None, :]
    out = jnp.where(valid[..., None], out, 0.0)

    # nearest-neighbor label sampling: round == floor after +0.5*frac trick
    my = jnp.where(fy >= 0.5, y1, y0)
    mx = jnp.where(fx >= 0.5, x1, x0)
    m = jnp.take(jnp.take(mask, my, axis=0), mx, axis=1).astype(jnp.int32)
    m = jnp.where(valid, m, IGNORE_LABEL)
    return out, m


def make_train_augment(
    src_hw: Tuple[int, int],
    crop_size: Tuple[int, int],
    mean=CITYSCAPES_MEAN,
    std=CITYSCAPES_STD,
):
    """Compiled batched augmentation program.

    Returns fn(images_u8 (N,H,W,3), masks_u8 (N,H,W), scales (N,),
    flips (N,) bool, offs_i (N,), offs_j (N,)) → (images f32 NHWC at
    crop_size, labels i32). One program for every random draw."""
    one = partial(
        _augment_one,
        crop=tuple(crop_size),
        mean=np.asarray(mean, np.float32),
        std=np.asarray(std, np.float32),
    )

    @jax.jit
    def augment(images, masks, scales, flips, offs_i, offs_j):
        return jax.vmap(one)(images, masks, scales, flips, offs_i, offs_j)

    return augment


def make_eval_preprocess(
    src_hw: Tuple[int, int],
    out_hw: Tuple[int, int],
    mean=CITYSCAPES_MEAN,
    std=CITYSCAPES_STD,
):
    """Compiled normalize+pad for full-image eval (image 0, mask 255):
    e.g. 1024x2048 uint8 → 1025x2049 f32 (custom_transforms.py:322-347)."""
    h, w = src_hw
    ph, pw = max(0, out_hw[0] - h), max(0, out_hw[1] - w)
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)

    @jax.jit
    def preprocess(images, masks):
        x = (images.astype(jnp.float32) / 255.0 - mean) / std
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        m = jnp.pad(
            masks.astype(jnp.int32), ((0, 0), (0, ph), (0, pw)),
            constant_values=IGNORE_LABEL,
        )
        return x, m

    return preprocess


def augment_batch(
    augment_fn,
    images_u8: np.ndarray,
    masks_u8: np.ndarray,
    src_hw: Tuple[int, int],
    crop_size: Tuple[int, int],
    scale: float = 0.0,
    rngs=None,
):
    """Convenience wrapper: draw per-sample params on host (seeded), run the
    device program. `rngs` is a list of per-sample RandomStates (the loader's
    per-item streams) or None for global numpy."""
    n = images_u8.shape[0]
    params = [
        sample_augment_params(
            src_hw, crop_size, scale=scale,
            rng=(rngs[k] if rngs is not None else None),
        )
        for k in range(n)
    ]
    s, f, i, j = (np.asarray([p[k] for p in params]) for k in range(4))
    return augment_fn(
        jnp.asarray(images_u8), jnp.asarray(masks_u8),
        jnp.asarray(s, jnp.float32), jnp.asarray(f, bool),
        jnp.asarray(i, jnp.int32), jnp.asarray(j, jnp.int32),
    )
