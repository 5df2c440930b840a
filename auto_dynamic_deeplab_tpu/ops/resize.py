"""Bilinear resize with exact PyTorch semantics, NHWC, jit-friendly.

The reference mixes two interpolation conventions (SURVEY.md §7 "hard parts"):
  * ``F.interpolate(mode='bilinear')`` → align_corners=False
    (modeling/ADD.py:77, modeling/decoder.py:24,:28, cell_level_search.py:92)
  * ``nn.Upsample(align_corners=True)`` → align_corners=True
    (modeling/aspp_train.py:54-55, model_search.py:600)

``jax.image.resize`` matches neither exactly (it antialiases and weights
edges differently), so we implement the gather math directly. Output shapes
are static, which keeps everything inside one XLA program.
"""
from __future__ import annotations

import jax.numpy as jnp


def _coords(out_size: int, in_size: int, align_corners: bool):
    """Source coordinates + gather indices/weights for one spatial axis."""
    i = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        if out_size == 1:
            src = jnp.zeros_like(i)
        else:
            src = i * (float(in_size - 1) / float(out_size - 1))
    else:
        src = (i + 0.5) * (float(in_size) / float(out_size)) - 0.5
        src = jnp.clip(src, 0.0, float(in_size - 1))
    i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    w1 = src - i0.astype(jnp.float32)
    w0 = 1.0 - w1
    return i0, i1, w0, w1


def resize_bilinear(x: jnp.ndarray, size, align_corners: bool = False) -> jnp.ndarray:
    """Bilinearly resize NHWC ``x`` to spatial ``size`` = (H_out, W_out).

    Matches ``torch.nn.functional.interpolate(mode='bilinear',
    align_corners=align_corners)`` bit-for-bit in exact arithmetic.
    """
    h_out, w_out = int(size[0]), int(size[1])
    n, h_in, w_in, c = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)

    i0, i1, wh0, wh1 = _coords(h_out, h_in, align_corners)
    top = jnp.take(xf, i0, axis=1)
    bot = jnp.take(xf, i1, axis=1)
    xf = top * wh0[None, :, None, None] + bot * wh1[None, :, None, None]

    j0, j1, ww0, ww1 = _coords(w_out, w_in, align_corners)
    left = jnp.take(xf, j0, axis=2)
    right = jnp.take(xf, j1, axis=2)
    xf = left * ww0[None, None, :, None] + right * ww1[None, None, :, None]
    return xf.astype(orig_dtype)


def scale_dimension(dim: int, scale: float) -> int:
    """The reference's odd-size scaling rule (modeling/ADD.py:65-66)."""
    return int((float(dim) - 1.0) * scale + 1.0)


def scale_dimension_search(dim: int, scale: float) -> int:
    """Search-cell variant (cell_level_search.py:80-82): even dims use dim*scale."""
    return int((float(dim) - 1.0) * scale + 1.0) if dim % 2 else int(dim * scale)
