"""Bilinear resize with exact PyTorch semantics, NHWC, jit-friendly.

The reference mixes two interpolation conventions (SURVEY.md §7 "hard parts"):
  * ``F.interpolate(mode='bilinear')`` → align_corners=False
    (modeling/ADD.py:77, modeling/decoder.py:24,:28, cell_level_search.py:92)
  * ``nn.Upsample(align_corners=True)`` → align_corners=True
    (modeling/aspp_train.py:54-55, model_search.py:600)

``jax.image.resize`` matches neither exactly (it antialiases and weights
edges differently), so we implement the interpolation math directly. Output
shapes are static, which keeps everything inside one XLA program.

TPU-first implementation: large upscales ride the MXU. Per-axis bilinear
interpolation is a *banded* linear map (two nonzeros per output row), so the
resize is two block-banded matmuls against host-constant weight matrices:
the output axis is cut into static chunks and each chunk contracts only the
input span its band touches (~chunk/scale + 2 columns). Compared to the
gather formulation (which materializes ~2 full-size intermediates per axis —
~1 GB of HBM traffic for the decoder's 129x257 -> 1025x2049 x19 logits
upsample) this reads the input once and writes the output once; compared to
a dense interpolation matmul it does ~scale× fewer MXU FLOPs. Every dropped
term is an exact 0.0 and accumulation is fp32 HIGHEST, so results are
identical to the gather math. Small resizes keep the gather path.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# Use the banded-matmul path when upscaling and the output tensor is at
# least this many elements (below that, gather fusion is already cheap).
_MATMUL_MIN_OUT_ELEMS = 1 << 21
_CHUNK = 256  # output rows/cols per band block


def _coords_np(out_size: int, in_size: int, align_corners: bool):
    """Source coordinates + gather indices/weights for one spatial axis
    (host numpy: shapes are static, so these are XLA constants)."""
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros_like(i)
        else:
            src = i * (float(in_size - 1) / float(out_size - 1))
    else:
        src = (i + 0.5) * (float(in_size) / float(out_size)) - 0.5
        src = np.clip(src, 0.0, float(in_size - 1))
    i0 = np.clip(np.floor(src).astype(np.int32), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    w0 = np.float32(1.0) - w1
    return i0, i1, w0, w1


def _interp_matrix(out_size: int, in_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) fp32 interpolation matrix M with M @ x = resized x."""
    i0, i1, w0, w1 = _coords_np(out_size, in_size, align_corners)
    m = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, i0), w0)
    np.add.at(m, (rows, i1), w1)
    return m


def _band_plan(out_size: int, in_size: int, align_corners: bool):
    """Static chunk plan for one axis: [(o0, o1, i0, i1, M_chunk), ...] where
    M_chunk is the (o1-o0, i1-i0) fp32 slice of the interpolation matrix."""
    i0s, i1s, w0s, w1s = _coords_np(out_size, in_size, align_corners)
    plan = []
    for o0 in range(0, out_size, _CHUNK):
        o1 = min(o0 + _CHUNK, out_size)
        lo = int(i0s[o0:o1].min())
        hi = int(i1s[o0:o1].max()) + 1
        m = np.zeros((o1 - o0, hi - lo), np.float32)
        rows = np.arange(o1 - o0)
        np.add.at(m, (rows, i0s[o0:o1] - lo), w0s[o0:o1])
        np.add.at(m, (rows, i1s[o0:o1] - lo), w1s[o0:o1])
        plan.append((o0, o1, lo, hi, m))
    return plan


def _axis_banded_matmul(xf: jnp.ndarray, axis: int, out_size: int, align_corners: bool):
    """Resize one spatial axis (1=H, 2=W) via block-banded matmuls.

    fp32 inputs use fp32 weights at HIGHEST precision (bit-exact vs the
    gather math). Lower-precision inputs keep their dtype on the MXU with
    fp32 accumulation (weights rounded once to the input dtype).
    """
    is_f32 = xf.dtype == jnp.float32
    prec = jax.lax.Precision.HIGHEST if is_f32 else jax.lax.Precision.DEFAULT
    chunks = []
    for _, _, lo, hi, m in _band_plan(out_size, xf.shape[axis], align_corners):
        mj = jnp.asarray(m if is_f32 else m.astype(xf.dtype))
        if axis == 1:
            seg = jax.lax.slice_in_dim(xf, lo, hi, axis=1)
            y = jnp.einsum(
                "ph,nhwc->npwc", mj, seg, precision=prec,
                preferred_element_type=jnp.float32,
            )
        else:
            seg = jax.lax.slice_in_dim(xf, lo, hi, axis=2)
            y = jnp.einsum(
                "nhwc,wq->nhqc", seg, mj.T, precision=prec,
                preferred_element_type=jnp.float32,
            )
        chunks.append(y.astype(xf.dtype))
    return jnp.concatenate(chunks, axis=axis)


def _axis_gather(xf: jnp.ndarray, axis: int, out_size: int, align_corners: bool):
    """Gather-lerp for one axis. Gathers in the input dtype (exact); the lerp
    upcasts gathered values to fp32 in-register (fused, no fp32 copy)."""
    i0, i1, w0, w1 = _coords_np(out_size, xf.shape[axis], align_corners)
    shape = [1, 1, 1, 1]
    shape[axis] = out_size
    a = jnp.take(xf, jnp.asarray(i0), axis=axis).astype(jnp.float32)
    b = jnp.take(xf, jnp.asarray(i1), axis=axis).astype(jnp.float32)
    y = a * jnp.asarray(w0).reshape(shape) + b * jnp.asarray(w1).reshape(shape)
    return y.astype(xf.dtype)


def resize_bilinear(x: jnp.ndarray, size, align_corners: bool = False) -> jnp.ndarray:
    """Bilinearly resize NHWC ``x`` to spatial ``size`` = (H_out, W_out).

    For float32 inputs this matches ``torch.nn.functional.interpolate(
    mode='bilinear', align_corners=align_corners)`` bit-for-bit in exact
    arithmetic. Inputs keep their dtype end to end — bf16 tensors are NOT
    round-tripped through an fp32 copy (profiled ~1 ms of pure layout/copy
    traffic per full-res resize on v5e); interpolation still accumulates in
    fp32 in-register.
    """
    h_out, w_out = int(size[0]), int(size[1])
    n, h_in, w_in, c = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x
    orig_dtype = x.dtype

    big_up = (
        h_out >= h_in
        and w_out >= w_in
        and n * h_out * w_out * c >= _MATMUL_MIN_OUT_ELEMS
    )
    if big_up:
        # MXU path: banded block matmuls per axis, smaller axis first so the
        # expensive full-size stage runs on the narrower intermediate.
        xf = x
        if h_out * w_in <= w_out * h_in:
            xf = _axis_banded_matmul(xf, 1, h_out, align_corners)
            xf = _axis_banded_matmul(xf, 2, w_out, align_corners)
        else:
            xf = _axis_banded_matmul(xf, 2, w_out, align_corners)
            xf = _axis_banded_matmul(xf, 1, h_out, align_corners)
        return xf.astype(orig_dtype)

    xf = x
    if h_in != h_out:
        xf = _axis_gather(xf, 1, h_out, align_corners)
    if w_in != w_out:
        xf = _axis_gather(xf, 2, w_out, align_corners)
    return xf.astype(orig_dtype)


def resize_bilinear_cl(x: jnp.ndarray, size, align_corners: bool = False) -> jnp.ndarray:
    """Bilinearly resize NHWC ``x`` to CLASS-LEADING (N, C, H_out, W_out).

    Same banded-matmul math as ``resize_bilinear`` (bit-identical results),
    but the channel dim leaves the minor-most position before the upscale:
    with few channels (e.g. 19 classes) the NHWC layout pads lanes 19->128,
    so every byte of the full-res logits costs ~6.7x its size in HBM
    traffic — profiled 1.69 -> 0.93 ms for the 257x513->1025x2049 logits
    tail on v5e. NCHW output also matches the reference's torch layout.
    """
    h_out, w_out = int(size[0]), int(size[1])
    n, h_in, w_in, c = x.shape
    t = x.transpose(0, 3, 1, 2)  # (N, C, H, W) — cheap at head resolution
    if (h_in, w_in) == (h_out, w_out):
        return t
    is_f32 = t.dtype == jnp.float32
    prec = jax.lax.Precision.HIGHEST if is_f32 else jax.lax.Precision.DEFAULT

    def axis_banded(v, axis, out_size):
        chunks = []
        for _, _, lo, hi, m in _band_plan(out_size, v.shape[axis], align_corners):
            mj = jnp.asarray(m if is_f32 else m.astype(v.dtype))
            seg = jax.lax.slice_in_dim(v, lo, hi, axis=axis)
            if axis == 2:
                y = jnp.einsum(
                    "ph,nchw->ncpw", mj, seg, precision=prec,
                    preferred_element_type=jnp.float32,
                )
            else:
                y = jnp.einsum(
                    "nchw,wq->nchq", seg, mj.T, precision=prec,
                    preferred_element_type=jnp.float32,
                )
            chunks.append(y.astype(v.dtype))
        return jnp.concatenate(chunks, axis=axis)

    if h_out >= h_in and w_out >= w_in:
        if h_out * w_in <= w_out * h_in:
            t = axis_banded(t, 2, h_out)
            t = axis_banded(t, 3, w_out)
        else:
            t = axis_banded(t, 3, w_out)
            t = axis_banded(t, 2, h_out)
        return t
    # non-upscale fallback: NHWC path then transpose
    return resize_bilinear(x, size, align_corners).transpose(0, 3, 1, 2)


def scale_dimension(dim: int, scale: float) -> int:
    """The reference's odd-size scaling rule (modeling/ADD.py:65-66)."""
    return int((float(dim) - 1.0) * scale + 1.0)


def scale_dimension_search(dim: int, scale: float) -> int:
    """Search-cell variant (cell_level_search.py:80-82): even dims use dim*scale."""
    return int((float(dim) - 1.0) * scale + 1.0) if dim % 2 else int(dim * scale)
