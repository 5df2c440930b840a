"""Pallas TPU kernel: fused softmax-entropy + argmax over class logits.

At eval, every exit decision reads the full-resolution logits map
(1025x2049x19 ≈ 160 MB fp32) several times in the naive formulation
(softmax, log_softmax, multiply, reduce, argmax — operations.py:161-170 plus
the argmax for mIoU). This kernel computes both in one fused pass.

Layout choice: with only C=19 classes, putting C on the lane dimension wastes
109/128 lanes (measured 3x SLOWER than XLA). Instead the logits are viewed
transposed as (C, P): pixels ride the 128-wide lanes at full utilization and
the class reduction runs across sublanes. XLA performs the transpose as part
of the producer fusion feeding the kernel.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_L = 4096  # pixels per grid step (lanes)


def _entropy_argmax_kernel(x_ref, ent_ref, arg_ref):
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)  # (C, BLOCK_L)
    m = jnp.max(x, axis=0, keepdims=True)
    s = x - m
    e = jnp.exp(s)
    z = jnp.sum(e, axis=0, keepdims=True)
    logp = s - jnp.log(z)
    p = e / z
    ent = -jnp.sum(p * logp, axis=0, keepdims=True)  # (1, BLOCK_L)
    arg_ref[:] = jnp.argmax(x, axis=0, keepdims=True).astype(jnp.int32)

    @pl.when(i == 0)
    def _():
        ent_ref[0, 0] = 0.0

    ent_ref[0, 0] += jnp.sum(ent)


@partial(jax.jit, static_argnums=(1,))
def entropy_argmax_pallas(logits: jnp.ndarray, num_classes: int = 19):
    """logits (N, H, W, C) → (normalized entropy (N,), argmax (N, H, W)).

    Matches ops.confidence.normalized_shannon_entropy + argmax. N is folded
    into the pixel axis; per-image entropy requires N==1 (the dynamic
    inference batch-1 hot path) — for N>1 use the jnp reference.
    """
    n, h, w, c = logits.shape
    assert n == 1, "pallas path is the batch-1 inference hot path"
    p = h * w
    pad = (-p) % BLOCK_L
    x = logits.reshape(p, c).T  # (C, P); fused into the kernel's producer
    if pad:
        # padded cols: row-0 spike → entropy 0, argmax 0
        filler = jnp.full((c, pad), -1e9, x.dtype).at[0, :].set(0.0)
        x = jnp.concatenate([x, filler], axis=1)

    grid = (x.shape[1] // BLOCK_L,)
    ent_sum, arg = pl.pallas_call(
        _entropy_argmax_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((c, BLOCK_L), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BLOCK_L), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, x.shape[1]), jnp.int32),
        ),
    )(x)

    ent = ent_sum[0, 0] / (h * w) / math.log(num_classes)
    return ent[None], arg[0, :p].reshape(1, h, w)


def entropy_argmax_reference(logits: jnp.ndarray, num_classes: int = 19):
    """jnp reference used off-TPU and for N>1."""
    from ..ops.confidence import normalized_shannon_entropy

    return (
        normalized_shannon_entropy(logits, num_classes),
        jnp.argmax(logits, axis=-1),
    )


def entropy_argmax(logits: jnp.ndarray, num_classes: int = 19):
    """Dispatch: Pallas on TPU for batch-1, jnp elsewhere."""
    if logits.shape[0] == 1 and jax.default_backend() in ("tpu", "axon"):
        return entropy_argmax_pallas(logits, num_classes)
    return entropy_argmax_reference(logits, num_classes)
