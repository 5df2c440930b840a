"""Which execution form is fastest for one SepConv/DilConv *stage* on TPU?

A SepConv stage (operations.py:46) is relu -> depthwise kxk -> pointwise 1x1
-> BN; a DilConv (operations.py:32) is the same with a dilated depthwise.
The depthwise and pointwise are adjacent linear maps, so their composition
is EXACTLY one dense kxk conv with the factored kernel

    K[ky, kx, ci, co] = dw[ky, kx, ci] * pw[ci, co]

(mathematically identical, not an approximation). The dense form trades
~k^2 x more MXU MACs (nearly free at these sizes) for: one conv kernel
instead of a VPU-bound depthwise + a 10 %-MXU-utilization 1x1, and half the
HBM round-trips of the state.

Forms at the flagship hot shape (1, 257, 513, 40) and the deeper levels:
  A. dw (lax.conv feature_group_count=C) + pw 1x1      [what flax emits]
  B. factored dense kxk lax.conv
  C. factored dense kxk as im2col shifted-matmul (ASPP style: one matmul
     over the virtual concat of 9 shifted views)
All include the leading relu and a folded-BN scale/bias epilogue so the
measured unit is the whole stage.
"""
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)
sys.path.insert(0, os.path.dirname(_here))

import jax
import jax.numpy as jnp
import numpy as np

from trace_measure import trace_and_sum

ITERS = 30


def timed_loop(op, x, iters=ITERS):
    """Device time per op application from a profiler trace (host wall
    clocks are junk on the axon relay: RTT/dedup noise is ~the op cost)."""

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, lambda i, v: op(v), x)

    return trace_and_sum(run, x, runs=1)["total_ms"] / 1e3 / iters


def report(name, t):
    print(f"{name:<58s} {t * 1e6:9.1f} us", flush=True)


def stage_dw_pw(dw, pw, scale, bias, k, dil):
    pad = (k // 2) * dil

    def op(v):
        c = v.shape[-1]
        y = jax.nn.relu(v)
        y = jax.lax.conv_general_dilated(
            y, dw, (1, 1), [(pad, pad), (pad, pad)],
            rhs_dilation=(dil, dil), feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = jax.lax.conv_general_dilated(
            y, pw, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y * scale + bias
    return op


def stage_factored_conv(dw, pw, scale, bias, k, dil):
    pad = (k // 2) * dil
    # dw: (k, k, 1, C) grouped-HWIO; pw: (1, 1, C, C)
    K = dw[:, :, 0, :, None] * pw[0, 0]          # (k, k, C, C)

    def op(v):
        y = jax.nn.relu(v)
        y = jax.lax.conv_general_dilated(
            y, K, (1, 1), [(pad, pad), (pad, pad)],
            rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y * scale + bias
    return op


def stage_factored_shiftmm(dw, pw, scale, bias, k, dil):
    pad = (k // 2) * dil
    K = (dw[:, :, 0, :, None] * pw[0, 0]).reshape(k * k, -1, pw.shape[-1])
    Kc = jnp.concatenate(list(K), axis=0)         # (k2*C, Co) virtual concat

    def op(v):
        n, h, w, c = v.shape
        y = jax.nn.relu(v)
        yp = jnp.pad(y, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        cols = [
            jax.lax.dynamic_slice(yp, (0, i * dil, j * dil, 0), (n, h, w, c))
            for i in range(k)
            for j in range(k)
        ]
        patches = jnp.concatenate(cols, axis=-1).reshape(-1, k * k * c)
        out = jax.lax.dot_general(
            patches, Kc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(v.dtype).reshape(n, h, w, -1)
        return out * scale + bias
    return op


def main():
    rng = np.random.RandomState(0)
    print(f"device: {jax.devices()[0]}\n", flush=True)

    # (H, W, C) of the ADD C=2 flagship trellis levels at 1025x2049 input
    for (h, w, c) in [(257, 513, 40), (129, 257, 80), (65, 129, 160)]:
        x = jnp.asarray(rng.randn(1, h, w, c), jnp.bfloat16)
        for k, dil, nm in [(3, 1, "sep3"), (5, 1, "sep5"),
                           (3, 2, "dil3"), (5, 2, "dil5")]:
            dw = jnp.asarray(rng.randn(k, k, 1, c), jnp.bfloat16) * 0.2
            pw = jnp.asarray(rng.randn(1, 1, c, c), jnp.bfloat16) * 0.2
            scale = jnp.asarray(rng.rand(c), jnp.bfloat16)
            bias = jnp.asarray(rng.randn(c), jnp.bfloat16) * 0.1
            tA = timed_loop(stage_dw_pw(dw, pw, scale, bias, k, dil), x)
            tB = timed_loop(stage_factored_conv(dw, pw, scale, bias, k, dil), x)
            tC = timed_loop(stage_factored_shiftmm(dw, pw, scale, bias, k, dil), x)
            report(f"A dw+pw    {nm} @{h}x{w}x{c}", tA)
            report(f"B factconv {nm} @{h}x{w}x{c}", tB)
            report(f"C factmm   {nm} @{h}x{w}x{c}", tC)
        print(flush=True)


# ---------------------------------------------------------------------------
# NCHW (channel-leading) forms: at C=40 the NHWC minor dim pads 40->128
# lanes, so every HBM round trip of a cell state costs 3.2x its logical
# bytes. Channel-leading layouts put spatial W in lanes (257->pad 384 is
# only 1.5x; the flattened H*W form pads ~0). The round-1 logits tail won
# 1.8x from exactly this (class-leading NCHW logits).


def stage_dw_pw_nchw(dw, pw, scale, bias, k, dil):
    """dw+pw with NCHW operands/outputs (dw kernel HWIO-grouped)."""
    pad = (k // 2) * dil

    def op(v):  # v: (1, C, H, W)
        c = v.shape[1]
        y = jax.nn.relu(v)
        y = jax.lax.conv_general_dilated(
            y, dw, (1, 1), [(pad, pad), (pad, pad)],
            rhs_dilation=(dil, dil), feature_group_count=c,
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
        )
        y = jax.lax.conv_general_dilated(
            y, pw, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
        )
        return y * scale[None, :, None, None] + bias[None, :, None, None]
    return op


def stage_shiftfma_dot_nchw(dw, pw, scale, bias, k, dil):
    """NCHW, depthwise as k^2 shifted FMAs (VPU) + pointwise as one
    (Co, C) @ (C, H*W) dot with spatial flattened into lanes."""
    pad = (k // 2) * dil
    dwt = dw[:, :, 0, :].transpose(2, 0, 1)      # (C, k, k)
    pwt = pw[0, 0].transpose(1, 0)               # (Co, C)

    def op(v):  # (1, C, H, W)
        _, c, h, w = v.shape
        y = jax.nn.relu(v)
        yp = jnp.pad(y, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
        acc = None
        for i in range(k):
            for j in range(k):
                t = jax.lax.dynamic_slice(
                    yp, (0, 0, i * dil, j * dil), (1, c, h, w)
                ) * dwt[:, i, j][None, :, None, None]
                acc = t if acc is None else acc + t
        flat = acc.reshape(c, h * w)
        out = jax.lax.dot_general(
            pwt, flat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)
        out = out * scale[:, None] + bias[:, None]
        return out.reshape(1, -1, h, w)
    return op


def main_nchw():
    rng = np.random.RandomState(0)
    print(f"device: {jax.devices()[0]}  [NCHW forms, real cell shapes]\n",
          flush=True)
    # Real ADD C=2 trellis shapes at 1025x2049: level1/2/3 states.
    for (h, w, c) in [(129, 257, 40), (65, 129, 80), (33, 65, 160)]:
        xh = jnp.asarray(rng.randn(1, h, w, c), jnp.bfloat16)
        xc = jnp.asarray(np.moveaxis(np.asarray(xh), 3, 1))
        for k, dil, nm in [(3, 1, "sep3"), (5, 1, "sep5"),
                           (3, 2, "dil3"), (5, 2, "dil5")]:
            dw = jnp.asarray(rng.randn(k, k, 1, c), jnp.bfloat16) * 0.2
            pw = jnp.asarray(rng.randn(1, 1, c, c), jnp.bfloat16) * 0.2
            scale = jnp.asarray(rng.rand(c), jnp.bfloat16)
            bias = jnp.asarray(rng.randn(c), jnp.bfloat16) * 0.1
            tA = timed_loop(stage_dw_pw(dw, pw, scale, bias, k, dil), xh)
            tD = timed_loop(stage_dw_pw_nchw(dw, pw, scale, bias, k, dil), xc)
            tG = timed_loop(
                stage_shiftfma_dot_nchw(dw, pw, scale, bias, k, dil), xc)
            report(f"A nhwc dw+pw     {nm} @{h}x{w}x{c}", tA)
            report(f"D nchw dw+pw     {nm} @{h}x{w}x{c}", tD)
            report(f"G nchw shiftfma  {nm} @{h}x{w}x{c}", tG)
        print(flush=True)


if __name__ == "__main__":
    if "--nchw" in sys.argv:
        main_nchw()
    else:
        main()
