"""Which conv formulation is fastest on TPU at the cell shapes?

Candidates for a kxk (possibly dilated) conv at (1, H, W, C) thin-channel
shapes:
  A. lax.conv_general_dilated (what flax nn.Conv emits)
  B. im2col: k*k shifted slices concat -> one (HW, k2C)x(k2C, Co) matmul
  C. shift-matmul-accumulate: sum_k shift(x)[HW, C] @ W_k[C, Co]
  D. same as A but with channels padded to 128 (is thinness the problem?)
  E. same as A at even spatial 128x256 (is odd spatial the problem?)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 50


def timed_loop(op, x, iters=ITERS):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, lambda i, v: op(v), x)

    jax.block_until_ready(run(x))
    t0 = time.perf_counter()
    jax.block_until_ready(run(x))
    return (time.perf_counter() - t0) / iters


def report(name, t, flops=None):
    eff = f"  {flops / t / 1e12:6.1f} TF/s" if flops else ""
    print(f"{name:<62s} {t * 1e6:9.1f} us{eff}")


def conv_lax(w, k, dilation=1):
    pad = (k // 2) * dilation

    def op(v):
        return jax.lax.conv_general_dilated(
            v, w, (1, 1), [(pad, pad), (pad, pad)],
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    return op


def conv_im2col(w, k, dilation=1):
    """w: (k, k, C, Co). Pad once, slice k*k views, one big matmul."""
    pad = (k // 2) * dilation

    def op(v):
        n, h, wd, c = v.shape
        vp = jnp.pad(v, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        cols = [
            jax.lax.dynamic_slice(vp, (0, i * dilation, j * dilation, 0), (n, h, wd, c))
            for i in range(k)
            for j in range(k)
        ]
        patches = jnp.concatenate(cols, axis=-1)  # (n, h, w, k2*C)
        wk = w.reshape(k * k * c, -1)
        return jax.lax.dot_general(
            patches.reshape(-1, k * k * c), wk,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(v.dtype).reshape(n, h, wd, -1)
    return op


def conv_shiftmm(w, k, dilation=1):
    """sum over taps: shifted x @ W_tap, fp32 accumulation."""
    pad = (k // 2) * dilation

    def op(v):
        n, h, wd, c = v.shape
        vp = jnp.pad(v, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        acc = None
        for i in range(k):
            for j in range(k):
                sl = jax.lax.dynamic_slice(
                    vp, (0, i * dilation, j * dilation, 0), (n, h, wd, c)
                ).reshape(-1, c)
                y = jax.lax.dot_general(
                    sl, w[i, j], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = y if acc is None else acc + y
        return acc.astype(v.dtype).reshape(n, h, wd, -1)
    return op


def main():
    rng = np.random.RandomState(0)
    print(f"device: {jax.devices()[0]}\n")

    for (h, wd, c) in [(129, 257, 40), (65, 129, 80), (33, 65, 160)]:
        x = jnp.asarray(rng.randn(1, h, wd, c), jnp.bfloat16)
        for k, dil in [(3, 1), (5, 1), (3, 2), (5, 2)]:
            w = jnp.asarray(rng.randn(k, k, c, c), jnp.bfloat16) * 0.1
            f = 2 * h * wd * k * k * c * c
            tA = timed_loop(conv_lax(w, k, dil), x)
            tB = timed_loop(conv_im2col(w, k, dil), x)
            tC = timed_loop(conv_shiftmm(w, k, dil), x)
            report(f"A lax.conv {k}x{k} d{dil} @{h}x{wd}x{c}", tA, f)
            report(f"B im2col   {k}x{k} d{dil} @{h}x{wd}x{c}", tB, f)
            report(f"C shiftmm  {k}x{k} d{dil} @{h}x{wd}x{c}", tC, f)
        print()

    # D: is thinness the problem? 3x3 at 129x257 with C=128
    x = jnp.asarray(rng.randn(1, 129, 257, 128), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 128, 128), jnp.bfloat16) * 0.1
    report(
        "D lax.conv 3x3 @129x257x128",
        timed_loop(conv_lax(w, 3), x),
        2 * 129 * 257 * 9 * 128 * 128,
    )
    # E: is odd spatial the problem? 3x3 at 128x256 with C=40
    x = jnp.asarray(rng.randn(1, 128, 256, 40), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 40, 40), jnp.bfloat16) * 0.1
    report(
        "E lax.conv 3x3 @128x256x40",
        timed_loop(conv_lax(w, 3), x),
        2 * 128 * 256 * 9 * 40 * 40,
    )
    # F: batch dim instead of spatial (does XLA pick a better algo?)
    x = jnp.asarray(rng.randn(8, 129, 257, 40), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 40, 40), jnp.bfloat16) * 0.1
    report(
        "F lax.conv 3x3 @8x129x257x40 (batch 8, per-image time/8)",
        timed_loop(conv_lax(w, 3), x) / 8,
        2 * 129 * 257 * 9 * 40 * 40,
    )


if __name__ == "__main__":
    main()
