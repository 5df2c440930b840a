"""Is lax.conv the fixed cost? A/B every hot-op form against conv-free
rewrites (shifted matmuls on the MXU, shifted elementwise for depthwise),
at the real decoded-cell shapes, on the real TPU.

Forms tested per (H, W, C) level shape:
  1x1:   conv(1x1, 5C->C)          vs  reshape + dot_general
  dil5:  conv(5x5 dil2, C->C)      vs  25 shifted matmuls (fp32 acc)
  dw3:   grouped conv(3x3, C)      vs  9 shifted elementwise mul-adds
  sep3:  relu-dw-pw-relu-dw-pw     vs  fully conv-free (shift-dw + matmul-pw)
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


def conv(x, w, stride=1, dilation=1, groups=1, padding=0):
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        rhs_dilation=(dilation, dilation),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def report(name, t, flops=None):
    eff = f"  {flops / t / 1e12:6.1f} TF/s" if flops else ""
    print(f"{name:<58s} {t * 1e6:9.1f} us{eff}")


def shift2d(x, dh, dw):
    """x shifted so y[h,w] = x[h+dh, w+dw], zero padded. Static shifts."""
    n, h, w, c = x.shape
    y = x
    if dh > 0:
        y = jnp.pad(y[:, dh:, :, :], ((0, 0), (0, dh), (0, 0), (0, 0)))
    elif dh < 0:
        y = jnp.pad(y[:, :dh, :, :], ((0, 0), (-dh, 0), (0, 0), (0, 0)))
    if dw > 0:
        y = jnp.pad(y[:, :, dw:, :], ((0, 0), (0, 0), (0, dw), (0, 0)))
    elif dw < 0:
        y = jnp.pad(y[:, :, :dw, :], ((0, 0), (0, 0), (-dw, 0), (0, 0)))
    return y


def dense_conv_as_shifted_matmuls(x, w, dilation=1):
    """Same-size dense kxk conv = sum over taps of shift(x) @ w[tap]."""
    kh, kw, cin, cout = w.shape
    n, h, wd, _ = x.shape
    r = (kh - 1) // 2 * dilation
    acc = None
    for i in range(kh):
        for j in range(kw):
            dh = (i - kh // 2) * dilation
            dw = (j - kw // 2) * dilation
            xs = shift2d(x, dh, dw).reshape(-1, cin)
            y = jax.lax.dot_general(
                xs, w[i, j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = y if acc is None else acc + y
    return acc.astype(x.dtype).reshape(n, h, wd, cout)


def dw_conv_as_shifts(x, w, dilation=1):
    """Depthwise kxk: y = sum_taps shift(x) * w[tap] — pure VPU."""
    kh, kw, c = w.shape
    acc = None
    for i in range(kh):
        for j in range(kw):
            dh = (i - kh // 2) * dilation
            dw = (j - kw // 2) * dilation
            y = shift2d(x, dh, dw) * w[i, j]
            acc = y if acc is None else acc + y
    return acc


def main():
    rng = np.random.RandomState(0)
    print(f"device: {jax.devices()[0]}\n")

    for (h, w, c) in [(129, 257, 40), (65, 129, 80), (33, 65, 160)]:
        px = h * w
        # ---- 1x1 preprocess 5C->C
        x5 = jnp.asarray(rng.randn(1, h, w, 5 * c), jnp.bfloat16)
        wp = jnp.asarray(rng.randn(1, 1, 5 * c, c), jnp.bfloat16) * 0.1
        f = 2 * px * 5 * c * c
        def c1(v, wp=wp):
            return jnp.concatenate([conv(jax.nn.relu(v), wp)] * 5, -1)

        report(f"1x1 {5*c}->{c} @{h}x{w} conv", timed_loop(c1, x5), f)

        def mm(v, wp=wp):
            y = jax.lax.dot_general(
                jax.nn.relu(v).reshape(-1, 5 * c), wp[0, 0],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ).astype(v.dtype).reshape(1, h, w, c)
            return jnp.concatenate([y] * 5, -1)
        report(f"1x1 {5*c}->{c} @{h}x{w} matmul", timed_loop(mm, x5), f)

        # ---- dil conv 5x5 dense C->C
        x = jnp.asarray(rng.randn(1, h, w, c), jnp.bfloat16)
        wd = jnp.asarray(rng.randn(5, 5, c, c), jnp.bfloat16) * 0.05
        f = 2 * px * 25 * c * c
        report(f"dil5x5 @{h}x{w}x{c} conv",
               timed_loop(lambda v: conv(jax.nn.relu(v), wd, padding=4, dilation=2), x), f)
        report(f"dil5x5 @{h}x{w}x{c} 25-shift matmul",
               timed_loop(lambda v: dense_conv_as_shifted_matmuls(
                   jax.nn.relu(v), wd, dilation=2), x), f)

        # ---- depthwise 3x3
        wdw = jnp.asarray(rng.randn(3, 3, 1, c), jnp.bfloat16) * 0.3
        wdw3 = wdw[:, :, 0, :]
        report(f"dw3x3 @{h}x{w}x{c} grouped conv",
               timed_loop(lambda v: conv(v, wdw, groups=c, padding=1), x))
        report(f"dw3x3 @{h}x{w}x{c} 9-shift VPU",
               timed_loop(lambda v: dw_conv_as_shifts(v, wdw3), x))

        # ---- full SepConv3x3 (relu dw pw relu dw pw)
        wpw1 = jnp.asarray(rng.randn(c, c), jnp.bfloat16) * 0.1
        wdw2 = jnp.asarray(rng.randn(3, 3, c), jnp.bfloat16) * 0.3
        wpw2 = jnp.asarray(rng.randn(c, c), jnp.bfloat16) * 0.1

        def sep_convfree(v):
            v = jax.nn.relu(v)
            v = dw_conv_as_shifts(v, wdw3)
            v = jax.lax.dot_general(
                v.reshape(-1, c), wpw1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(v.dtype)
            v = jax.nn.relu(v).reshape(1, h, w, c)
            v = dw_conv_as_shifts(v, wdw2)
            v = jax.lax.dot_general(
                v.reshape(-1, c), wpw2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(v.dtype)
            return v.reshape(1, h, w, c)

        def sep_conv(v):
            v = jax.nn.relu(v)
            v = conv(v, wdw, groups=c, padding=1)
            v = conv(v, wpw1[None, None], )
            v = jax.nn.relu(v)
            v = conv(v, wdw2[:, :, None, :].transpose(0, 1, 2, 3), groups=c, padding=1)
            v = conv(v, wpw2[None, None])
            return v

        report(f"sep3x3 @{h}x{w}x{c} conv form", timed_loop(sep_conv, x))
        report(f"sep3x3 @{h}x{w}x{c} conv-free", timed_loop(sep_convfree, x))
        print()


if __name__ == "__main__":
    main()
