"""Microbenchmarks for the hot-op rewrites, on the real TPU at real shapes.

Each candidate op is iterated inside one jitted fori_loop (shape-preserving,
output feeds input) so per-launch tunnel overhead is amortized to nothing and
we read true device time per op.

Questions answered:
  1. SepConv as dw+pw pairs (current) vs composed dense convs (2 ops).
  2. DilConv 5x5 plain (current) — how close to MXU speed at C in {40,80,160}.
  3. FactorizedReduce 2-conv (current) vs single 2x2 s2 conv.
  4. Stem convs individually; stem0 via space-to-depth.
  5. A trivial op, to measure floor.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 50


def timed_loop(op, x, iters=ITERS):
    """Device time per op() application, amortized inside one program."""

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


def sep_conv_pair(x, k, rng):
    """Current: relu->dw(k)->pw + relu->dw(k)->pw (BN omitted: fused free)."""
    c = x.shape[-1]
    p = k // 2
    wdw1 = jnp.asarray(rng.randn(k, k, 1, c), jnp.bfloat16) * 0.1
    wpw1 = jnp.asarray(rng.randn(1, 1, c, c), jnp.bfloat16) * 0.1
    wdw2 = jnp.asarray(rng.randn(k, k, 1, c), jnp.bfloat16) * 0.1
    wpw2 = jnp.asarray(rng.randn(1, 1, c, c), jnp.bfloat16) * 0.1

    def op(v):
        v = jax.nn.relu(v)
        v = conv(v, wdw1, groups=c, padding=p)
        v = conv(v, wpw1)
        v = jax.nn.relu(v)
        v = conv(v, wdw2, groups=c, padding=p)
        v = conv(v, wpw2)
        return v

    return op


def sep_conv_composed(x, k, rng):
    """Composed: relu->conv(k, dense, W=dw*pw) x2 — 2 convs instead of 4."""
    c = x.shape[-1]
    p = k // 2
    wdw1 = jnp.asarray(rng.randn(k, k, c), jnp.bfloat16) * 0.1
    wpw1 = jnp.asarray(rng.randn(c, c), jnp.bfloat16) * 0.1
    wdw2 = jnp.asarray(rng.randn(k, k, c), jnp.bfloat16) * 0.1
    wpw2 = jnp.asarray(rng.randn(c, c), jnp.bfloat16) * 0.1

    def op(v):
        w1 = jnp.einsum("hwi,io->hwio", wdw1, wpw1)
        v = conv(jax.nn.relu(v), w1, padding=p)
        w2 = jnp.einsum("hwi,io->hwio", wdw2, wpw2)
        return conv(jax.nn.relu(v), w2, padding=p)

    return op


def main():
    rng = np.random.RandomState(0)
    print(f"device: {jax.devices()[0]}\n")

    # floor: trivial elementwise op at the level-1 cell shape
    x40 = jnp.asarray(rng.randn(1, 129, 257, 40), jnp.bfloat16)
    report("floor: relu @129x257x40", timed_loop(jax.nn.relu, x40))

    for (h, w, c) in [(129, 257, 40), (65, 129, 80), (33, 65, 160)]:
        x = jnp.asarray(rng.randn(1, h, w, c), jnp.bfloat16)
        px = h * w
        for k in (3, 5):
            t_pair = timed_loop(sep_conv_pair(x, k, rng), x)
            t_comp = timed_loop(sep_conv_composed(x, k, rng), x)
            f_comp = 2 * (2 * px * k * k * c * c)
            report(f"sep{k}x{k} @{h}x{w}x{c} dw+pw pairs (4 convs)", t_pair)
            report(f"sep{k}x{k} @{h}x{w}x{c} composed   (2 convs)", t_comp, f_comp)
        # dil conv 5x5 (plain, current impl) —
        wd = jnp.asarray(rng.randn(5, 5, c, c), jnp.bfloat16) * 0.1
        t = timed_loop(lambda v: conv(jax.nn.relu(v), wd, padding=4, dilation=2), x)
        report(f"dil5x5 @{h}x{w}x{c} plain", t, 2 * px * 25 * c * c)
        # pointwise 1x1 200->40-style preprocess
        wpre = jnp.asarray(rng.randn(1, 1, 5 * c, c), jnp.bfloat16) * 0.1
        xp = jnp.asarray(rng.randn(1, h, w, 5 * c), jnp.bfloat16)

        def pre(v, wpre=wpre, xp=xp):
            del v
            return conv(jax.nn.relu(xp), wpre)

        t = timed_loop(pre, x)
        report(f"preprocess 1x1 {5*c}->{c} @{h}x{w}", t, 2 * px * 5 * c * c)

    # FactorizedReduce at 129x257x(5*40)->80: current vs single 2x2 s2 conv
    xin = jnp.asarray(rng.randn(1, 129, 257, 200), jnp.bfloat16)
    c_out = 80
    w1 = jnp.asarray(rng.randn(1, 1, 200, c_out // 2), jnp.bfloat16) * 0.1
    w2 = jnp.asarray(rng.randn(1, 1, 200, c_out // 2), jnp.bfloat16) * 0.1
    w22 = jnp.asarray(rng.randn(2, 2, 200, c_out), jnp.bfloat16) * 0.1

    def fr_current(v):
        v = jax.nn.relu(v)
        y = jnp.pad(v[:, 1:, 1:, :], ((0, 0), (0, 1), (0, 1), (0, 0)))
        a = conv(v, w1, stride=2)
        b = conv(y, w2, stride=2)
        return jnp.concatenate([a, b], axis=-1)

    def fr_single(v):
        return conv(jax.nn.relu(v), w22, stride=2, padding=0)

    # pad input so output 65x129 both ways; time only (shapes differ from in)
    def t_once(f):
        g = jax.jit(lambda v: jax.lax.fori_loop(
            0, ITERS, lambda i, c: c + jnp.mean(f(v)), jnp.bfloat16(0)))
        jax.block_until_ready(g(xin))
        t0 = time.perf_counter()
        jax.block_until_ready(g(xin))
        return (time.perf_counter() - t0) / ITERS

    report("FactorizedReduce 200->80 @129x257 current (2 conv)", t_once(fr_current))
    report("FactorizedReduce 200->80 @129x257 single 2x2 conv", t_once(fr_single))

    # stems at full res
    img = jnp.asarray(rng.randn(1, 1025, 2049, 3), jnp.bfloat16)
    ws0 = jnp.asarray(rng.randn(3, 3, 3, 64), jnp.bfloat16) * 0.1
    ws1 = jnp.asarray(rng.randn(3, 3, 64, 64), jnp.bfloat16) * 0.1
    ws2 = jnp.asarray(rng.randn(3, 3, 64, 128), jnp.bfloat16) * 0.1

    report("stem0 3x3 s2 3->64 @1025x2049", t_once(
        lambda v: conv(v, ws0, stride=2, padding=1)),)
    x513 = jnp.asarray(rng.randn(1, 513, 1025, 64), jnp.bfloat16)
    t = timed_loop(lambda v: conv(jax.nn.relu(v), ws1, padding=1), x513)
    report("stem1 3x3 64->64 @513x1025", t, 2 * 513 * 1025 * 9 * 64 * 64)

    def s2(v):
        return conv(jax.nn.relu(v), ws2, stride=2, padding=1)

    g = jax.jit(lambda v: jax.lax.fori_loop(
        0, ITERS, lambda i, c: c + jnp.mean(s2(v)), jnp.bfloat16(0)))
    jax.block_until_ready(g(x513))
    t0 = time.perf_counter()
    jax.block_until_ready(g(x513))
    t = (time.perf_counter() - t0) / ITERS
    report("stem2 3x3 s2 64->128 @513x1025", t, 2 * 257 * 513 * 9 * 64 * 128)

    # decoder conv1 at 129x257: 3x3 304->256
    xd = jnp.asarray(rng.randn(1, 129, 257, 304), jnp.bfloat16)
    wdk = jnp.asarray(rng.randn(3, 3, 304, 256), jnp.bfloat16) * 0.1
    g = jax.jit(lambda v: jax.lax.fori_loop(
        0, ITERS, lambda i, c: c + jnp.mean(conv(jax.nn.relu(v), wdk, padding=1)),
        jnp.bfloat16(0)))
    jax.block_until_ready(g(xd))
    t0 = time.perf_counter()
    jax.block_until_ready(g(xd))
    t = (time.perf_counter() - t0) / ITERS
    report("decoder 3x3 304->256 @129x257", t, 2 * 129 * 257 * 9 * 304 * 256)


if __name__ == "__main__":
    main()
