"""Unrolled-chain microbenchmarks (fori_loop iterations carry ~0.5 ms
overhead on the axon relay, so loops lie; straight-line HLO like the real
model does not).

Each measurement: jit a chain of N applications of the op with *distinct*
weights (no CSE), time the whole program, subtract the 1-application program
time, divide by N-1. That cancels launch overhead exactly.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_CHAIN = 17


def conv(x, w, stride=1, dilation=1, groups=1, padding=0):
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        rhs_dilation=(dilation, dilation),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def time_program(fn, *args, iters=30):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def chain_time(make_op, x, n=N_CHAIN):
    """make_op(i) -> shape-preserving op with distinct weights."""
    ops = [make_op(i) for i in range(n)]

    def prog_n(v):
        for op in ops:
            v = op(v)
        return v

    def prog_1(v):
        return ops[0](v)

    t_n = time_program(jax.jit(prog_n), x)
    t_1 = time_program(jax.jit(prog_1), x)
    return (t_n - t_1) / (n - 1)


def report(name, t, flops=None, bytes_=None):
    eff = f"  {flops / t / 1e12:6.1f} TF/s" if flops else ""
    bw = f"  {bytes_ / t / 1e9:6.0f} GB/s" if bytes_ else ""
    print(f"{name:<58s} {t * 1e6:9.1f} us{eff}{bw}")


def main():
    rng = np.random.RandomState(0)
    print(f"device: {jax.devices()[0]}\n")

    def w(shape):
        return jnp.asarray(rng.randn(*shape), jnp.bfloat16) * 0.05

    for (h, wd, c) in [(129, 257, 40), (65, 129, 80), (33, 65, 160)]:
        x = jnp.asarray(rng.randn(1, h, wd, c), jnp.bfloat16)
        px = h * wd
        nbytes = 2 * px * c * 2  # read + write bf16

        t = chain_time(lambda i: (lambda v, k=w((1, 1, c, c)): conv(v, k)), x)
        report(f"1x1 {c}->{c} @{h}x{wd}", t, 2 * px * c * c, nbytes)

        t = chain_time(
            lambda i: (lambda v, k=w((3, 3, c, c)): conv(v, k, padding=1)), x
        )
        report(f"3x3 {c}->{c} @{h}x{wd}", t, 2 * px * 9 * c * c, nbytes)

        t = chain_time(
            lambda i: (lambda v, k=w((5, 5, c, c)): conv(v, k, padding=4, dilation=2)),
            x,
        )
        report(f"5x5 d2 {c}->{c} @{h}x{wd}", t, 2 * px * 25 * c * c, nbytes)

        # depthwise + pointwise pair (current SepConv stage)
        def mk_dwpw(i):
            kdw, kpw = w((3, 3, 1, c)), w((1, 1, c, c))
            return lambda v: conv(conv(v, kdw, groups=c, padding=1), kpw)

        t = chain_time(mk_dwpw, x)
        report(f"dw3x3+pw {c}->{c} @{h}x{wd} (2 ops)", t, None, 2 * nbytes)

        # relu+bn-affine chain (elementwise floor)
        def mk_ew(i):
            s = w((c,)).astype(jnp.float32)

            def op(v):
                return (jax.nn.relu(v).astype(jnp.float32) * s).astype(v.dtype)

            return op

        t = chain_time(mk_ew, x)
        report(f"relu*affine @{h}x{wd}x{c} (fused ew)", t, None, nbytes)
        print()

    # stems at full res (shape-preserving stand-ins where needed)
    x = jnp.asarray(rng.randn(1, 513, 1025, 64), jnp.bfloat16)
    t = chain_time(lambda i: (lambda v, k=w((3, 3, 64, 64)): conv(v, k, padding=1)), x)
    report("stem1-like 3x3 64->64 @513x1025", t, 2 * 513 * 1025 * 9 * 64 * 64)

    x = jnp.asarray(rng.randn(1, 129, 257, 304), jnp.bfloat16)
    t = chain_time(
        lambda i: (lambda v, k=w((3, 3, 304, 304)): conv(v, k, padding=1)), x
    )
    report("decoder-like 3x3 304->304 @129x257", t, 2 * 129 * 257 * 9 * 304 * 304)

    # strided stem0/stem2: chain via (conv s2 -> upsample back) is unfair;
    # instead time once-vs-twice programs
    img = jnp.asarray(rng.randn(1, 1025, 2049, 3), jnp.bfloat16)
    k0 = [w((3, 3, 3, 64)) for _ in range(2)]

    def one(v):
        return conv(v, k0[0], stride=2, padding=1)

    def two(v):
        a = conv(v, k0[0], stride=2, padding=1)
        b = conv(v, k0[1], stride=2, padding=1)
        return a + b

    t = time_program(jax.jit(two), img) - time_program(jax.jit(one), img)
    report("stem0 3x3 s2 3->64 @1025x2049 (diff method)", t, 2 * 513 * 1025 * 27 * 64)

    x513 = jnp.asarray(rng.randn(1, 513, 1025, 64), jnp.bfloat16)
    k2 = [w((3, 3, 64, 128)) for _ in range(2)]

    def one2(v):
        return conv(v, k2[0], stride=2, padding=1)

    def two2(v):
        return conv(v, k2[0], stride=2, padding=1) + conv(v, k2[1], stride=2, padding=1)

    t = time_program(jax.jit(two2), x513) - time_program(jax.jit(one2), x513)
    report("stem2 3x3 s2 64->128 @513x1025 (diff)", t, 2 * 257 * 513 * 9 * 64 * 128)

    # single-program launch overhead on this relay: trivial program
    t = time_program(jax.jit(lambda v: v + 1), jnp.zeros((8, 128), jnp.bfloat16))
    report("whole-program launch overhead (v+1)", t)


if __name__ == "__main__":
    main()
