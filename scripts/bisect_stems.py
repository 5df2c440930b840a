"""Bisect the 5.7 ms stems program: where do the extra ms hide?

Variants (all one jitted program returning a scalar):
  A. model stems via apply (reference point)
  B. hand conv+BN-affine+relu, bf16, same math as eval-mode stems
  C. convs only (no BN, no relu)
  D. C + space-to-depth stem0 (2x2 conv on packed 12-channel input)
  E. B but BN folded into conv weights (scale into W, bias separate)
  F. input cast fp32->bf16 only (cost of touching the input)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from auto_dynamic_deeplab_tpu.models import ADD
from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE, NETWORK_ARCH


def conv(x, w, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def time_program(fn, *args, iters=15):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 1025, 2049, 3).astype(np.float32))

    cfg = NETWORK_ARCH[2]
    model = ADD(
        cfg["path"], cfg["C_index"], AUTODEEPLAB_GENOTYPE, 19,
        F=20, B=5, low_level_layer=cfg["low_level_layer"], dtype=jnp.bfloat16,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 65, 65, 3), jnp.float32), train=False
    )

    @jax.jit
    def A(x):
        state = model.apply(variables, x, False, method="stem_state")
        s0, s1 = state["prev_prev"], state["prev"]
        return jnp.sum(s0.astype(jnp.float32)) + jnp.sum(s1.astype(jnp.float32))

    w0 = jnp.asarray(rng.randn(3, 3, 3, 64), jnp.bfloat16) * 0.1
    w1 = jnp.asarray(rng.randn(3, 3, 64, 64), jnp.bfloat16) * 0.1
    w2 = jnp.asarray(rng.randn(3, 3, 64, 128), jnp.bfloat16) * 0.1
    s64a = jnp.asarray(rng.rand(64), jnp.float32) + 0.5
    b64a = jnp.asarray(rng.randn(64), jnp.float32)
    s64b = jnp.asarray(rng.rand(64), jnp.float32) + 0.5
    b64b = jnp.asarray(rng.randn(64), jnp.float32)
    s128 = jnp.asarray(rng.rand(128), jnp.float32) + 0.5
    b128 = jnp.asarray(rng.randn(128), jnp.float32)

    def bn(v, s, b):
        return (v.astype(jnp.float32) * s + b).astype(jnp.bfloat16)

    @jax.jit
    def B(x):
        v = x.astype(jnp.bfloat16)
        v = jax.nn.relu(bn(conv(v, w0, 2, 1), s64a, b64a))
        s0 = bn(conv(v, w1, 1, 1), s64b, b64b)
        s1 = bn(conv(jax.nn.relu(s0), w2, 2, 1), s128, b128)
        return jnp.sum(s0.astype(jnp.float32)) + jnp.sum(s1.astype(jnp.float32))

    @jax.jit
    def C(x):
        v = x.astype(jnp.bfloat16)
        v = conv(v, w0, 2, 1)
        s0 = conv(v, w1, 1, 1)
        s1 = conv(s0, w2, 2, 1)
        return jnp.sum(s0.astype(jnp.float32)) + jnp.sum(s1.astype(jnp.float32))

    # D: space-to-depth stem0. pad W 2049->2050, H 1025->1026, pack 2x2.
    w0_s2d = jnp.zeros((2, 2, 12, 64), jnp.bfloat16)
    # scatter w0 taps: tap (di, dj) of 3x3 s2 pad1 -> p[(di-1+2)//2 ...]
    # (exactness checked separately; here only speed matters)
    w0_s2d = w0_s2d.at[:, :, :, :].set(0.01)

    @jax.jit
    def D(x):
        v = x.astype(jnp.bfloat16)
        v = jnp.pad(v, ((0, 0), (0, 1), (0, 1), (0, 0)))  # 1026 x 2050
        n, h, w_, c = v.shape
        p = v.reshape(n, h // 2, 2, w_ // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        p = p.reshape(n, h // 2, w_ // 2, 4 * c)  # 513x1025x12
        v = conv(p, w0_s2d, 1, 1)[:, :513, :1025, :]
        s0 = conv(v, w1, 1, 1)
        s1 = conv(s0, w2, 2, 1)
        return jnp.sum(s0.astype(jnp.float32)) + jnp.sum(s1.astype(jnp.float32))

    # E: BN folded into conv weights
    w1f = w1 * s64b.astype(jnp.bfloat16)[None, None, None, :]
    w2f = w2 * s128.astype(jnp.bfloat16)[None, None, None, :]
    w0f = w0 * s64a.astype(jnp.bfloat16)[None, None, None, :]

    @jax.jit
    def E(x):
        v = x.astype(jnp.bfloat16)
        v = jax.nn.relu(conv(v, w0f, 2, 1) + b64a.astype(jnp.bfloat16))
        s0 = conv(v, w1f, 1, 1) + b64b.astype(jnp.bfloat16)
        s1 = conv(jax.nn.relu(s0), w2f, 2, 1) + b128.astype(jnp.bfloat16)
        return jnp.sum(s0.astype(jnp.float32)) + jnp.sum(s1.astype(jnp.float32))

    @jax.jit
    def F(x):
        return jnp.sum(x.astype(jnp.bfloat16).astype(jnp.float32))

    for name, f in [("A model stems", A), ("B hand bf16 bn+relu", B),
                    ("C convs only", C), ("D convs s2d-stem0", D),
                    ("E folded-BN", E), ("F cast only", F)]:
        print(f"{name:<28s} {time_program(f, x)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
