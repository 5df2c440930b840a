"""A/B the three profile-driven rewrites, exactness + speed, on TPU.

1. stem0: lax conv 3x3 s2 3->64 at 1025x2049  vs  9-slice im2col matmul.
2. ASPP tail: concat(5x256)->1x1 conv  vs  sum of 5 per-branch matmuls.
3. logits tail: f32 classifier -> f32 banded upscale -> entropy
   vs bf16 upscale -> entropy (speed + max deviation).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from auto_dynamic_deeplab_tpu.ops.resize import resize_bilinear


def timep(fn, *args, iters=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def conv(x, w, stride=1, dilation=1, padding=0):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding), (padding, padding)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def main():
    rng = np.random.RandomState(0)

    # ---------------- 1. stem0
    x = jnp.asarray(rng.randn(1, 1025, 2049, 3).astype(np.float32))
    w0 = jnp.asarray(rng.randn(3, 3, 3, 64), jnp.bfloat16) * 0.1

    @jax.jit
    def stem0_conv(x):
        v = x.astype(jnp.bfloat16)
        return jnp.sum(conv(v, w0, 2, padding=1).astype(jnp.float32))

    @jax.jit
    def stem0_im2col(x):
        v = x.astype(jnp.bfloat16)
        vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [
            vp[:, di:di + 1025:2, dj:dj + 2049:2, :]
            for di in range(3)
            for dj in range(3)
        ]
        p = jnp.concatenate(cols, axis=-1)  # (1,513,1025,27)
        y = jax.lax.dot_general(
            p.reshape(-1, 27), w0.reshape(27, 64), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16).reshape(1, 513, 1025, 64)
        return jnp.sum(y.astype(jnp.float32))

    a, b = stem0_conv(x), stem0_im2col(x)
    print(f"stem0 sums: conv {float(a):.1f}  im2col {float(b):.1f}")
    print(f"stem0 conv    {timep(stem0_conv, x)*1e3:7.2f} ms")
    print(f"stem0 im2col  {timep(stem0_im2col, x)*1e3:7.2f} ms")

    # ---------------- 2. ASPP tail at 65x129, 5 branches of 256
    brs = [jnp.asarray(rng.randn(1, 65, 129, 256), jnp.bfloat16) for _ in range(5)]
    wc = jnp.asarray(rng.randn(1, 1, 1280, 256), jnp.bfloat16) * 0.05

    @jax.jit
    def aspp_concat(*brs):
        y = jnp.concatenate(brs, axis=-1)
        return jnp.sum(conv(y, wc).astype(jnp.float32))

    @jax.jit
    def aspp_summm(*brs):
        acc = None
        for i, br in enumerate(brs):
            wi = wc[:, :, i * 256:(i + 1) * 256, :]
            y = jax.lax.dot_general(
                br.reshape(-1, 256), wi.reshape(256, 256),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            acc = y if acc is None else acc + y
        return jnp.sum(acc)

    a, b = aspp_concat(*brs), aspp_summm(*brs)
    print(f"\naspp sums: concat {float(a):.1f}  summm {float(b):.1f}")
    print(f"aspp concat+conv {timep(aspp_concat, *brs)*1e3:7.2f} ms")
    print(f"aspp matmul-sum  {timep(aspp_summm, *brs)*1e3:7.2f} ms")

    # ---------------- 3. logits tail: classifier f32 -> upscale -> entropy
    feat = jnp.asarray(rng.randn(1, 129, 257, 256), jnp.bfloat16)
    wcls = jnp.asarray(rng.randn(1, 1, 256, 19).astype(np.float32)) * 0.05

    def entropy(logits):
        p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        ent = -jnp.sum(p * jnp.log(p + 1e-12), axis=-1)
        return jnp.mean(ent) / np.log(19)

    @jax.jit
    def tail_f32(feat):
        lg = conv(feat.astype(jnp.float32), wcls)
        full = resize_bilinear(lg, (1025, 2049), align_corners=False)
        return entropy(full), full

    @jax.jit
    def tail_bf16(feat):
        lg = conv(feat.astype(jnp.float32), wcls).astype(jnp.bfloat16)
        full = resize_bilinear(lg, (1025, 2049), align_corners=False)
        return entropy(full), full

    (ea, fa), (eb, fb) = tail_f32(feat), tail_bf16(feat)
    dev = float(jnp.max(jnp.abs(fa - fb.astype(jnp.float32))))
    print(f"\nlogits tail entropy: f32 {float(ea):.5f}  bf16 {float(eb):.5f} "
          f" max|dlogits| {dev:.4f}")
    print(f"tail f32   {timep(tail_f32, feat)*1e3:7.2f} ms")
    print(f"tail bf16  {timep(tail_bf16, feat)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
