"""stem0 rewrite candidate: space-to-depth via 4 strided slices (not
reshape/transpose, which profiled 8 ms) + 2x2 conv on 12 channels.

Exactness: out[i,j] = sum_{di,dj in 0..2} x[2i+di-1, 2j+dj-1] W[di,dj]
with zero pad. Define planes p[a][b][u,v] = xpad[2u+a, 2v+b] where xpad has
1 leading zero row/col (so index 2u+a-1 -> planes of xpad at parity (a,b)).
Then the 3x3 s2 conv is a 2x2 conv over the 12-channel packed tensor.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timep(fn, *args, iters=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def conv(x, w, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def main():
    rng = np.random.RandomState(0)
    H, W = 1025, 2049
    x = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    w0 = jnp.asarray(rng.randn(3, 3, 3, 64), jnp.bfloat16) * 0.1

    @jax.jit
    def base(x):
        v = x.astype(jnp.bfloat16)
        y = conv(v, w0, 2, padding=1)
        return y

    # packed form: xpad (H+3, W+3) zeros at top/left(1) and bottom/right(2)
    # p[a,b][u,v] = xpad[2u+a, 2v+b], u in 0..(H+1)//2, sizes 513/514
    # out[i,j] = sum_{di,dj} xpad[2i+di, 2j+dj] W[di,dj]
    #          = sum over (a,b) parity: di in {a, a+2}
    # 2x2 conv over p with kernel K[da,db][(a,b,c)] = W[2*da+a? ...]
    # derive: tap (di,dj): di = a + 2*da with a=di%2, da=di//2 (di in 0..2:
    # di=0 ->(a0,da0), 1->(1,0), 2->(0,1)). So K[da,db, (a,b,c)] = W[2da+a,2db+b]
    # valid only when 2da+a <= 2; (a=1,da=1) unused -> zero.
    def pack(v):
        vp = jnp.pad(v, ((0, 0), (1, 2), (1, 2), (0, 0)))  # H+3, W+3
        planes = [
            vp[:, a::2, b::2, :][:, :513 + 1, :1025 + 1, :]
            for a in range(2)
            for b in range(2)
        ]
        # each plane: ceil((H+3-a)/2) rows -> 514; crop to 514x1026
        planes = [p[:, :514, :1026, :] for p in planes]
        return jnp.concatenate(planes, axis=-1)  # (1, 514, 1026, 12)

    w_k = np.zeros((2, 2, 12, 64), np.float32)
    w0np = np.asarray(w0, np.float32)
    for a in range(2):
        for b in range(2):
            for da in range(2):
                for db in range(2):
                    di, dj = 2 * da + a, 2 * db + b
                    if di <= 2 and dj <= 2:
                        w_k[da, db, (2 * a + b) * 3:(2 * a + b) * 3 + 3, :] = \
                            w0np[di, dj]
    w_k = jnp.asarray(w_k, jnp.bfloat16)

    @jax.jit
    def s2d(x):
        v = x.astype(jnp.bfloat16)
        p = pack(v)
        return conv(p, w_k, 1, padding=0)  # (1, 513, 1025, 64)

    a = base(x)
    b = s2d(x)
    print("shapes:", a.shape, b.shape)
    d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print("max abs diff:", d)
    print(f"base {timep(base, x)*1e3:7.2f} ms")
    print(f"s2d  {timep(s2d, x)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
