"""Fused Pallas TPU kernel for the three ADD stems (eval path).

The reference stems (ADD.py:154-169) are three back-to-back convs:

    stem0: conv 3x3 s2  3->64  + BN + ReLU        (input resolution)
    stem1: conv 3x3 s1 64->64  + BN      -> s0    (half resolution)
    stem2: ReLU + conv 3x3 s2 64->128 + BN -> s1  (quarter resolution)

Via XLA this chain costs ~4.8 ms at 1025x2049 on v5e (profiler-traced) and
is dominated by overheads, not FLOPs: the C_in=3 stem0 conv pads 3 channels
to 128 lanes (~1.6 TF/s) and XLA inserts ~1.5 ms of pure layout copies
between the stages. This kernel computes the whole chain in one
pallas_call, tiled over rows, with W in sublanes and channels in lanes:

  * stride-2 column access is FREE via a bf16 bit trick: Mosaic packs bf16
    sublane pairs into 32-bit words, so bitcasting (2W, C) bf16 -> (W, C)
    uint32 merges adjacent columns; the even column is the low half-word
    and the odd column the high half-word, recovered as f32 by shifts —
    no strided memory access, no parity pre-splitting of activations;
  * the input arrives as three channel planes (one cheap XLA pad+transpose,
    ~0.08 ms); in-kernel each tile is transposed to W-major with a tiny
    MXU identity-matmul, then stem0 is 27 broadcast FMAs on the VPU;
  * stem1/stem2 are MXU matmuls (W0, 192) @ (192, C_out) on im2cols built
    from scratch-stored shifted copies (stores normalize lane offsets);
  * eval BN folds to per-channel scale/bias in-register; outputs are
    written directly in NHWC — no epilogue.

Training keeps the XLA path (batch statistics + autodiff).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """Eval-mode BN y = (x-mean)*rsqrt(var+eps)*scale + bias as y = x*s + b."""
    s = scale * jax.lax.rsqrt(var + eps)
    return s, bias - mean * s


def _row_shift(v, s):
    """out[w] = v[w+s], zero-filled (w = leading/sublane axis)."""
    if s == 0:
        return v
    if s > 0:
        return jnp.concatenate([v[s:, :], jnp.zeros((s, v.shape[1]), v.dtype)], 0)
    return jnp.concatenate([jnp.zeros((-s, v.shape[1]), v.dtype), v[:s, :]], 0)


def _split_even_odd(v_bf16):
    """(2n, m) bf16 -> (even, odd) (n, m) f32 of sublane pairs.

    Relies on Mosaic's (2, 1) bf16 packing: sublanes 2k/2k+1 share one
    32-bit word (low/high half). bf16 -> f32 is a 16-bit left shift.
    """
    u = pltpu.bitcast(v_bf16, jnp.uint32)         # (n, m)
    even = pltpu.bitcast(u << 16, jnp.float32)
    odd = pltpu.bitcast(u & jnp.uint32(0xFFFF0000), jnp.float32)
    return even, odd


def _stems_kernel(
    xc_hbm,   # (3, Hp, Wp) bf16 HBM channel planes: xc[c, i, j] = x[i-5, j-1]
    ident_ref,  # (NR, NR) bf16 identity (MXU transpose helper)
    w3_ref,   # (9*NR, NA0*64) bf16: stem0 taps -> all rows' outputs
    s0s_ref, s0b_ref,   # (1, 64) f32 folded bn0
    w1_ref,   # (3, 192, 64) bf16  [dh][dw-major taps, o]
    s1s_ref, s1b_ref,   # (1, 64) f32 folded bn1
    w2_ref,   # (3, 192, 128) bf16 [dh][taps, o]
    s2s_ref, s2b_ref,   # (1, 128) f32 folded bn2
    s0_out,   # block (TS0, W0, 64) bf16  — NHWC rows, written directly
    s1_out,   # block (TS1, W1, 128) bf16
    xbuf, xte, xto, xtesh, a0, m1, a1e, a1o, sem,
    *, TS1: int, H0: int, W0: int, W1: int,
):
    """Grid step a: s1 rows [TS1*a, TS1*(a+1)), s0 rows [TS0*a, TS0*(a+1))."""
    a = pl.program_id(0)
    TS0 = 2 * TS1
    NA0 = TS0 + 3          # stem0 rows computed: [TS0*a-2, TS0*a+TS0+1)
    W0p = a0.shape[1]      # even, >= W0+1; sublane dim of the a0 rows
    NR = xbuf.shape[2]     # x rows DMA'd per tile

    # double-buffered input DMA: start tile a+1's copy before computing a
    def in_dma(slot, idx):
        return pltpu.make_async_copy(
            xc_hbm.at[:, pl.ds(2 * TS0 * idx, NR), :], xbuf.at[slot], sem.at[slot]
        )

    @pl.when(a == 0)
    def _():
        in_dma(0, 0).start()

    @pl.when(a + 1 < pl.num_programs(0))
    def _():
        in_dma((a + 1) % 2, a + 1).start()

    in_dma(a % 2, a).wait()
    slot = a % 2

    # ---- transpose each channel tile to W-major (tiny MXU matmul) ----------
    # xT[c] (Wp, NR): sublane = padded x column, lane = local x row. Split
    # sublane (column) pairs: E[c][p] = x col 2p-1, O[c][p] = x col 2p.
    for c in range(3):
        xt = jax.lax.dot_general(
            xbuf[slot, c], ident_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)                     # (Wp, NR)
        e, o = _split_even_odd(xt)
        e = e.astype(jnp.bfloat16)
        xte[c] = e
        xto[c] = o.astype(jnp.bfloat16)
        # sublane-shifted copy stored through scratch so the X3 lane-concat
        # sees offset-0 layouts only
        W0p_ = xtesh.shape[1]
        xtesh[c] = e[1 : W0p_ + 1]

    # ---- stem0 (VPU): 27 broadcast FMAs per output row ---------------------
    # out[w] taps x cols {2w-1, 2w, 2w+1} = E[w], O[w], E[w+1]; x row
    # 2r+dh-1 lives at DMA-local lane 2*rr + dh (r = TS0*a - 2 + rr).
    # Rows outside [0, H0) and cols >= W0 must end up ZERO in a0 (they are
    # stem1's padding; BN bias would otherwise leak in).
    # Stem0 as ONE MXU matmul: every tap value for every output row of
    # the tile lives in X3 = [streams s x channels c x DMA lanes l] and the
    # row-dependence (which lanes feed row rr) is folded into a precomputed
    # weight matrix w3 (144, NA0*64): y_all = X3 @ w3 computes a0 for ALL
    # rows of the tile at full MXU utilization (VPU broadcast-FMA and
    # per-tap load forms measured 2.4-3.4 ms; this is ~0.15 ms).
    sub = jax.lax.broadcasted_iota(jnp.int32, (W0p, 1), 0)
    parts = []
    for c in range(3):
        parts.append(xte[c, 0:W0p, :])           # s=0: e[v]
    for c in range(3):
        parts.append(xto[c, 0:W0p, :])           # s=1: o[v]
    for c in range(3):
        parts.append(xtesh[c, 0:W0p, :])         # s=2: e[v+1]
    X3 = jnp.concatenate(parts, axis=1)          # (W0p, 9*NR)
    y_all = jax.lax.dot_general(
        X3, w3_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                            # (W0p, NA0*64)
    for rr in range(NA0):
        r = TS0 * a - 2 + rr
        ok = jnp.logical_and(r >= 0, r < H0)
        acc = y_all[:, 64 * rr : 64 * rr + 64]
        v = jnp.maximum(acc * s0s_ref[:] + s0b_ref[:], 0.0).astype(jnp.bfloat16)
        v = jnp.where(jnp.logical_and(ok, sub < W0), v, jnp.bfloat16(0))
        a0[rr] = v

    # ---- stem1 (MXU): im2col matmuls, NHWC output --------------------------
    # Each a0 row's (W0p, 192) column-im2col [w-1 | w | w+1] is consumed by
    # THREE output rows (as their dh=2/1/0 tap row). Build it ONCE per a0
    # row into the m1 scratch instead of once per (output row, dh) — 7
    # concat+shift builds per tile instead of 15, identical values.
    for rr in range(NA0):
        v = a0[rr]
        m1[rr] = jnp.concatenate(
            [_row_shift(v, -1), v, _row_shift(v, +1)], axis=1
        )  # (W0p, 192): taps w-1 | w | w+1 = dw 0 | 1 | 2

    # s0 local row r2 in [0, TS0]: global row TS0*a - 1 + r2 (r2 == 0 is the
    # stem2 halo row above the tile). Uses a0 local rows r2 .. r2+2.
    def s0_row(r2, _):
        y = jnp.zeros((W0p, 64), jnp.float32)
        for dh in range(3):
            y = y + jax.lax.dot_general(
                m1[r2 + dh], w1_ref[dh], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        s0row = y * s1s_ref[:] + s1b_ref[:]

        @pl.when(r2 >= 1)
        def _():
            s0_out[r2 - 1] = s0row[:W0, :].astype(jnp.bfloat16)

        # ReLU row for stem2: zero outside the image, then split into column
        # parity streams by the same bf16-pair bitcast.
        g = TS0 * a - 1 + r2
        ok = jnp.logical_and(g >= 0, g < H0)
        rl = jnp.maximum(s0row, 0.0).astype(jnp.bfloat16)
        rl = jnp.where(jnp.logical_and(ok, sub < W0), rl, jnp.bfloat16(0))
        e, o = _split_even_odd(rl)                 # (W0p//2, 64) f32
        a1e[r2] = e.astype(jnp.bfloat16)
        a1o[r2] = o.astype(jnp.bfloat16)
        return 0

    jax.lax.fori_loop(0, TS0 + 1, s0_row, 0)

    # ---- stem2 (MXU): stride-2 conv on the parity streams ------------------
    # s1[q, w1] taps relu(s0) cols {2w1-1, 2w1, 2w1+1} = o[w1-1], e[w1],
    # o[w1] — unit-stride rows of the pair streams.
    def s1_row(q, _):
        y = jnp.zeros((a1e.shape[1], 128), jnp.float32)
        for dh in range(3):
            po = a1o[2 * q + dh]
            m = jnp.concatenate(
                [_row_shift(po, -1), a1e[2 * q + dh], po], axis=1
            )  # (W0p//2, 192): dw 0 | 1 | 2
            y = y + jax.lax.dot_general(
                m, w2_ref[dh], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        s1row = y * s2s_ref[:] + s2b_ref[:]
        s1_out[q] = s1row[:W1, :].astype(jnp.bfloat16)
        return 0

    jax.lax.fori_loop(0, TS1, s1_row, 0)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _round_up8(n: int) -> int:
    return _round_up(n, 8)


def _conv_out(n: int) -> int:
    """Output size of k=3 s=2 p=1 (PyTorch conv arithmetic)."""
    return (n - 1) // 2 + 1


def _scratch_bytes(TS1: int, W: int) -> int:
    """VMEM scratch footprint of the kernel at (TS1, image width W)."""
    TS0 = 2 * TS1
    NA0 = TS0 + 3
    NR = _round_up8(2 * NA0 + 2)
    W0 = _conv_out(W)
    W0p = -(-(W0 + 2) // 8) * 8
    Wp = -(-(W0p + 1) * 2 // 128) * 128
    n = (
        2 * 3 * NR * Wp          # xbuf x2
        + 2 * 3 * (Wp // 2) * NR  # even/odd splits
        + 3 * W0p * NR            # e[v+1] copy
        + NA0 * W0p * 64          # a0
        + NA0 * W0p * 192         # m1 im2col
        + 2 * (TS0 + 1) * (W0p // 2) * 64  # relu even/odd
        + TS0 * W0 * 64 + TS1 * _conv_out(W0) * 128  # output blocks
    )
    return 2 * n  # bf16


_VMEM_LIMIT = 100 * 2**20  # requested scoped-VMEM ceiling (v5e has 128 MB)


def pick_ts1(W: int, budget: int = 64 * 2**20) -> int:
    """Largest sweep-validated row tile whose scratch fits the budget.

    On-chip sweep at 1025x2049 (scripts/ab_stems_ts1.py, v5e): TS1=2
    2.374 ms, TS1=4 1.998 ms, TS1=8 1.908 ms; TS1=16 drifts 2 bf16 ulp
    (different MXU accumulation tiling) and is excluded. The budget keeps
    a safety margin under _VMEM_LIMIT for Mosaic's own allocations.
    """
    for ts1 in (8, 4, 2):
        if _scratch_bytes(ts1, W) <= budget:
            return ts1
    return 2


@functools.partial(jax.jit, static_argnames=("interpret", "TS1"))
def fused_stems(
    x: jnp.ndarray,           # (1, H, W, 3) any float dtype
    w0, bn0_s, bn0_b,         # (3,3,3,64) conv + folded bn (64,)
    w1, bn1_s, bn1_b,         # (3,3,64,64) + (64,)
    w2, bn2_s, bn2_b,         # (3,3,64,128) + (128,)
    interpret: bool = False,
    TS1: int | None = None,   # s1 rows per grid tile (VMEM grows with TS1)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (s0 (1,H0,W0,64) bf16 pre-relu, s1 (1,H1,W1,128) bf16)."""
    _, H, W, _ = x.shape
    if TS1 is None:
        TS1 = pick_ts1(W)
    H0, W0 = _conv_out(H), _conv_out(W)
    H1, W1 = _conv_out(H0), _conv_out(W0)
    W0p = -(-(W0 + 2) // 8) * 8       # 8-aligned, even, >= W0+1

    # DMA row starts are 2*TS0*a = 4*TS1*a: 8-aligned for all grid steps
    # only when TS1 is even (odd TS1 would start copies at rows ≡4 mod 8).
    assert TS1 % 2 == 0, f"TS1 must be even, got {TS1}"
    TS0 = 2 * TS1
    NA0 = TS0 + 3
    NR = _round_up8(2 * NA0 + 2)  # x rows per tile, 8-aligned
    assert NR % 8 == 0
    grid = pl.cdiv(H1, TS1)

    # channel planes with conv padding folded in: xc[c, i, j] = x[i-5, j-1]
    # (row offset 5 keeps every DMA start 2*TS0*a >= 0 and 8-aligned).
    Hp = 2 * TS0 * grid + NR
    Wp = -(-(W0p + 1) * 2 // 128) * 128
    xc = jnp.zeros((3, Hp, Wp), jnp.bfloat16)
    xc = jax.lax.dynamic_update_slice(
        xc, x[0].astype(jnp.bfloat16).transpose(2, 0, 1), (0, 5, 1)
    )

    ident = jnp.eye(NR, dtype=jnp.bfloat16)
    # stem0 tap->row selection: S[dh, l, rr] = 1 iff lane l feeds row rr's
    # dh tap (l == 2*rr + dh); combined with w0 into one (9*NR, NA0*64)
    # matmul weight (K order: stream s, channel c, lane l; N: row rr, out o)
    import numpy as _np
    S = _np.zeros((3, NR, NA0), _np.float32)
    for dh in range(3):
        for rr in range(NA0):
            if 2 * rr + dh < NR:
                S[dh, 2 * rr + dh, rr] = 1.0
    Sj = jnp.asarray(S)
    w0f = w0.astype(jnp.float32)
    w3 = jnp.stack(
        [
            jnp.einsum("dlr,dco->clro", Sj, w0f[:, dw]) for dw in range(3)
        ],
        axis=0,
    )  # (3s, 3c, NR, NA0, 64)
    w3 = w3.reshape(9 * NR, NA0 * 64).astype(jnp.bfloat16)
    w1p = w1.astype(jnp.bfloat16).reshape(3, 192, 64)    # [dh][dw-major, o]
    w2p = w2.astype(jnp.bfloat16).reshape(3, 192, 128)
    s0s, s0b = bn0_s.astype(jnp.float32)[None], bn0_b.astype(jnp.float32)[None]
    s1s, s1b = bn1_s.astype(jnp.float32)[None], bn1_b.astype(jnp.float32)[None]
    s2s, s2b = bn2_s.astype(jnp.float32)[None], bn2_b.astype(jnp.float32)[None]

    kernel = functools.partial(_stems_kernel, TS1=TS1, H0=H0, W0=W0, W1=W1)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    s0, s1 = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] + [vmem] * 10,
        out_specs=[
            pl.BlockSpec((TS0, W0, 64), lambda a: (a, 0, 0)),
            pl.BlockSpec((TS1, W1, 128), lambda a: (a, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H0, W0, 64), jnp.bfloat16),
            jax.ShapeDtypeStruct((H1, W1, 128), jnp.bfloat16),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 3, NR, Wp), jnp.bfloat16),           # xbuf x2
            pltpu.VMEM((3, Wp // 2, NR), jnp.bfloat16),         # x even cols
            pltpu.VMEM((3, Wp // 2, NR), jnp.bfloat16),         # x odd cols
            pltpu.VMEM((3, W0p, NR), jnp.bfloat16),             # e[v+1] copy
            pltpu.VMEM((NA0, W0p, 64), jnp.bfloat16),           # a0
            pltpu.VMEM((NA0, W0p, 192), jnp.bfloat16),          # m1 im2col
            pltpu.VMEM((TS0 + 1, W0p // 2, 64), jnp.bfloat16),  # relu even
            pltpu.VMEM((TS0 + 1, W0p // 2, 64), jnp.bfloat16),  # relu odd
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # the 16 MB default scoped-VMEM limit binds at TS1 >= 4 (v5e has
        # 128 MB); raise it so larger row tiles can amortize loop overhead
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xc, ident, w3, s0s, s0b, w1p, s1s, s1b, w2p, s2s, s2b)
    return s0[None], s1[None]


def fold_stem_bns(params, batch_stats):
    """Conv weights + folded eval-BN scale/bias from a `stems` subtree."""
    out = []
    for cname, bname in (
        ("stem0_conv", "stem0_bn"),
        ("stem1_conv", "stem1_bn"),
        ("stem2_conv", "stem2_bn"),
    ):
        w = params[cname]["kernel"]
        s, b = fold_bn(
            params[bname]["scale"], params[bname]["bias"],
            batch_stats[bname]["mean"], batch_stats[bname]["var"],
        )
        out.extend([w, s, b])
    return tuple(out)
