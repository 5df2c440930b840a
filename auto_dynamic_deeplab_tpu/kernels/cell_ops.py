"""Fused Pallas conv-stage kernels for decoded-cell DAGs (eval path).

The decoded cells (modeling/ADD.py:14-116 in the reference) are DAGs of
small ops at tiny channel counts (C = F * fm[level], typically 40 at the
hot level-1 resolution 129x257). Via XLA every op runs NHWC with C in the
128-lane minor dim, so C=40 wastes 69% of every VPU op and every byte of
HBM traffic, and each op costs its own kernel launch + layout glue
(profiled: a level-1 cell = ~1.25 ms, ~30 ops at ~10% utilization).

This module runs each conv *stage* as ONE pallas_call in a flat
channel-major layout:

    state: (CS, L) bf16, CS = C rounded to 16 (zero pad rows),
    L = P | row 0 | pad | row 1 | pad | ... | P
    position of pixel (h, w) = P + h*Ws + w, Ws = W + 8.

  * Spatial taps (dh, dw) become single lane shifts s = dh*Ws + dw; the
    inter-row pad and the P halos hold zeros, so conv zero-padding needs
    no per-tap masking.
  * The source state stays in HBM; each grid block DMAs its
    (CS, CHUNK + 2*halo) lane window into a double-buffered VMEM scratch
    (the kernels/stems.py pattern). At the hot level-1 size (257x513,
    C=40) the full state is ~13.5 MB — pinning it in VMEM via in_specs
    would blow the ~16 MB budget once the dil5 im2col scratch is added;
    streaming keeps every stage a few MB regardless of resolution.
  * A depthwise+pointwise pair (SepConv stage, operations.py:46-62) is
    ntaps VPU FMAs (per-channel tap weights broadcast along lanes) + one
    MXU matmul (O, CS) @ (CS, CHUNK) — C channels occupy C sublanes, not
    128 lanes.
  * A dense conv (DilConv, operations.py:32-43 — the reference's DilConv
    is non-separable) is an in-VMEM im2col (ntaps*CS, CHUNK) + one MXU
    matmul with the full kernel as Q (O, ntaps*CS).
  * Eval BatchNorm folds into the matmul weights (scale) and a bias.

Training keeps the XLA path (batch statistics + autodiff); this is an
inference-path kernel like kernels/stems.py.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stems import _round_up, fold_bn


def pick_chunk(C: int) -> int:
    """Largest lane block keeping the worst stage (dil5 im2col: 25*CS*chunk
    bf16 scratch) within ~10 MB of VMEM — the windows/outputs/weights add
    <3 MB on top (test_stage_vmem_budget_at_flagship_sizes). Bigger blocks
    mean fewer grid steps and lower halo read amplification."""
    cs = pad_channels(C)
    limit = 10 * 2**20
    for chunk in (4096, 2048, 1024):
        if 25 * cs * chunk * 2 <= limit:
            return chunk
    return 512


@dataclasses.dataclass(frozen=True)
class FlatSpec:
    """Flat spatial layout shared by every state of one cell DAG."""

    H: int
    W: int
    chunk: int = 1024

    @property
    def Ws(self) -> int:  # row stride; 8 covers any primitive's dw reach (<=4)
        return self.W + 8

    @property
    def core(self) -> int:
        return self.H * self.Ws

    @property
    def P(self) -> int:  # halo >= the largest tap shift (dil5 d=2: 4*Ws+4)
        return _round_up(4 * self.Ws + 4, self.chunk)

    @property
    def L(self) -> int:
        return 2 * self.P + _round_up(self.core, self.chunk)


def pad_channels(c: int) -> int:
    return _round_up(c, 16)


def to_flat(x: jnp.ndarray, spec: FlatSpec) -> jnp.ndarray:
    """(1, H, W, C) -> (CS, L) with zeros in all pad regions."""
    _, H, W, C = x.shape
    assert (H, W) == (spec.H, spec.W), ((H, W), (spec.H, spec.W))
    cs = pad_channels(C)
    v = x[0].transpose(2, 0, 1)
    v = jnp.pad(v, ((0, cs - C), (0, 0), (0, spec.Ws - W)))
    v = v.reshape(cs, spec.core)
    return jnp.pad(v, ((0, 0), (spec.P, spec.L - spec.P - spec.core)))


def from_flat(f: jnp.ndarray, C: int, spec: FlatSpec) -> jnp.ndarray:
    """(CS, L) -> (1, H, W, C)."""
    v = f[:C, spec.P : spec.P + spec.core].reshape(C, spec.H, spec.Ws)
    return v[:, :, : spec.W].transpose(1, 2, 0)[None]


def op_taps(kind: str, k: int, dilation: int = 1) -> Tuple[Tuple[int, int], ...]:
    """(dh, dw) taps in flax nn.Conv kernel index order (kh-major)."""
    r = k // 2
    return tuple(
        (dilation * (i - r), dilation * (j - r))
        for i in range(k)
        for j in range(k)
    )


# ---------------------------------------------------------------- kernels

# Lane sub-tile for depthwise tap accumulation. Mosaic allocates a fresh
# stack buffer for EVERY per-tap (CS, width) f32 temporary in an unrolled
# FMA chain (no reuse — measured: a 25-tap chain at (160, 1536) f32 wants
# 22.9 MB of scoped VMEM; the same chain in 512-lane sub-tiles compiles
# fine, scripts/probe_fma_styles.py). Sub-tiling bounds the live set at
# ntaps * CS * TS * 4 bytes regardless of the window width.
_TS = 256


def _tap_ts(cs: int) -> int:
    """Tap-chain lane sub-tile: narrower at high channel counts so the
    (assumed non-reused) per-tap f32 temporaries stay ~1-2 MB."""
    return _TS if cs <= 64 else _TS // 2


def _pick_sb(cs: int, chunk: int) -> int:
    """dil im2col sub-chunk: largest keeping the (ntaps*CS, SB) scratch
    within ~4 MB (25 taps, bf16)."""
    for sb in (1024, 512, 256):
        if sb <= chunk and 25 * cs * sb * 2 <= 4 * 2**20:
            return sb
    return min(256, chunk)


def _acc_taps(acc_ref, src, shifts, dwk_ref, off0, width):
    """acc_ref[:, :width] = sum_t src[:, off0+s_t : +width] * dwk[:, t],
    accumulated in f32 by lane sub-tiles."""
    cs = acc_ref.shape[0]
    ts = math.gcd(width, _tap_ts(cs))
    for j in range(width // ts):
        a = jnp.zeros((cs, ts), jnp.float32)
        for t, s in enumerate(shifts):
            o = off0 + s + j * ts
            a = a + src[:, o : o + ts].astype(jnp.float32) * dwk_ref[:, t : t + 1]
        acc_ref[:, j * ts : (j + 1) * ts] = a


def _valid_mask(base, P, core, Ws, W, CHUNK):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    g = base - P + lane
    return jnp.logical_and(g < core, jax.lax.rem(g, Ws) < W)


def _valid_mask_ext(base, P, core, Ws, W, M):
    """Like _valid_mask but for extended (halo-overlapping) regions where
    positions left of the core (g < 0) must also be zeroed — the fused
    sep kernel evaluates stage 1 there, and BN bias + ReLU would otherwise
    make those halo lanes nonzero for stage 2's taps."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
    g = base - P + lane
    ok = jnp.logical_and(g >= 0, g < core)
    return jnp.logical_and(ok, jax.lax.rem(g, Ws) < W)


def stage_halo(shifts: Tuple[int, ...], P: int) -> int:
    """DMA window halo for one stage: the largest |lane shift|, rounded up
    so window starts stay 512-lane aligned, clamped to P (P >= the worst
    primitive reach by construction, so the clamp never truncates taps;
    it only matters for tiny test chunks where P < 512)."""
    smax = max(max(shifts), -min(shifts), 0)
    return min(_round_up(max(smax, 1), 512), P)


def sep_fused_halo(shifts: Tuple[int, ...], P: int) -> Tuple[int, int]:
    """(E2, hs) for the fused two-stage SepConv kernel: E2 is the stage-2
    tap reach (128-aligned, sizes the mid scratch), hs the source window
    halo covering stage 1's reach over the extended mid region (512-aligned
    DMA starts, clamped to P). Shared with the VMEM-budget test so the
    modeled window never drifts from the kernel's."""
    smax = max(max(shifts), -min(shifts), 0)
    E2 = _round_up(smax, 128)
    hs = min(_round_up(smax + E2, 512), P)
    return E2, hs


def _window_dma(src_hbm, xwin, sem, i, chunk, hs, slot):
    """Start/wait handle for block i's (CS, CHUNK + 2*hs) source window.

    The lane-dim slice offset is dynamic; Mosaic must prove it divisible by
    the 128-lane tiling or refuse to lower (`memref_slice ... divisible by
    the tiling`). i*chunk - hs is statically a multiple of gcd(chunk, hs)
    (both 512-aligned in real configs) — assert that via pl.multiple_of."""
    start = pl.multiple_of(i * chunk - hs, math.gcd(chunk, hs) if hs else chunk)
    return pltpu.make_async_copy(
        src_hbm.at[:, pl.ds(start, xwin.shape[2])],
        xwin.at[slot],
        sem.at[slot],
    )


def _stream_blocks(src_hbm, xwin, sem, P, CHUNK, hs, compute, out_ref):
    """Shared grid-step driver: zero the pad blocks, double-buffer the
    in-core source windows, call `compute(window)` on each core block."""
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    pb = P // CHUNK  # P is a multiple of CHUNK by construction
    in_core = jnp.logical_and(i >= pb, i < nblk - pb)

    @pl.when(i == pb)
    def _():
        _window_dma(src_hbm, xwin, sem, i, CHUNK, hs, i % 2).start()

    @pl.when(jnp.logical_and(in_core, i + 1 < nblk - pb))
    def _():
        _window_dma(src_hbm, xwin, sem, i + 1, CHUNK, hs, (i + 1) % 2).start()

    @pl.when(jnp.logical_not(in_core))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(in_core)
    def _():
        _window_dma(src_hbm, xwin, sem, i, CHUNK, hs, i % 2).wait()
        compute(xwin[i % 2])


def _sep_stage_kernel(
    src_hbm,    # (CS, L) source state in HBM, already ReLU'd, zeros in pads
    dwk_ref,    # (CS, ntaps) f32 depthwise tap weights (zero pad rows)
    pw_ref,     # (OS, CS) pointwise kernel with BN scale folded
    bias_ref,   # (OS, 1) f32 folded BN bias (zero pad rows)
    out_ref,    # block (OS, CHUNK)
    xwin,       # scratch (2, CS, CHUNK + 2*hs) double-buffered window
    sem,        # DMA semaphores (2,)
    acc_sc,     # scratch (CS, CHUNK) f32 tap accumulator
    *,
    shifts: Tuple[int, ...],
    hs: int,
    P: int,
    core: int,
    Ws: int,
    W: int,
    out_relu: bool,
    in_relu: bool,
):
    CHUNK = out_ref.shape[1]
    base = pl.program_id(0) * CHUNK

    def compute(win):
        src = jnp.maximum(win[:], 0) if in_relu else win[:]
        _acc_taps(acc_sc, src, shifts, dwk_ref, hs, CHUNK)
        y = jax.lax.dot_general(
            pw_ref[:],
            acc_sc[:].astype(out_ref.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = y + bias_ref[:]
        y = jnp.where(_valid_mask(base, P, core, Ws, W, CHUNK), y, 0.0)
        if out_relu:
            y = jnp.maximum(y, 0.0)
        out_ref[:] = y.astype(out_ref.dtype)

    _stream_blocks(src_hbm, xwin, sem, P, CHUNK, hs, compute, out_ref)


def _dense_stage_kernel(
    src_hbm,    # (CS, L) in HBM
    q_ref,      # (OS, ntaps*CS) kernel (BN scale folded)
    bias_ref,   # (OS, 1)
    out_ref,    # block (OS, CHUNK)
    xwin,       # scratch (2, CS, CHUNK + 2*hs)
    sem,        # DMA semaphores (2,)
    xt_ref,     # scratch (ntaps*CS, SB) im2col sub-chunk
    *,
    shifts: Tuple[int, ...],
    hs: int,
    P: int,
    core: int,
    Ws: int,
    W: int,
    out_relu: bool,
    in_relu: bool,
    SB: int,
):
    CHUNK = out_ref.shape[1]
    CS = xwin.shape[1]
    base = pl.program_id(0) * CHUNK

    def compute(win):
        src = jnp.maximum(win[:], 0) if in_relu else win[:]
        # im2col per SB sub-chunk (bounds the scratch), sub-tiled stores
        # (a full-width copy per tap would pin ntaps (CS, SB) stack
        # temporaries — no reuse, see the _TS note)
        ts = math.gcd(SB, _tap_ts(CS))
        subs = []
        for sub in range(CHUNK // SB):
            so = sub * SB
            for t, s in enumerate(shifts):
                for j in range(SB // ts):
                    xt_ref[t * CS : (t + 1) * CS, j * ts : (j + 1) * ts] = src[
                        :, hs + s + so + j * ts : hs + s + so + (j + 1) * ts
                    ]
            subs.append(
                jax.lax.dot_general(
                    q_ref[:],
                    xt_ref[:],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        y = subs[0] if len(subs) == 1 else jnp.concatenate(subs, axis=1)
        y = y + bias_ref[:]
        y = jnp.where(_valid_mask(base, P, core, Ws, W, CHUNK), y, 0.0)
        if out_relu:
            y = jnp.maximum(y, 0.0)
        out_ref[:] = y.astype(out_ref.dtype)

    _stream_blocks(src_hbm, xwin, sem, P, CHUNK, hs, compute, out_ref)


def _sep_fused_kernel(
    src_hbm,    # (CS, L) RAW source state in HBM
    dwk1_ref, pw1_ref, b1_ref,   # stage-1 folded weights
    dwk2_ref, pw2_ref, b2_ref,   # stage-2 folded weights
    out_ref,    # block (OS, CHUNK)
    xwin,       # scratch (2, CS, CHUNK + 2*hs)
    sem,        # DMA semaphores (2,)
    mid_ref,    # scratch (CS, CHUNK + 2*E2) bf16/out-dtype intermediate
    acc_sc,     # scratch (CS, CHUNK + 2*E2) f32 tap accumulator (both stages)
    *,
    shifts: Tuple[int, ...],
    hs: int,
    E2: int,    # stage-2 tap reach, 128-aligned
    P: int,
    core: int,
    Ws: int,
    W: int,
):
    """Both SepConv stages in ONE kernel (halo recompute): stage 1 is
    evaluated on the extended region [base-E2, base+CHUNK+E2) so stage 2
    never reads the intermediate from HBM. mid is masked, ReLU'd, and cast
    to the out dtype in-register — numerically identical to the two-pass
    path that writes/rereads a bf16 state."""
    CHUNK = out_ref.shape[1]
    M = mid_ref.shape[1]
    base = pl.program_id(0) * CHUNK

    def compute(win):
        s = jnp.maximum(win[:], 0)
        _acc_taps(acc_sc, s, shifts, dwk1_ref, hs - E2, M)
        y1 = jax.lax.dot_general(
            pw1_ref[:], acc_sc[:].astype(out_ref.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        y1 = y1 + b1_ref[:]
        y1 = jnp.where(_valid_mask_ext(base - E2, P, core, Ws, W, M), y1, 0.0)
        mid_ref[:] = jnp.maximum(y1, 0.0).astype(out_ref.dtype)

        _acc_taps(acc_sc, mid_ref, shifts, dwk2_ref, E2, CHUNK)
        y = jax.lax.dot_general(
            pw2_ref[:], acc_sc[:, :CHUNK].astype(out_ref.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        y = y + b2_ref[:]
        y = jnp.where(_valid_mask(base, P, core, Ws, W, CHUNK), y, 0.0)
        out_ref[:] = y.astype(out_ref.dtype)

    _stream_blocks(src_hbm, xwin, sem, P, CHUNK, hs, compute, out_ref)


def sep_fused(
    src: jnp.ndarray,          # (CS, L) RAW source
    w1, w2,                    # (dwk, pw, bias) tuples from sep_stage_weights
    shifts: Tuple[int, ...],
    spec: FlatSpec,
    interpret: Optional[bool] = None,
):
    """Fused two-stage SepConv; returns None if the spec's halo budget
    cannot cover the recompute reach (caller falls back to two passes)."""
    smax = max(max(shifts), -min(shifts), 0)
    E2, hs = sep_fused_halo(shifts, spec.P)
    if hs < smax + E2:
        return None
    dwk1, pw1, b1 = w1
    dwk2, pw2, b2 = w2
    kernel = functools.partial(
        _sep_fused_kernel,
        shifts=shifts,
        hs=hs,
        E2=E2,
        P=spec.P,
        core=spec.core,
        Ws=spec.Ws,
        W=spec.W,
    )
    if interpret is None:
        interpret = default_interpret()
    os_ = pw2.shape[0]
    return pl.pallas_call(
        kernel,
        grid=(spec.L // spec.chunk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((os_, spec.chunk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((os_, spec.L), src.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, src.shape[0], spec.chunk + 2 * hs), src.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((pw1.shape[0], spec.chunk + 2 * E2), src.dtype),
            pltpu.VMEM((src.shape[0], spec.chunk + 2 * E2), jnp.float32),
        ],
        interpret=interpret,
    )(src, dwk1, pw1.astype(src.dtype), b1, dwk2, pw2.astype(src.dtype), b2)



def default_interpret() -> bool:
    """Pallas interpret mode off-TPU (tests on CPU exercise real numerics)."""
    return jax.default_backend() != "tpu"


def _run_stage(
    kernel,
    src: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    os_: int,
    hs: int,
    spec: FlatSpec,
    scratch_shapes,
    interpret: Optional[bool],
):
    if interpret is None:
        interpret = default_interpret()
    grid = (spec.L // spec.chunk,)
    cs = src.shape[0]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=pl.BlockSpec((os_, spec.chunk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((os_, spec.L), src.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, cs, spec.chunk + 2 * hs), src.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        + scratch_shapes,
        interpret=interpret,
    )(src, *weights)


def sep_stage(
    src: jnp.ndarray,          # (CS, L) pre-ReLU'd source
    dwk: jnp.ndarray,          # (CS, ntaps) f32
    pw: jnp.ndarray,           # (OS, CS) src-dtype, BN scale folded
    bias: jnp.ndarray,         # (OS, 1) f32
    shifts: Tuple[int, ...],
    spec: FlatSpec,
    out_relu: bool,
    interpret: Optional[bool] = None,
    in_relu: bool = True,
) -> jnp.ndarray:
    hs = stage_halo(shifts, spec.P)
    kernel = functools.partial(
        _sep_stage_kernel,
        shifts=shifts,
        hs=hs,
        P=spec.P,
        core=spec.core,
        Ws=spec.Ws,
        W=spec.W,
        out_relu=out_relu,
        in_relu=in_relu,
    )
    return _run_stage(
        kernel, src, (dwk, pw.astype(src.dtype), bias), pw.shape[0], hs,
        spec, [pltpu.VMEM((src.shape[0], spec.chunk), jnp.float32)], interpret,
    )


def dense_stage(
    src: jnp.ndarray,          # (CS, L) pre-ReLU'd source
    q: jnp.ndarray,            # (OS, ntaps*CS) src-dtype, BN scale folded
    bias: jnp.ndarray,         # (OS, 1) f32
    shifts: Tuple[int, ...],
    spec: FlatSpec,
    out_relu: bool = False,
    interpret: Optional[bool] = None,
    in_relu: bool = True,
) -> jnp.ndarray:
    cs = src.shape[0]
    hs = stage_halo(shifts, spec.P)
    SB = _pick_sb(cs, spec.chunk)
    kernel = functools.partial(
        _dense_stage_kernel,
        shifts=shifts,
        hs=hs,
        P=spec.P,
        core=spec.core,
        Ws=spec.Ws,
        W=spec.W,
        out_relu=out_relu,
        in_relu=in_relu,
        SB=SB,
    )
    return _run_stage(
        kernel, src, (q.astype(src.dtype), bias), q.shape[0], hs, spec,
        [pltpu.VMEM((len(shifts) * cs, SB), src.dtype)], interpret,
    )


# ----------------------------------------------------- fused block kernel
#
# One pallas_call per DAG *block*: both selected edges (sep/dil/skip) are
# evaluated from their own HBM source windows and summed in f32 in-register
# — the XLA block-sum (2 reads + 1 write of a full state per block) and the
# per-edge output round-trips disappear. Pools (and halo-starved specs)
# fall back to the per-op path for that block.

_EDGE_KINDS = {
    "sep_conv_3x3": ("sep", 3, 1),
    "sep_conv_5x5": ("sep", 5, 1),
    "dil_conv_3x3": ("dil", 3, 2),
    "dil_conv_5x5": ("dil", 5, 2),
    "skip_connect": ("skip", 0, 0),
}


def _edge_plan(name: str, spec: FlatSpec):
    """(kind, shifts, hs, E2) for one fused-block edge; None when the
    primitive cannot run in the block kernel (pools / clamped halos)."""
    if name not in _EDGE_KINDS:
        return None
    kind, k, dil = _EDGE_KINDS[name]
    if kind == "skip":
        return ("skip", (), min(512, spec.P), 0)
    shifts = tuple(
        dh * spec.Ws + dw for dh, dw in op_taps(kind, k, dilation=dil)
    )
    smax = max(max(shifts), -min(shifts), 0)
    if kind == "sep":
        E2, hs = sep_fused_halo(shifts, spec.P)
        if hs < smax + E2:
            return None
        return ("sep", shifts, hs, E2)
    hs = stage_halo(shifts, spec.P)
    if hs < smax:
        return None
    return ("dil", shifts, hs, 0)


def _block_kernel(
    *refs,
    plans: Tuple,            # per edge: (kind, shifts, hs, E2)
    nw: Tuple[int, ...],     # weight-ref count per edge
    P: int,
    core: int,
    Ws: int,
    W: int,
    SB: int,                 # dil im2col sub-chunk
):
    n = len(plans)
    srcs = refs[:n]
    w_off = n
    out_ref = refs[n + sum(nw)]
    scr = list(refs[n + sum(nw) + 1 :])
    xwins = scr[:n]
    sem = scr[n]
    scr = scr[n + 1 :]
    mids = {}
    for e, (kind, _, _, _) in enumerate(plans):
        if kind == "sep":
            mids[e] = scr.pop(0)
    xt = scr.pop(0) if any(p[0] == "dil" for p in plans) else None
    acc_sc = scr.pop(0) if any(p[0] != "skip" for p in plans) else None

    CHUNK = out_ref.shape[1]
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    pb = P // CHUNK
    in_core = jnp.logical_and(i >= pb, i < nblk - pb)
    base = i * CHUNK

    def dma(e, j, slot):
        hs = plans[e][2]
        # see _window_dma: Mosaic needs the lane offset provably 128-aligned
        start = pl.multiple_of(
            j * CHUNK - hs, math.gcd(CHUNK, hs) if hs else CHUNK
        )
        return pltpu.make_async_copy(
            srcs[e].at[:, pl.ds(start, xwins[e].shape[2])],
            xwins[e].at[slot],
            sem.at[slot, e],
        )

    @pl.when(i == pb)
    def _():
        for e in range(n):
            dma(e, i, i % 2).start()

    @pl.when(jnp.logical_and(in_core, i + 1 < nblk - pb))
    def _():
        for e in range(n):
            dma(e, i + 1, (i + 1) % 2).start()

    @pl.when(jnp.logical_not(in_core))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(in_core)
    def _():
        for e in range(n):
            dma(e, i, i % 2).wait()
        acc = jnp.zeros((out_ref.shape[0], CHUNK), jnp.float32)
        woff = w_off
        for e, (kind, shifts, hs, E2) in enumerate(plans):
            win = xwins[e][i % 2]
            w = refs[woff : woff + nw[e]]
            woff += nw[e]
            if kind == "skip":
                acc = acc + win[:, hs : hs + CHUNK].astype(jnp.float32)
                continue
            if kind == "sep":
                dwk1, pw1, b1, dwk2, pw2, b2 = w
                s = jnp.maximum(win[:], 0)
                M = mids[e].shape[1]
                _acc_taps(acc_sc, s, shifts, dwk1, hs - E2, M)
                y1 = jax.lax.dot_general(
                    pw1[:], acc_sc[:, :M].astype(out_ref.dtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + b1[:]
                y1 = jnp.where(
                    _valid_mask_ext(base - E2, P, core, Ws, W, M), y1, 0.0
                )
                mids[e][:] = jnp.maximum(y1, 0.0).astype(out_ref.dtype)
                _acc_taps(acc_sc, mids[e], shifts, dwk2, E2, CHUNK)
                acc = acc + jax.lax.dot_general(
                    pw2[:], acc_sc[:, :CHUNK].astype(out_ref.dtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + b2[:]
                continue
            # dil: dense conv, im2col per SB sub-chunk (bounded scratch),
            # sub-tiled stores (see _TS note)
            q, b = w
            s = jnp.maximum(win[:], 0)
            CS = win.shape[0]
            ntaps = len(shifts)
            ts = math.gcd(SB, _tap_ts(CS))
            subs = []
            for sub in range(CHUNK // SB):
                so = sub * SB
                for t, sh in enumerate(shifts):
                    for j in range(SB // ts):
                        xt[t * CS : (t + 1) * CS, j * ts : (j + 1) * ts] = s[
                            :, hs + sh + so + j * ts : hs + sh + so + (j + 1) * ts
                        ]
                subs.append(
                    jax.lax.dot_general(
                        q[:], xt[: ntaps * CS, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    + b[:]
                )
            acc = acc + (
                subs[0] if len(subs) == 1 else jnp.concatenate(subs, axis=1)
            )
        acc = jnp.where(_valid_mask(base, P, core, Ws, W, CHUNK), acc, 0.0)
        out_ref[:] = acc.astype(out_ref.dtype)


# Scoped-VMEM ceiling the self-budgets target = the hardware limit. The
# stack model below consistently OVERestimates the measured footprint by
# ~0.5-1 MB (probe-calibrated: scripts/probe_cell_kernel_vmem.py vs the
# Mosaic 'Scoped allocation' sizes), so the hardware number needs no extra
# margin — shaving it only demotes hot blocks that in fact fit.
_VMEM_LIMIT = 16 * 2**20


def _stack_model(cs: int, chunk: int, plans, eb: int = 2) -> int:
    """Conservative bytes of Mosaic stack temporaries for one block/stage
    kernel compute: full-width single temporaries are counted once; per-tap
    chains are bounded by the _TS sub-tiling (assumed not reused).
    ``eb`` = element bytes of the state dtype (2 bf16 / 4 f32)."""
    stack = 3 * cs * chunk * 4  # SSA acc copies + final mask/cast
    for kind, shifts, hs, E2 in plans:
        win = cs * (chunk + 2 * hs) * eb  # relu'd window copy
        if kind == "sep":
            M = chunk + 2 * E2
            # tap chains are bounded by the _tap_ts sub-tiling; full-width
            # singles (dot in/out, mask, cast) measure as ~one live f32 +
            # one state-dtype copy (Mosaic reuses them — probe-calibrated)
            stack += win + len(shifts) * cs * _tap_ts(cs) * 4 + (4 + eb) * cs * M
        elif kind == "dil":
            stack += win + 8 * cs * chunk
        else:
            stack += cs * chunk * 4
    return stack


def block_budget_bytes(cs: int, dtype, spec: FlatSpec, plans) -> int:
    """Modeled scoped-VMEM bytes of one fused block kernel: DMA windows,
    mid/im2col/accumulator scratch, double-buffered out, and the stack
    model. Exposed for the engagement regression test."""
    eb = jnp.dtype(dtype).itemsize
    chunk = spec.chunk
    SB = _pick_sb(cs, chunk)
    budget = sum(2 * cs * (chunk + 2 * p[2]) * eb for p in plans)  # windows
    for plan in plans:
        if plan[0] == "sep":
            budget += cs * (chunk + 2 * plan[3]) * eb  # mid
    if any(p[0] == "dil" for p in plans):
        max_taps = max(len(p[1]) for p in plans if p[0] == "dil")
        budget += max_taps * cs * SB * eb  # im2col
    maxw = max([chunk] + [chunk + 2 * p[3] for p in plans if p[0] == "sep"])
    if any(p[0] != "skip" for p in plans):
        budget += cs * maxw * 4  # f32 tap accumulator
    budget += 2 * cs * chunk * eb  # double-buffered out block
    budget += _stack_model(cs, chunk, plans, eb)
    return budget


def _edge_weights(name: str, variables):
    if name == "skip_connect":
        return ()
    p = variables["params"]
    st = variables["batch_stats"]
    if name.startswith("sep"):
        w1 = sep_stage_weights(
            p["dw1"]["kernel"], p["pw1"]["kernel"],
            p["bn1"]["scale"], p["bn1"]["bias"],
            st["bn1"]["mean"], st["bn1"]["var"],
        )
        w2 = sep_stage_weights(
            p["dw2"]["kernel"], p["pw2"]["kernel"],
            p["bn2"]["scale"], p["bn2"]["bias"],
            st["bn2"]["mean"], st["bn2"]["var"],
        )
        return w1 + w2
    if name.startswith("dil"):
        return dense_stage_weights(
            p["conv"]["kernel"],
            p["bn"]["scale"], p["bn"]["bias"],
            st["bn"]["mean"], st["bn"]["var"],
        )
    return ()


def block_stage(
    edges,                     # [(src (CS,L), name, variables), ...] 1..2
    spec: FlatSpec,
    interpret: Optional[bool] = None,
):
    """Fused evaluation of one block's edges + their sum; None on fallback."""
    plans = []
    for _, name, _ in edges:
        plan = _edge_plan(name, spec)
        if plan is None:
            return None
        plans.append(plan)
    if interpret is None:
        interpret = default_interpret()

    srcs = [e[0] for e in edges]
    cs = srcs[0].shape[0]
    dtype = srcs[0].dtype
    weights, nw = [], []
    for (_, name, v), plan in zip(edges, plans):
        w = _edge_weights(name, v)
        if plan[0] == "sep":
            w = (w[0], w[1].astype(dtype), w[2], w[3], w[4].astype(dtype), w[5])
        elif plan[0] == "dil":
            w = (w[0].astype(dtype), w[1])
        nw.append(len(w))
        weights.extend(w)

    SB = _pick_sb(cs, spec.chunk)
    # Interpret mode is a CPU simulator — no scoped-VMEM constraint; skip
    # the budget so parity tests exercise the fused path at any dtype/size.
    if not interpret and block_budget_bytes(cs, dtype, spec, plans) > _VMEM_LIMIT:
        return None
    scratch = [
        pltpu.VMEM((2, cs, spec.chunk + 2 * plan[2]), dtype) for plan in plans
    ]
    scratch.append(pltpu.SemaphoreType.DMA((2, len(plans))))
    for plan in plans:
        if plan[0] == "sep":
            scratch.append(
                pltpu.VMEM((cs, spec.chunk + 2 * plan[3]), dtype)
            )
    if any(p[0] == "dil" for p in plans):
        max_taps = max(len(p[1]) for p in plans if p[0] == "dil")
        scratch.append(pltpu.VMEM((max_taps * cs, SB), dtype))
    maxw = max(
        [spec.chunk] + [spec.chunk + 2 * p[3] for p in plans if p[0] == "sep"]
    )
    if any(p[0] != "skip" for p in plans):
        scratch.append(pltpu.VMEM((cs, maxw), jnp.float32))

    kernel = functools.partial(
        _block_kernel,
        plans=tuple(plans),
        nw=tuple(nw),
        P=spec.P,
        core=spec.core,
        Ws=spec.Ws,
        W=spec.W,
        SB=SB,
    )
    return pl.pallas_call(
        kernel,
        grid=(spec.L // spec.chunk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * len(srcs)
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=pl.BlockSpec((cs, spec.chunk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((cs, spec.L), dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*srcs, *weights)



# ------------------------------------------------------- weight folding


def _pad2(a: jnp.ndarray, rows: int, cols: int) -> jnp.ndarray:
    return jnp.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))


def sep_stage_weights(dw_k, pw_k, bn_scale, bn_bias, bn_mean, bn_var):
    """Fold one dw+pw+BN stage: returns (dwk (CS, ntaps), pw (OS, CS),
    bias (OS, 1)). dw_k: (k, k, 1, C) flax depthwise kernel; pw_k:
    (1, 1, C, O)."""
    k, _, _, c = dw_k.shape
    o = pw_k.shape[-1]
    cs, os_ = pad_channels(c), pad_channels(o)
    s, b = fold_bn(bn_scale, bn_bias, bn_mean, bn_var)
    dwk = dw_k[:, :, 0, :].reshape(k * k, c).T.astype(jnp.float32)  # (C, taps)
    pw = (pw_k[0, 0] * s[None, :]).T  # (O, C) with scale folded
    return (
        _pad2(dwk, cs, k * k),
        _pad2(pw, os_, cs),
        _pad2(b.astype(jnp.float32)[:, None], os_, 1),
    )


def dense_stage_weights(conv_k, bn_scale, bn_bias, bn_mean, bn_var):
    """Fold one dense conv+BN stage: conv_k (k, k, Cin, O) -> (Q (OS,
    ntaps*CS), bias (OS, 1))."""
    k, _, c, o = conv_k.shape
    cs, os_ = pad_channels(c), pad_channels(o)
    s, b = fold_bn(bn_scale, bn_bias, bn_mean, bn_var)
    w = conv_k * s[None, None, None, :]          # (k, k, C, O)
    w = w.transpose(3, 0, 1, 2)                  # (O, k, k, C)
    w = jnp.pad(w, ((0, os_ - o), (0, 0), (0, 0), (0, cs - c)))
    q = w.reshape(os_, k * k * cs)
    return q, _pad2(b.astype(jnp.float32)[:, None], os_, 1)


# ----------------------------------------------------------- DAG runner


def _xla_op_fallback(name: str, variables, src, spec):
    """Run one primitive as its XLA NHWC module on a flat state (last-resort
    path when no Pallas stage fits the scoped-VMEM budget)."""
    from ..ops.primitives import OPS

    p = variables["params"]
    if name.startswith("sep"):
        c_in = p["dw1"]["kernel"].shape[-1]
        c_out = p["pw2"]["kernel"].shape[-1]
    else:
        c_in = p["conv"]["kernel"].shape[2]
        c_out = p["conv"]["kernel"].shape[-1]
    x = from_flat(src, c_in, spec)
    dtype = None if src.dtype == jnp.float32 else src.dtype
    op = OPS[name](c_out, 1, dtype=dtype)
    return to_flat(op.apply(variables, x, False), spec)


def _stage_fits(cs, os_, spec, plans, eb: int = 2) -> bool:
    """Scoped-VMEM fit check for ONE standalone stage kernel (same model as
    block_stage's, with the stage's own scratch)."""
    chunk = spec.chunk
    budget = 2 * os_ * chunk * eb  # double-buffered out
    for kind, shifts, hs, E2 in plans:
        budget += 2 * cs * (chunk + 2 * hs) * eb  # window
        if kind == "sep":
            M = chunk + 2 * E2
            budget += cs * M * eb + cs * M * 4  # mid + f32 acc scratch
        elif kind == "sep1":  # single sep_stage pass: f32 acc at CHUNK
            budget += cs * chunk * 4
        elif kind == "dil":
            budget += len(shifts) * cs * _pick_sb(cs, chunk) * eb  # im2col
    budget += _stack_model(cs, chunk, [p for p in plans if p[0] != "sep1"], eb)
    for kind, shifts, hs, E2 in plans:
        if kind == "sep1":
            budget += (
                cs * (chunk + 2 * hs) * eb
                + len(shifts) * cs * _tap_ts(cs) * 4
                + (4 + eb) * cs * chunk
            )
    return budget <= _VMEM_LIMIT


def _apply_conv_op(name: str, variables, src, spec, interpret):
    """One primitive op on a flat RAW (pre-ReLU) state; the leading ReLU of
    the primitive is folded into the first stage's kernel (in_relu).
    Degrades: fused two-stage sep -> two passes -> XLA NHWC op, whichever
    first fits the scoped-VMEM budget."""
    p = variables["params"]
    st = variables["batch_stats"]
    cs = src.shape[0]
    eb = jnp.dtype(src.dtype).itemsize
    if interpret is None:
        interpret = default_interpret()

    def fits(os_, plans):
        # interpret mode is a CPU simulator: no scoped-VMEM constraint
        return interpret or _stage_fits(cs, os_, spec, plans, eb)

    if name in ("sep_conv_3x3", "sep_conv_5x5"):
        k = 3 if name.endswith("3x3") else 5
        shifts = tuple(dh * spec.Ws + dw for dh, dw in op_taps("sep", k))
        w1 = sep_stage_weights(
            p["dw1"]["kernel"], p["pw1"]["kernel"],
            p["bn1"]["scale"], p["bn1"]["bias"],
            st["bn1"]["mean"], st["bn1"]["var"],
        )
        w2 = sep_stage_weights(
            p["dw2"]["kernel"], p["pw2"]["kernel"],
            p["bn2"]["scale"], p["bn2"]["bias"],
            st["bn2"]["mean"], st["bn2"]["var"],
        )
        plan = _edge_plan(name, spec)
        if plan is not None and fits(w2[1].shape[0], [plan]):
            fused = sep_fused(src, w1, w2, shifts, spec, interpret)
            if fused is not None:
                return fused
        # halo/VMEM budget too small for the fused recompute: two passes
        hs1 = stage_halo(shifts, spec.P)
        if hs1 >= max(max(shifts), -min(shifts), 0) and fits(
            w2[1].shape[0], [("sep1", shifts, hs1, 0)]
        ):
            mid = sep_stage(src, *w1, shifts, spec, True, interpret)
            return sep_stage(
                mid, *w2, shifts, spec, False, interpret, in_relu=False
            )
        return _xla_op_fallback(name, variables, src, spec)
    if name in ("dil_conv_3x3", "dil_conv_5x5"):
        k = 3 if name.endswith("3x3") else 5
        shifts = tuple(
            dh * spec.Ws + dw for dh, dw in op_taps("dil", k, dilation=2)
        )
        q, b = dense_stage_weights(
            p["conv"]["kernel"],
            p["bn"]["scale"], p["bn"]["bias"],
            st["bn"]["mean"], st["bn"]["var"],
        )
        hs1 = stage_halo(shifts, spec.P)
        if hs1 >= max(max(shifts), -min(shifts), 0) and fits(
            q.shape[0], [("dil", shifts, hs1, 0)]
        ):
            return dense_stage(src, q, b, shifts, spec, False, interpret)
        return _xla_op_fallback(name, variables, src, spec)
    raise NotImplementedError(name)


def run_dag_flat(
    s0: jnp.ndarray,            # (CS, L) flat, raw (pre-ReLU)
    s1: jnp.ndarray,
    assignment: Tuple[Tuple[int, int], ...],   # (edge, op) sorted by edge
    B: int,
    op_variables: Sequence,     # per selected edge, ascending edge order
    primitives: Sequence[str],
    spec: FlatSpec,
    interpret: Optional[bool] = None,
):
    """Execute the block DAG in flat layout; returns the B block states.

    Each block runs as ONE fused pallas_call (both edges + their f32 sum —
    block_stage); blocks with pools, none-only edges, or halo-starved specs
    fall back to per-op fused stages + an XLA sum (pools convert through
    NHWC for exact edge semantics).
    """
    selected = dict(assignment)
    states = [s0, s1]

    op_i = 0
    offset = 0
    for _ in range(B):
        rows = []  # (state_idx, name, variables) per selected edge
        for j in range(len(states)):
            if (offset + j) in selected:
                rows.append(
                    (j, primitives[selected[offset + j]], op_variables[op_i])
                )
                op_i += 1

        active = [
            (states[j], name, v) for j, name, v in rows if name != "none"
        ]
        fused = (
            block_stage(active, spec, interpret) if active else None
        )
        if fused is not None:
            states.append(fused)
            offset += len(states) - 1
            continue

        outs = []
        for j, name, v in rows:
            if name == "none":
                outs.append(jnp.zeros_like(states[j]))
            elif name == "skip_connect":
                outs.append(states[j])
            elif name in ("max_pool_3x3", "avg_pool_3x3"):
                from ..ops.primitives import avg_pool_3x3, max_pool_3x3

                c = states[j].shape[0]
                x = from_flat(states[j], c, spec)
                pooled = (
                    max_pool_3x3(x, 1) if name.startswith("max")
                    else avg_pool_3x3(x, 1)
                )
                outs.append(to_flat(pooled, spec))
            else:
                outs.append(
                    _apply_conv_op(name, v, states[j], spec, interpret)
                )
        states.append(sum(outs) if outs else jnp.zeros_like(s0))
        offset += len(states) - 1
    return states[2:]


def concat_from_flat(blocks: Sequence[jnp.ndarray], C: int, spec: FlatSpec):
    """Concat B flat block states channel-wise -> (1, H, W, B*C) NHWC."""
    return jnp.concatenate([from_flat(b, C, spec) for b in blocks], axis=-1)
