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
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stems import fold_bn


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


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


def _valid_mask(base, P, core, Ws, W, CHUNK):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    g = base - P + lane
    return jnp.logical_and(g < core, jax.lax.rem(g, Ws) < W)


def _sep_stage_kernel(
    src_ref,    # (CS, L) source state, already ReLU'd, zeros in pads
    dwk_ref,    # (CS, ntaps) f32 depthwise tap weights (zero pad rows)
    pw_ref,     # (OS, CS) pointwise kernel with BN scale folded
    bias_ref,   # (OS, 1) f32 folded BN bias (zero pad rows)
    out_ref,    # block (OS, CHUNK)
    *,
    shifts: Tuple[int, ...],
    P: int,
    core: int,
    Ws: int,
    W: int,
    out_relu: bool,
):
    CHUNK = out_ref.shape[1]
    base = pl.program_id(0) * CHUNK
    in_core = jnp.logical_and(base >= P, base < pl.num_programs(0) * CHUNK - P)

    @pl.when(jnp.logical_not(in_core))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(in_core)
    def _():
        acc = jnp.zeros((src_ref.shape[0], CHUNK), jnp.float32)
        for t, s in enumerate(shifts):
            seg = src_ref[:, pl.ds(base + s, CHUNK)]
            acc = acc + seg.astype(jnp.float32) * dwk_ref[:, t : t + 1]
        y = jax.lax.dot_general(
            pw_ref[:],
            acc.astype(src_ref.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = y + bias_ref[:]
        y = jnp.where(_valid_mask(base, P, core, Ws, W, CHUNK), y, 0.0)
        if out_relu:
            y = jnp.maximum(y, 0.0)
        out_ref[:] = y.astype(out_ref.dtype)


def _dense_stage_kernel(
    src_ref,    # (CS, L)
    q_ref,      # (OS, ntaps*CS) kernel (BN scale folded)
    bias_ref,   # (OS, 1)
    out_ref,    # block (OS, CHUNK)
    xt_ref,     # scratch (ntaps*CS, CHUNK)
    *,
    shifts: Tuple[int, ...],
    P: int,
    core: int,
    Ws: int,
    W: int,
    out_relu: bool,
):
    CHUNK = out_ref.shape[1]
    CS = src_ref.shape[0]
    base = pl.program_id(0) * CHUNK
    nblk = pl.num_programs(0)
    in_core = jnp.logical_and(base >= P, base < nblk * CHUNK - P)

    @pl.when(jnp.logical_not(in_core))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(in_core)
    def _():
        for t, s in enumerate(shifts):
            xt_ref[t * CS : (t + 1) * CS, :] = src_ref[:, pl.ds(base + s, CHUNK)]
        y = jax.lax.dot_general(
            q_ref[:],
            xt_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = y + bias_ref[:]
        y = jnp.where(_valid_mask(base, P, core, Ws, W, CHUNK), y, 0.0)
        if out_relu:
            y = jnp.maximum(y, 0.0)
        out_ref[:] = y.astype(out_ref.dtype)


def default_interpret() -> bool:
    """Pallas interpret mode off-TPU (tests on CPU exercise real numerics)."""
    return jax.default_backend() != "tpu"


def _run_stage(
    kernel,
    src: jnp.ndarray,
    weights: Sequence[jnp.ndarray],
    os_: int,
    spec: FlatSpec,
    scratch_shapes,
    interpret: Optional[bool],
):
    if interpret is None:
        interpret = default_interpret()
    grid = (spec.L // spec.chunk,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(weights)),
        out_specs=pl.BlockSpec((os_, spec.chunk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((os_, spec.L), src.dtype),
        scratch_shapes=scratch_shapes,
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
) -> jnp.ndarray:
    kernel = functools.partial(
        _sep_stage_kernel,
        shifts=shifts,
        P=spec.P,
        core=spec.core,
        Ws=spec.Ws,
        W=spec.W,
        out_relu=out_relu,
    )
    return _run_stage(
        kernel, src, (dwk, pw.astype(src.dtype), bias), pw.shape[0], spec,
        [], interpret,
    )


def dense_stage(
    src: jnp.ndarray,          # (CS, L) pre-ReLU'd source
    q: jnp.ndarray,            # (OS, ntaps*CS) src-dtype, BN scale folded
    bias: jnp.ndarray,         # (OS, 1) f32
    shifts: Tuple[int, ...],
    spec: FlatSpec,
    out_relu: bool = False,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    cs = src.shape[0]
    kernel = functools.partial(
        _dense_stage_kernel,
        shifts=shifts,
        P=spec.P,
        core=spec.core,
        Ws=spec.Ws,
        W=spec.W,
        out_relu=out_relu,
    )
    return _run_stage(
        kernel, src, (q.astype(src.dtype), bias), q.shape[0], spec,
        [pltpu.VMEM((len(shifts) * cs, spec.chunk), src.dtype)], interpret,
    )


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


def _apply_conv_op(name: str, variables, src_relu, spec, interpret):
    """One primitive op on a flat, already-ReLU'd state."""
    p = variables["params"]
    st = variables["batch_stats"]
    if name in ("sep_conv_3x3", "sep_conv_5x5"):
        k = 3 if name.endswith("3x3") else 5
        shifts = tuple(dh * spec.Ws + dw for dh, dw in op_taps("sep", k))
        dwk1, pw1, b1 = sep_stage_weights(
            p["dw1"]["kernel"], p["pw1"]["kernel"],
            p["bn1"]["scale"], p["bn1"]["bias"],
            st["bn1"]["mean"], st["bn1"]["var"],
        )
        mid = sep_stage(src_relu, dwk1, pw1, b1, shifts, spec, True, interpret)
        dwk2, pw2, b2 = sep_stage_weights(
            p["dw2"]["kernel"], p["pw2"]["kernel"],
            p["bn2"]["scale"], p["bn2"]["bias"],
            st["bn2"]["mean"], st["bn2"]["var"],
        )
        return sep_stage(mid, dwk2, pw2, b2, shifts, spec, False, interpret)
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
        return dense_stage(src_relu, q, b, shifts, spec, False, interpret)
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

    Conv primitives run as fused Pallas stages; pools/skip/zero fall back
    to XLA (converting through NHWC for exact pool edge semantics).
    """
    selected = dict(assignment)
    states = [s0, s1]
    relu_cache: dict = {}

    def relu_of(idx):
        if idx not in relu_cache:
            relu_cache[idx] = jnp.maximum(states[idx], 0.0)
        return relu_cache[idx]

    op_i = 0
    offset = 0
    for _ in range(B):
        outs = []
        for j in range(len(states)):
            if (offset + j) not in selected:
                continue
            name = primitives[selected[offset + j]]
            v = op_variables[op_i]
            op_i += 1
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
                    _apply_conv_op(name, v, relu_of(j), spec, interpret)
                )
        states.append(sum(outs))
        offset += len(states) - 1
    return states[2:]


def concat_from_flat(blocks: Sequence[jnp.ndarray], C: int, spec: FlatSpec):
    """Concat B flat block states channel-wise -> (1, H, W, B*C) NHWC."""
    return jnp.concatenate([from_flat(b, C, spec) for b in blocks], axis=-1)
