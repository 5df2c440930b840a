"""Packed eval-mode execution of the fixed-cell block DAG.

The decoded cell (modeling/ADD.py:69-116) runs 10 genotype ops of C∈{40,80,
160} channels as ~24 separate conv stages, each using at most 40 of 128
vector lanes. This module re-schedules the DAG into *waves* of data-ready
ops and packs each wave's ops of a kind along the channel axis, cutting the
stage count ~2x and tripling lane occupancy.

MEASURED STATUS (v5e, flagship ADD, 1025x2049 b1, trace device time): the
all-exits forward is 19.9 ms packed vs 18.5 ms unpacked — XLA's in-graph
conv emitter already handles the C=40 stages well (per-stage times in-graph
are ~3x better than the same conv jitted standalone), and the packing
concat/slice glue slightly outweighs the launch savings; level-1 cells are
a wash, level-2 cells regress ~0.15 ms each. Kept as a tested, off-by-
default option (`DecodedNet(packed_eval=True)`): the schedule is the right
substrate for a future whole-cell Pallas kernel, and the dense-tap packing
(6-9 projections → one block-diagonal matmul) is structurally sound.
Two hard-won TPU lowering facts live here regardless:
  * feature_group_count ∈ (1, C) grouped convs are pathological (4-7x
    slower than dense block-diagonal) — see packed_dil;
  * pointwise stages must be expressed as 1x1 *convs*, not einsum/matmul —
    the matrix form forces relayout copies through the whole graph
    (measured +6 ms end-to-end).

The packing, per wave:

  * sep convs (3x3 and 5x5 together — the 3x3 depthwise kernels are
    zero-padded to 5x5): ONE grouped depthwise conv over G*C channels,
    then ONE block-diagonal 1x1 matmul with the eval BatchNorm folded into
    weights+bias, twice (the two sep stages);
  * dil convs (3x3 d2 padded to 5x5 d2 — the tap grids nest): ONE grouped
    conv with folded BN;
  * pools of a kind: ONE reduce_window over the concat;
  * skip_connect / none: free (no compute / dropped).

For the shipped genotype this turns 10 ops (~24 stages, max 40 lanes) into
6 packed ops (~14 stages, up to 120 lanes). Packing is exact up to bf16
rounding of the folded scales; training keeps the unpacked per-op modules
(per-op batch statistics, autodiff through BatchNorm).

Scheduling is static per genotype (host-side), so the XLA program is fully
unrolled — no dynamic control flow.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nas.genotypes import PRIMITIVES

# ---------------------------------------------------------------- schedule


def _block_edges(B: int) -> List[List[int]]:
    """Edge numbers per block: block i consumes edges offset..offset+1+i+1."""
    out, offset = [], 0
    for i in range(B):
        n_states = 2 + i
        out.append(list(range(offset, offset + n_states)))
        offset += n_states
    return out


def _kind(op_name: str) -> str:
    if op_name.startswith("sep_conv"):
        return "sep"
    if op_name.startswith("dil_conv"):
        return "dil"
    if op_name == "max_pool_3x3":
        return "max"
    if op_name == "avg_pool_3x3":
        return "avg"
    if op_name == "skip_connect":
        return "skip"
    return "zero"


def schedule_waves(assignment: Sequence[Tuple[int, int]], B: int):
    """Static wave schedule for a genotype.

    ``assignment``: ((edge, op_index) ...) sorted by edge — the cell's
    edge→op map (models/cell.py edge_op_assignment). Returns a list of
    waves; each wave is a list of groups; each group is
    ``(kind, k, [(block, state, module_idx, op_name), ...])`` where
    ``state`` indexes [s0, s1, b0, ...] and ``module_idx`` indexes the
    cell's sorted-edge op module list.
    """
    blocks = _block_edges(B)
    edge_to_block_state = {}
    for b, edges in enumerate(blocks):
        for j, e in enumerate(edges):
            edge_to_block_state[e] = (b, j)

    ops = []  # (block, state, module_idx, name)
    for idx, (edge, op_idx) in enumerate(assignment):
        b, s = edge_to_block_state[edge]
        ops.append((b, s, idx, PRIMITIVES[op_idx]))

    waves = []
    done = set()
    ready_states = {0, 1}
    block_ops = {b: [o for o in ops if o[0] == b] for b in range(B)}
    while len(done) < len(ops):
        wave_ops = [o for o in ops if o[2] not in done and o[1] in ready_states]
        assert wave_ops, "cyclic/unsatisfiable genotype schedule"
        groups: Dict[str, list] = {}
        for o in wave_ops:
            groups.setdefault(_kind(o[3]), []).append(o)
            done.add(o[2])
        wave = []
        for kind, members in groups.items():
            k = 5 if any("5x5" in m[3] for m in members) else 3
            wave.append((kind, k, members))
        waves.append(wave)
        for b in range(B):
            if (2 + b) not in ready_states and all(
                o[2] in done for o in block_ops[b]
            ):
                ready_states.add(2 + b)
    return waves


# ------------------------------------------------------------- bn folding


def fold_bn(params: dict, stats: dict, eps: float = 1e-5):
    """Eval BN as y = x*scale + bias (fp32)."""
    s = params["scale"] * jax.lax.rsqrt(stats["var"] + eps)
    return s, params["bias"] - stats["mean"] * s


def _pad_dw(kernel: jnp.ndarray, k_target: int) -> jnp.ndarray:
    """Zero-pad a (k,k,1,C) depthwise kernel to (kt,kt,1,C), centered.
    Exact for both plain taps and dilation-2 taps (the grids nest)."""
    k = kernel.shape[0]
    p = (k_target - k) // 2
    if p == 0:
        return kernel
    return jnp.pad(kernel, ((p, p), (p, p), (0, 0), (0, 0)))


def _dw(x, kernel, k, dilation: int = 1):
    """Grouped depthwise conv, explicit symmetric padding (PyTorch parity)."""
    pad = dilation * (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def _grouped_conv(x, kernel, k, groups: int, dilation: int = 1):
    pad = dilation * (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def _pw(x, w, bias, cdt):
    """Pointwise (1x1) conv + bias in compute dtype. Expressed as a conv so
    XLA keeps NHWC layouts end-to-end (einsum's matrix form forced relayout
    copies around every stage — measured +7 ms on the flagship forward)."""
    y = jax.lax.conv_general_dilated(
        x,
        w[None, None].astype(cdt),
        window_strides=(1, 1),
        padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return (y + bias.astype(cdt)).astype(cdt)


def _block_diag(mats: List[jnp.ndarray]) -> jnp.ndarray:
    """Block-diagonal (ΣC_in, ΣC_out) from per-op (C_in, C_out) matrices."""
    if len(mats) == 1:
        return mats[0]
    rows = sum(m.shape[0] for m in mats)
    cols = sum(m.shape[1] for m in mats)
    out = jnp.zeros((rows, cols), mats[0].dtype)
    r = c = 0
    for m in mats:
        out = jax.lax.dynamic_update_slice(out, m, (r, c))
        r += m.shape[0]
        c += m.shape[1]
    return out


# -------------------------------------------------------------- packed ops


def packed_sep(xs: List[jnp.ndarray], variables: List[dict], k: int, dtype):
    """G sep convs (mixed 3x3/5x5) over concat channels.

    Per op (ops/primitives.py SepConv): relu→dw(k)→pw→bn1→relu→dw(k)→pw→bn2.
    BNs fold into the pointwise weights/biases; pointwise stages are ONE
    block-diagonal matmul each.
    """
    cdt = dtype or xs[0].dtype
    dws1, dws2, pws1, pws2, bias1, bias2 = [], [], [], [], [], []
    for v in variables:
        p, st = v["params"], v["batch_stats"]
        s1, b1 = fold_bn(p["bn1"], st["bn1"])
        s2, b2 = fold_bn(p["bn2"], st["bn2"])
        dws1.append(_pad_dw(p["dw1"]["kernel"], k))
        dws2.append(_pad_dw(p["dw2"]["kernel"], k))
        pws1.append(p["pw1"]["kernel"][0, 0] * s1[None, :])
        pws2.append(p["pw2"]["kernel"][0, 0] * s2[None, :])
        bias1.append(b1)
        bias2.append(b2)

    x = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=-1)
    dw1 = jnp.concatenate(dws1, axis=-1).astype(cdt)
    dw2 = jnp.concatenate(dws2, axis=-1).astype(cdt)
    pw1 = _block_diag(pws1)
    pw2 = _block_diag(pws2)
    b1 = jnp.concatenate(bias1)
    b2 = jnp.concatenate(bias2)

    x = jax.nn.relu(x).astype(cdt)
    x = _dw(x, dw1, k)
    x = _pw(x, pw1, b1, cdt)
    x = jax.nn.relu(x)
    x = _dw(x, dw2, k)
    x = _pw(x, pw2, b2, cdt)
    return _split(x, [v["params"]["pw2"]["kernel"].shape[-1] for v in variables])


def packed_dil(xs: List[jnp.ndarray], variables: List[dict], k: int, dtype):
    """G dilated (d=2) full convs over concat channels as ONE dense conv
    with a block-diagonal kernel (ops/primitives.py DilConv: relu→conv(k,d2)
    →bn, BN folded).

    NOT a grouped conv: XLA's TPU lowering of feature_group_count∈(1, C) is
    pathological (measured 1.01 ms for G=2 C=80 at 129x257 vs 0.25 ms for
    the dense block-diagonal form — the zero blocks are free next to a 4x
    faster conv emitter path).
    """
    cdt = dtype or xs[0].dtype
    kernels, biases, outs = [], [], []
    for v in variables:
        p, st = v["params"], v["batch_stats"]
        s, b = fold_bn(p["bn"], st["bn"])
        kern = p["conv"]["kernel"] * s[None, None, None, :]
        kernels.append(_pad_dw(kern, k))  # same centered zero-pad, (k,k,Ci,Co)
        biases.append(b)
        outs.append(kern.shape[-1])

    x = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=-1)
    if len(kernels) == 1:
        kernel = kernels[0].astype(cdt)
    else:
        # (k, k, ΣCi, ΣCo) block-diagonal across the G ops
        rows = sum(kk.shape[2] for kk in kernels)
        cols = sum(kk.shape[3] for kk in kernels)
        kernel = jnp.zeros((k, k, rows, cols), kernels[0].dtype)
        r = c = 0
        for kk in kernels:
            kernel = jax.lax.dynamic_update_slice(kernel, kk, (0, 0, r, c))
            r += kk.shape[2]
            c += kk.shape[3]
        kernel = kernel.astype(cdt)
    bias = jnp.concatenate(biases)

    x = jax.nn.relu(x).astype(cdt)
    x = _grouped_conv(x, kernel, k, groups=1, dilation=2)
    x = (x + bias.astype(cdt)).astype(cdt)
    return _split(x, outs)


def packed_relu_conv_bn_1x1(
    xs: List[jnp.ndarray], variables: List[dict], dtype
) -> jnp.ndarray:
    """G independent ReLU→1x1 conv→BN stages (ops/primitives.py ReLUConvBN,
    kernel_size=1) over concat channels as ONE block-diagonal matmul with
    the eval BN folded in. Returns the still-concatenated result (callers
    that need per-op outputs can slice; the dense-tap fuse consumes the
    concat directly — ADD.py:47-52)."""
    cdt = dtype or xs[0].dtype
    mats, biases = [], []
    for v in variables:
        p, st = v["params"], v["batch_stats"]
        s, b = fold_bn(p["bn"], st["bn"])
        mats.append(p["conv"]["kernel"][0, 0] * s[None, :])
        biases.append(b)
    w = _block_diag(mats)
    bias = jnp.concatenate(biases)
    x = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=-1)
    x = jax.nn.relu(x).astype(cdt)
    return _pw(x, w, bias, cdt)


def packed_pool(xs: List[jnp.ndarray], kind: str):
    """G stride-1 3x3 pools over concat channels (ops/primitives.py Pool)."""
    x = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=-1)
    dims, strides = (1, 3, 3, 1), (1, 1, 1, 1)
    pad = [(0, 0), (1, 1), (1, 1), (0, 0)]
    if kind == "max":
        neg_inf = (
            -jnp.inf
            if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.iinfo(x.dtype).min
        )
        # literal init (not jnp.array): keeps the differentiable (max, -inf)
        # monoid recognizable under jit — see ops/primitives.max_pool_3x3
        y = jax.lax.reduce_window(x, neg_inf, jax.lax.max, dims, strides, pad)
    else:
        summed = jax.lax.reduce_window(
            x.astype(jnp.float32), 0.0, jax.lax.add, dims, strides, pad
        )
        ones = jnp.ones(x.shape[1:3], jnp.float32)[None, :, :, None]
        counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides, pad)
        y = (summed / counts).astype(x.dtype)
    return _split(y, [t.shape[-1] for t in xs])


def _split(x: jnp.ndarray, sizes: List[int]) -> List[jnp.ndarray]:
    if len(sizes) == 1:
        return [x]
    return jnp.split(x, np.cumsum(sizes)[:-1].tolist(), axis=-1)


# ----------------------------------------------------------------- driver


def run_packed_dag(
    s0: jnp.ndarray,
    s1: jnp.ndarray,
    waves,
    op_variables: List[Optional[dict]],
    B: int,
    dtype,
) -> List[jnp.ndarray]:
    """Execute the packed schedule; returns the B block outputs."""
    states = [s0, s1]
    contrib: Dict[int, list] = {b: [] for b in range(B)}
    produced = 2

    def settle():
        nonlocal produced
        # blocks complete in order; a block's state index is 2+b
        while produced - 2 < B:
            b = produced - 2
            expected = 2  # every decoded block sums exactly 2 edges
            if len(contrib[b]) == expected:
                states.append(sum(contrib[b]))
                produced += 1
            else:
                break

    for wave in waves:
        for kind, k, members in wave:
            xs = [states[m[1]] for m in members]
            if kind == "sep":
                outs = packed_sep(xs, [op_variables[m[2]] for m in members], k, dtype)
            elif kind == "dil":
                outs = packed_dil(xs, [op_variables[m[2]] for m in members], k, dtype)
            elif kind in ("max", "avg"):
                outs = packed_pool(xs, kind)
            elif kind == "skip":
                outs = xs
            else:  # zero: exact-zero contribution (Zero, stride 1)
                outs = [jnp.zeros_like(x) for x in xs]
            for m, y in zip(members, outs):
                contrib[m[0]].append(y)
        settle()

    assert produced - 2 == B, "unscheduled blocks remain"
    return states[2:]
