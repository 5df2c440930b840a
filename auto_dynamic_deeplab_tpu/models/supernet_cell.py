"""Search-time cells: MixedOp and the three-branch trellis cell.

References: modeling/cell_level_search.py (MixedOp :10-29, Cell :32-155) and
modeling/model_net_search.py Cell_fixed (:10-132). One op set per cell is
shared across the down/same/up branch DAGs (cell_level_search.py:144), and
all BNs inside search cells are affine=False.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nas.genotypes import PRIMITIVES
from ..ops.norm import BatchNorm
from ..ops.primitives import (
    OPS,
    DoubleFactorizedReduce,
    FactorizedReduce,
    ReLUConvBN,
)
from ..ops.resize import resize_bilinear, scale_dimension_search
from .cell import GenotypeRows, edge_op_assignment


class MixedOp(nn.Module):
    """Weighted sum over the 8 primitives (cell_level_search.py:10-29).

    The 'none' primitive contributes exactly zero (reference computes
    w * Zero(x) = 0), so it is skipped; pool primitives get a trailing
    affine-free BN as in the reference (:20-21).
    """

    C: int
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        kw = dict(affine=False, axis_name=self.axis_name, dtype=self.dtype)
        ops = []
        pool_bns = {}
        for i, prim in enumerate(PRIMITIVES):
            if prim == "none":
                ops.append(None)
                continue
            ops.append(OPS[prim](self.C, 1, **kw))
            if "pool" in prim:
                pool_bns[str(i)] = BatchNorm(
                    affine=False, axis_name=self.axis_name, dtype=self.dtype,
                    name=f"pool_bn_{i}",
                )
        self.ops = ops
        self.pool_bns = pool_bns

    def __call__(self, x: jnp.ndarray, weights: jnp.ndarray, train: bool) -> jnp.ndarray:
        if not train:
            # Eval runs ONLY the argmax op, unweighted (cell_level_search.py:
            # 24-29). One-hot weighting is numerically identical (weight 1.0
            # on the argmax op, 0 elsewhere; argmax=='none' → exact zero) and
            # keeps the program static for XLA.
            weights = jnp.zeros_like(weights).at[jnp.argmax(weights)].set(1.0)
        out = None
        for i, op in enumerate(self.ops):
            if op is None:
                continue
            y = op(x, train)
            if str(i) in self.pool_bns:
                y = self.pool_bns[str(i)](y, train)
            y = weights[i] * y
            out = y if out is None else out + y
        return out


# Edge-banked MixedOp: one module whose params carry a leading edge axis,
# applied to a stacked (E, N, H, W, C) batch of the E DAG states a block
# consumes. Numerically identical to E independent MixedOps (vmap maps BN
# batch statistics per lane, and each lane gets its own split init RNG) but
# traces each primitive ONCE per block instead of once per edge — the mixed
# supernet's lowered graph shrinks ~4x, which is what lets the 12-layer
# reference search config AOT-compile (model_search.py traces the same ops
# 2,640 times; its eager torch never pays that cost, XLA does).
BankedMixedOp = nn.vmap(
    MixedOp,
    in_axes=(0, 0, None),
    out_axes=0,
    variable_axes={"params": 0, "batch_stats": 0},
    split_rngs={"params": True},
)


class _ScanBlock(nn.Module):
    """One DAG block as a `lax.scan` body: a (B+2)-lane BankedMixedOp over
    the full state buffer, block output written at lane ``i + 2``.

    Lanes beyond the block's real 2+i edges carry all-zero mixing weights,
    so they contribute exactly zero in train mode (0 * y) AND in eval mode
    (argmax of zeros selects 'none' → exact zero) — padding needs no mask.
    """

    C: int
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, buf, xs, train):
        i, w = xs  # i: block index (traced), w: (B+2, 8) padded alpha rows
        outs = BankedMixedOp(
            C=self.C, axis_name=self.axis_name, dtype=self.dtype, name="bank"
        )(buf, w, train)
        new = jnp.sum(outs, axis=0).astype(buf.dtype)
        buf = jax.lax.dynamic_update_slice_in_dim(buf, new[None], i + 2, axis=0)
        return buf, None


def alpha_table(alphas: jnp.ndarray, B: int) -> jnp.ndarray:
    """(k, 8) per-edge mixing weights → (B, B+2, 8) per-block lane table,
    rows beyond a block's 2+i real edges zero-padded (see _ScanBlock)."""
    table = jnp.zeros((B, B + 2, alphas.shape[-1]), alphas.dtype)
    offset = 0
    for i in range(B):
        table = table.at[i, : 2 + i].set(alphas[offset : offset + 2 + i])
        offset += 2 + i
    return table


class TrellisCell(nn.Module):
    """One trellis cell with up to three input branches.

    Branch inputs (each optional, static presence): s1_down (resolution above,
    reduced 2x via FactorizedReduce preprocess), s1_same (1x1 preprocess),
    s1_up (resolution below, bilinear 2x + 1x1). prev_prev s0 is shared by
    all branches after ``pre_rate`` preprocessing (1 → 1x1, 0.5 → stride-2
    FactorizedReduce, 0.25 → stride-4 DoubleFactorizedReduce).

    cell_kind 'mixed' runs the full 8-way MixedOp DAG consuming ``alphas``;
    'fixed' runs the decoded genotype ops (Cell_fixed).
    """

    B: int
    C_out: int
    has_down: bool
    has_same: bool
    has_up: bool
    pre_rate: float = 1.0
    cell_kind: str = "mixed"
    genotype: Optional[GenotypeRows] = None
    # mixed-cell execution (same numerics, different traced-graph size):
    #   'edges'  — one MixedOp per edge (reference-shaped, largest graph)
    #   'banked' — one BankedMixedOp per block (edges vmapped, ~4x smaller)
    #   'scan'   — ONE lax.scan'd BankedMixedOp for the whole DAG (each
    #              primitive traced once per cell per branch, ~20x smaller;
    #              pays ~40% padded-lane compute — see _ScanBlock)
    mixed_exec: str = "edges"
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        kw = dict(affine=False, axis_name=self.axis_name, dtype=self.dtype)
        if self.has_down:
            self.preprocess_down = FactorizedReduce(features=self.C_out, **kw)
        if self.has_same:
            self.preprocess_same = ReLUConvBN(features=self.C_out, kernel_size=1, **kw)
        if self.has_up:
            self.preprocess_up = ReLUConvBN(features=self.C_out, kernel_size=1, **kw)

        if self.pre_rate >= 1:
            self.pre_preprocess = ReLUConvBN(features=self.C_out, kernel_size=1, **kw)
        elif self.pre_rate == 0.5:
            self.pre_preprocess = FactorizedReduce(features=self.C_out, **kw)
        elif self.pre_rate == 0.25:
            self.pre_preprocess = DoubleFactorizedReduce(features=self.C_out, **kw)
        else:
            raise ValueError(self.pre_rate)

        if self.cell_kind == "mixed":
            if self.mixed_exec == "scan":
                scan_cls = nn.scan(
                    _ScanBlock,
                    variable_axes={"params": 0, "batch_stats": 0},
                    split_rngs={"params": True},
                    in_axes=(0, nn.broadcast),
                    length=self.B,
                )
                self.ops = [scan_cls(
                    C=self.C_out, axis_name=self.axis_name, dtype=self.dtype,
                    name="blocks",
                )]
            elif self.mixed_exec == "banked":
                self.ops = [
                    BankedMixedOp(
                        C=self.C_out, axis_name=self.axis_name, dtype=self.dtype,
                        name=f"bank_{i}",
                    )
                    for i in range(self.B)
                ]
            elif self.mixed_exec == "edges":
                k = sum(2 + i for i in range(self.B))
                self.ops = [
                    MixedOp(
                        C=self.C_out, axis_name=self.axis_name, dtype=self.dtype,
                        name=f"mixed_{e}",
                    )
                    for e in range(k)
                ]
            else:
                raise ValueError(self.mixed_exec)
            self.assignment = None
        else:
            assert self.genotype is not None
            self.assignment = edge_op_assignment(self.genotype)
            self.ops = [
                OPS[PRIMITIVES[op]](self.C_out, 1, **kw) for _, op in self.assignment
            ]

    def _dag(self, s0, s1, alphas, train):
        selected = dict(self.assignment) if self.assignment is not None else None
        if selected is None and self.mixed_exec == "scan":
            # alphas arrives pre-tabled (B, B+2, 8) from the supernet.
            # The state buffer carries the POLICY compute dtype — exactly what
            # the edges/banked forms carry between blocks. (It was f32: under
            # a bf16 policy that both doubled the scan-stacked HBM footprint
            # at scale and made scan numerics diverge from the other forms.)
            B = self.B
            buf_dtype = self.dtype or jnp.float32
            buf = jnp.concatenate(
                [
                    jnp.stack([s0, s1], 0).astype(buf_dtype),
                    jnp.zeros((B,) + s0.shape, buf_dtype),
                ],
                axis=0,
            )
            idxs = jnp.arange(B, dtype=jnp.int32)
            buf, _ = self.ops[0](buf, (idxs, alphas), train)
            blocks = jnp.moveaxis(buf[2:], 0, -2)  # (N, H, W, B, C)
            return blocks.reshape(blocks.shape[:-2] + (-1,))

        states = [s0, s1]
        offset = 0
        op_iter = iter(self.ops) if selected is not None else None
        banked = selected is None and self.mixed_exec == "banked"
        for i in range(self.B):
            if banked:
                xs = jnp.stack(states, axis=0)  # (2+i, N, H, W, C)
                ws = alphas[offset : offset + len(states)]  # (2+i, 8)
                outs = self.ops[i](xs, ws, train)
                states.append(jnp.sum(outs, axis=0))
                offset += len(states) - 1
                continue
            block_inputs = []
            for j, h in enumerate(states):
                e = offset + j
                if selected is None:
                    block_inputs.append(self.ops[e](h, alphas[e], train))
                elif e in selected:
                    block_inputs.append(next(op_iter)(h, train))
            states.append(sum(block_inputs))
            offset += len(states) - 1
        return jnp.concatenate(states[-self.B :], axis=-1)

    def __call__(
        self,
        s0: jnp.ndarray,
        s1_down: Optional[jnp.ndarray],
        s1_same: Optional[jnp.ndarray],
        s1_up: Optional[jnp.ndarray],
        alphas: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, ...]:
        """Returns one concat output per present branch, ordered
        (down, same, up) — matching the reference's tuple unpacking."""
        branches = []
        hw = None
        if self.has_down:
            assert s1_down is not None
            b = self.preprocess_down(s1_down, train)
            hw = b.shape[1:3]
            branches.append(b)
        if self.has_same:
            assert s1_same is not None
            b = self.preprocess_same(s1_same, train)
            hw = b.shape[1:3]
            branches.append(b)
        if self.has_up:
            assert s1_up is not None
            target = (
                scale_dimension_search(s1_up.shape[1], 2),
                scale_dimension_search(s1_up.shape[2], 2),
            )
            b = resize_bilinear(s1_up, target, align_corners=False)
            b = self.preprocess_up(b, train)
            hw = b.shape[1:3]
            branches.append(b)

        if s0.shape[1] < hw[0] or s0.shape[2] < hw[1]:
            s0 = resize_bilinear(s0, hw, align_corners=False)
        s0 = self.pre_preprocess(s0, train)

        # fixed-kind ops are position-dependent; each branch re-consumes the
        # same shared op modules (param sharing across branches, as reference)
        return tuple(self._dag(s0, b, alphas, train) for b in branches)
