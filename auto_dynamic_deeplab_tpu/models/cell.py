"""Decoded (fixed-genotype) cell — TPU-native equivalent of modeling/ADD.py
Cell (:14-116), baseline_model.py Cell_baseline and autodeeplab.py
Cell_AutoDeepLab (all share the same block DAG).

A cell is a B-block DAG over states [s0, s1, block_0, ..., block_{B-1}];
block i consumes edges numbered offset..offset+len(states)-1 where
offset = sum_{j<i}(2+j). The genotype selects 2 edges per block and one
primitive per edge; the cell output is the channel-concat of all B block
outputs.

Reference quirk preserved for checkpoint-level parity: ADD.py:59-62 builds
the op list in genotype *row order* but consumes it while iterating edges in
*ascending* order (ADD.py:97-110). When genotype rows are not sorted by edge
(true for the shipped autodeeplab genotype, rows [19,7],[18,5]), the op of
row k lands on the k-th smallest selected edge. We reproduce exactly that
mapping: ``op_for(sorted_edges[k]) = rows[k].op``.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from ..nas.genotypes import PRIMITIVES
from ..ops.packed import (
    packed_relu_conv_bn_1x1 as run_packed_relu_conv_bn_1x1,
    run_packed_dag,
    schedule_waves,
)
from ..ops.primitives import OPS, FactorizedReduce, ReLUConvBN
from ..ops.resize import resize_bilinear, scale_dimension

GenotypeRows = Tuple[Tuple[int, int], ...]


def as_genotype_rows(cell_arch) -> GenotypeRows:
    """Normalize a (k, 2) array/sequence to a hashable tuple of int pairs."""
    return tuple((int(e), int(o)) for e, o in cell_arch)


def edge_op_assignment(rows: GenotypeRows) -> Tuple[Tuple[int, int], ...]:
    """(edge, op) pairs with ops assigned in the reference's row-order-vs-
    sorted-edge-order convention (see module docstring), sorted by edge."""
    edges = sorted(e for e, _ in rows)
    ops = [o for _, o in rows]
    return tuple(zip(edges, ops))


class FixedCell(nn.Module):
    """One decoded cell.

    Attributes:
      genotype: ((edge, op), ...) rows as decoded (row order preserved).
      C_out: per-block channel count (F * fm[level]).
      downup_sample: +1 = upsample 2x before preprocess, -1 = FactorizedReduce
        preprocess, 0 = 1x1 preprocess.
      dense_in: s0 is a *list* of earlier dense taps (each 1x1-projected,
        concatenated, fused by one more 1x1 — ADD.py:47-52,:87-93).
      dense_out: additionally emit dense_process(concat) (ADD.py:56-57,:114).
    """

    genotype: GenotypeRows
    B: int
    C_out: int
    downup_sample: int
    dense_in: bool = False
    dense_out: bool = False
    affine: bool = True
    # Eval-only wave-packed DAG execution (ops/packed.py): independent ops
    # concat along channels, BN folded, block-diag pointwise matmuls. Exact
    # up to bf16 rounding of the folded scales; training stays unpacked.
    packed_eval: bool = False
    # Eval-only fused Pallas DAG execution (kernels/cell_ops.py): the block
    # DAG runs in a flat channel-major (C, spatial-lane) layout — one
    # pallas_call per conv stage, BN folded — avoiding XLA's 128-lane
    # padding at C=40. Batch-1 only; other batches fall back to XLA.
    flat_eval: bool = False
    # Eval-only exact SepConv rewrite: each dw→pw pair executes as ONE dense
    # kxk conv with the composed kernel (ops/primitives._composed_sep_stage).
    # Same params, same math, half the conv HBM passes per stage.
    dense_sep_eval: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        kw = dict(affine=self.affine, axis_name=self.axis_name, dtype=self.dtype)
        if self.downup_sample == -1:
            self.preprocess = FactorizedReduce(features=self.C_out, **kw)
        else:
            self.preprocess = ReLUConvBN(features=self.C_out, kernel_size=1, **kw)

        if self.dense_in:
            # One projection per dense tap; count is static per call site, so
            # build lazily-sized list at first call via nn.compact-style is not
            # possible in setup — instead the caller passes the tap count.
            self.pre_preprocess = [
                ReLUConvBN(features=self.C_out, kernel_size=1, **kw, name=f"pre_{i}")
                for i in range(self.num_dense_in)
            ]
            self.pre_preprocess_1x1 = ReLUConvBN(
                features=self.C_out, kernel_size=1, **kw
            )
        else:
            self.pre_preprocess = ReLUConvBN(features=self.C_out, kernel_size=1, **kw)

        if self.dense_out:
            self.dense_process = ReLUConvBN(features=self.C_out, kernel_size=1, **kw)

        self.assignment = edge_op_assignment(self.genotype)
        ops = []
        for _, op in self.assignment:
            prim = PRIMITIVES[op]
            okw = dict(kw)
            if self.dense_sep_eval and prim.startswith("sep_conv"):
                okw["dense_form"] = True
            ops.append(OPS[prim](self.C_out, 1, **okw))
        self.ops = ops
        self.waves = schedule_waves(self.assignment, self.B)

    # Number of dense inputs; 0 when dense_in is False. Declared as a module
    # attribute so the param structure is fixed at construction.
    num_dense_in: int = 0

    def __call__(
        self,
        s0: Union[jnp.ndarray, Sequence[jnp.ndarray]],
        s1: jnp.ndarray,
        train: bool,
    ):
        prev_input = s1
        if self.downup_sample == 1:
            target = (
                scale_dimension(s1.shape[1], 2),
                scale_dimension(s1.shape[2], 2),
            )
            s1 = resize_bilinear(s1, target, align_corners=False)
        s1 = self.preprocess(s1, train)
        hw = s1.shape[1:3]

        use_packed = (
            self.packed_eval and not train and not self.is_initializing()
        )
        if self.dense_in:
            assert len(s0) == self.num_dense_in, (len(s0), self.num_dense_in)
            taps = [
                tap if tap.shape[1:3] == hw
                else resize_bilinear(tap, hw, align_corners=False)
                for tap in s0
            ]
            if use_packed:
                # all T tap projections as ONE block-diag 1x1 + the fuse 1x1
                projected = run_packed_relu_conv_bn_1x1(
                    taps, [m.variables for m in self.pre_preprocess], self.dtype
                )
                s0 = run_packed_relu_conv_bn_1x1(
                    [projected], [self.pre_preprocess_1x1.variables], self.dtype
                )
            else:
                projected = [
                    proj(tap, train)
                    for tap, proj in zip(taps, self.pre_preprocess)
                ]
                s0 = self.pre_preprocess_1x1(
                    jnp.concatenate(projected, axis=-1), train
                )
        else:
            if s0.shape[1] != s1.shape[1]:
                s0 = resize_bilinear(s0, hw, align_corners=False)
            s0 = self.pre_preprocess(s0, train)

        use_flat = (
            self.flat_eval
            and not train
            and not self.is_initializing()
            and s1.shape[0] == 1
        )
        states = [s0, s1]
        if use_flat:
            from ..kernels.cell_ops import (
                FlatSpec,
                concat_from_flat,
                pick_chunk,
                run_dag_flat,
                to_flat,
            )

            spec = FlatSpec(
                H=s1.shape[1], W=s1.shape[2], chunk=pick_chunk(self.C_out)
            )
            blocks = run_dag_flat(
                to_flat(s0, spec),
                to_flat(s1, spec),
                self.assignment,
                self.B,
                [op.variables for op in self.ops],
                PRIMITIVES,
                spec,
            )
            concat = concat_from_flat(blocks, self.C_out, spec)
            if self.dense_out:
                return prev_input, concat, self.dense_process(concat, train)
            return prev_input, concat
        if self.packed_eval and not train and not self.is_initializing():
            states.extend(
                run_packed_dag(
                    s0, s1, self.waves,
                    [op.variables for op in self.ops],
                    self.B, self.dtype,
                )
            )
        else:
            selected = dict(self.assignment)
            op_iter = iter(self.ops)
            offset = 0
            for _ in range(self.B):
                block_inputs = []
                for j, h in enumerate(states):
                    if (offset + j) in selected:
                        block_inputs.append(next(op_iter)(h, train))
                states.append(sum(block_inputs))
                offset += len(states) - 1

        concat = jnp.concatenate(states[-self.B :], axis=-1)
        if self.dense_out:
            return prev_input, concat, self.dense_process(concat, train)
        return prev_input, concat
