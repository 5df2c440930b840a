"""Decoded multi-exit networks: ADD (dense), baseline (non-dense), and
single-exit AutoDeepLab — one TPU-native backbone runner.

Reference parity map:
  * ADD           → modeling/ADD.py:118-500   (dense taps, C exits, shared head)
  * Baselin_Model → modeling/baseline_model.py:93-254 (plain cell chain)
  * AutoDeepLab   → modeling/autodeeplab.py:94-204    (single exit)

Design notes (TPU-first):
  * The whole forward is one static XLA program per input shape; exits are
    ordinary outputs. Early-exit inference uses the segment methods below,
    compiled per segment, so stopping early genuinely skips FLOPs
    (reference uses data-dependent Python control flow, ADD.py:379-488).
  * ``aspp_size`` consistently uses stride 2^(level+2) as in ADD.forward
    (ADD.py:279-280). The reference's get_feature/dynamic_inference use
    2^level instead (ADD.py:329,:383) — a defect that makes dynamic
    inference run ASPP at 16x the area; we do NOT replicate it.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.aspp import ASPPTrain
from ..ops.heads import DecoderHead, LowLevelConv
from ..ops.norm import BatchNorm
from ..ops.primitives import (
    DoubleFactorizedReduce,
    FactorizedReduce,
    ReLUConvBN,
    conv2d,
)
from ..ops.resize import resize_bilinear, scale_dimension
from .cell import FixedCell, GenotypeRows, as_genotype_rows

FM = (1, 2, 4, 8)  # level -> channel multiplier (ADD.py:149)


def _aspp_mult(final_level: int) -> float:
    """Atrous-rate multiplier by the path's final level (ADD.py:242-247).

    The reference handles only levels 1-3 — a decoded path ending at level 0
    (stride 4, which Viterbi can legitimately produce) hits an unassigned
    `mult` NameError there. Extended coherently: rates double per level up
    (dilation ∝ 1/stride), so level 0 → 4.0. Defect not replicated."""
    return {0: 4.0, 1: 2.0, 2: 1.0, 3: 0.5}[final_level]


class _Stems(nn.Module):
    """Three stems (ADD.py:154-169): conv s2 → 64 (+BN+ReLU), conv → 64
    (+BN), relu+conv s2 → 128 (+BN). Returns (stem1_out, stem2_out)."""

    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool):
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        x = conv2d(64, 3, stride=2, padding=1, dtype=self.dtype, name="stem0_conv")(x)
        x = BatchNorm(name="stem0_bn", **kw)(x, train)
        x = nn.relu(x)
        s0 = conv2d(64, 3, padding=1, dtype=self.dtype, name="stem1_conv")(x)
        s0 = BatchNorm(name="stem1_bn", **kw)(s0, train)
        s1 = nn.relu(s0)
        s1 = conv2d(128, 3, stride=2, padding=1, dtype=self.dtype, name="stem2_conv")(s1)
        s1 = BatchNorm(name="stem2_bn", **kw)(s1, train)
        return s0, s1


class DecodedNet(nn.Module):
    """Decoded network with C exits sharing one ASPP+decoder head.

    ``network_arch`` is the 12-entry level path; ``C_index`` the early-exit
    layer indices (final layer is always an exit); ``genotype`` the decoded
    cell rows. ``dense=True`` gives ADD's densely-connected variant.
    """

    network_arch: Tuple[int, ...]
    C_index: Tuple[int, ...]
    genotype: GenotypeRows
    num_classes: int
    F: int = 20
    B: int = 5
    low_level_layer: int = 0
    dense: bool = True
    remat: bool = False  # checkpoint each cell: trade FLOPs for HBM in train
    fp32_eval_logits: bool = False  # force fp32 logits at eval (parity mode)
    # Wave-packed eval execution of the cell DAGs (ops/packed.py): channels
    # of independent ops concat to full vector lanes, BN folded, ~3x fewer
    # kernels. Training and init always use the unpacked modules.
    packed_eval: bool = False
    # Fused Pallas flat-layout eval execution of the cell DAGs
    # (kernels/cell_ops.py): one pallas_call per conv stage in (C, lane)
    # layout. Batch-1 eval only; training/init always unfused.
    flat_eval: bool = False
    # Eval-only exact SepConv dense-form rewrite inside every cell: each
    # dw→pw pair runs as one composed dense conv (ops/primitives.py).
    dense_sep_eval: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @property
    def exit_layers(self) -> Tuple[int, ...]:
        n = len(self.network_arch)
        # dedupe: a C_index exit at the final layer IS the final exit
        out = []
        for s in tuple(self.C_index) + (n - 1,):
            if s not in out:
                out.append(s)
        return tuple(out)

    def setup(self):
        arch = self.network_arch
        n = len(arch)
        F, B = self.F, self.B
        FB = F * B
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)

        self.stems = _Stems(**kw)

        # remat static_argnums counts self at 0: (self, s0, s1, train) → 3
        cell_cls = nn.remat(FixedCell, static_argnums=(3,)) if self.remat else FixedCell

        cells = []
        for i in range(n):
            level = arch[i]
            downup = (0 - level) if i == 0 else int(arch[i - 1] - level)
            dense_in = self.dense and i >= 3
            dense_out = self.dense and i < n - 2
            cells.append(
                cell_cls(
                    genotype=self.genotype,
                    B=B,
                    C_out=F * FM[level],
                    downup_sample=downup,
                    dense_in=dense_in,
                    dense_out=dense_out,
                    num_dense_in=(i - 1) if dense_in else 0,
                    packed_eval=self.packed_eval,
                    flat_eval=self.flat_eval,
                    dense_sep_eval=self.dense_sep_eval,
                    name=f"cell_{i}",
                    **kw,
                )
            )
        self.cells = cells

        self.low_level_conv = LowLevelConv(**kw)
        self.aspp = ASPPTrain(out=256, mult=_aspp_mult(arch[-1]), **kw)
        self.decoder = DecoderHead(
            num_classes=self.num_classes,
            fp32_eval_logits=self.fp32_eval_logits,
            **kw,
        )

        # Per-exit resolution/channel adapters (ADD.py:265-273), built only
        # for early exits whose level differs from the final level.
        adapters = []
        adapter_index: Dict[int, int] = {}
        for c in self.C_index:
            diff = arch[c] - arch[-1]
            if diff == 0:
                continue
            feats = FB * FM[arch[-1]]
            if diff == -1:
                mod = FactorizedReduce(features=feats, name=f"conv_aspp_{c}", **kw)
            elif diff == -2:
                mod = DoubleFactorizedReduce(features=feats, name=f"conv_aspp_{c}", **kw)
            else:  # coarser exit than final: 1x1 channel adapter after upsample
                mod = ReLUConvBN(features=feats, kernel_size=1, name=f"conv_aspp_{c}", **kw)
            adapter_index[c] = len(adapters)
            adapters.append(mod)
        self.conv_aspp = adapters
        self._adapter_index = adapter_index

    # ---------------------------------------------------------------- state
    # Backbone state threaded between segments (a plain dict pytree with
    # static structure per segment boundary).

    def stem_state(self, x: jnp.ndarray, train: bool = False) -> dict:
        s0, s1 = self.stems(x, train)
        # NOTE: no static metadata (e.g. input size) lives in the state — it
        # crosses jit boundaries between segment programs as a pure pytree.
        return {
            "prev_prev": s0,
            "prev": s1,
            "x": None,
            "dense": (),
            "low_level": None,
        }

    def run_cells(self, state: dict, start: int, end: int, train: bool = False) -> dict:
        """Run cells[start..end] inclusive, updating state (ADD.py:290-308)."""
        n = len(self.network_arch)
        s_pp, s_p = state["prev_prev"], state["prev"]
        x = state["x"]
        dense = list(state["dense"])
        low_level = state["low_level"]

        for i in range(start, end + 1):
            cell = self.cells[i]
            if not self.dense:
                s_pp, s_p = cell(s_pp, s_p, train)
            else:
                # Branch on the SAME predicates the constructor used
                # (dense_in = i>=3, dense_out = i<n-2) so short decoded
                # paths (n<6), where the ranges overlap, stay consistent —
                # the reference hardcodes n=12 and never hits this.
                takes_dense = i >= 3
                produces = i < n - 2
                if takes_dense:
                    ins = dense if i == n - 1 else dense[:-1]
                    if produces:
                        _, x, fmap = cell(ins, x, train)
                        dense.append(fmap)
                    else:
                        _, x = cell(ins, x, train)
                else:
                    if produces:
                        s_pp, s_p, fmap = cell(s_pp, s_p, train)
                        dense.append(fmap)
                    else:
                        s_pp, s_p = cell(s_pp, s_p, train)
                    if i == 2:
                        x = s_p

            if i == self.low_level_layer:
                low_level = self.low_level_conv(s_p, train)

        return {
            **state,
            "prev_prev": s_pp,
            "prev": s_p,
            "x": x,
            "dense": tuple(dense),
            "low_level": low_level,
        }

    def exit_feature(self, state: dict, i: int) -> jnp.ndarray:
        """Pre-head feature at exit layer i (ADD.py:311-314)."""
        if self.dense and i > 2:
            return state["x"]
        return state["prev"]

    def exit_logits(
        self, state: dict, i: int, size, train: bool = False,
        class_leading: bool = False,
    ) -> jnp.ndarray:
        """Shared-head classification at exit layer i (ADD.py:316-324).
        ``size`` is the static input (H, W) the logits are upsampled to.
        ``class_leading`` returns (N, C, H, W) — the reference's torch
        layout — skipping the lane-padded full-res NHWC materialization."""
        arch = self.network_arch
        scale = 2.0 ** -(arch[-1] + 2)
        aspp_hw = (scale_dimension(size[0], scale), scale_dimension(size[1], scale))

        y = self.exit_feature(state, i)
        if y.shape[1] < aspp_hw[0] or y.shape[2] < aspp_hw[1]:
            y = resize_bilinear(y, aspp_hw, align_corners=False)
        if i in self._adapter_index:
            y = self.conv_aspp[self._adapter_index[i]](y, train)
        y = self.aspp(y, train)
        return self.decoder(y, state["low_level"], size, train, class_leading)

    # ------------------------------------------------------------- programs

    def __call__(
        self, x: jnp.ndarray, train: bool = False, class_leading: bool = False
    ) -> List[jnp.ndarray]:
        """All-exit forward: list of C logits, each (N, H, W, num_classes) —
        or (N, num_classes, H, W) with ``class_leading`` (keeps the 19-class
        dim off the TPU lane minor; pair with the loss's channel_axis=1)."""
        state = self.stem_state(x, train)
        out = []
        start = 0
        size = x.shape[1:3]
        for i in self.exit_layers:
            state = self.run_cells(state, start, i, train)
            out.append(
                self.exit_logits(state, i, size, train, class_leading)
            )
            start = i + 1
        return out

    def get_feature(self, x: jnp.ndarray, train: bool = False):
        """(first-exit logits, raw pre-head feature) for EDM data generation
        (ADD.py:327-377)."""
        first = self.exit_layers[0]
        state = self.stem_state(x, train)
        state = self.run_cells(state, 0, first, train)
        feature = self.exit_feature(state, first)
        return self.exit_logits(state, first, x.shape[1:3], train), feature


class EDM(nn.Module):
    """Earlier-exit Decision Maker (ADD.py:502-525): relu → 3x3 s2 conv →
    relu → GAP → MLP(128→64→32→1). Predicts normalized Shannon entropy of
    the exit's output from its pre-head feature."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(x)
        x = conv2d(128, 3, stride=2, padding=1, dtype=self.dtype, name="conv")(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))  # GAP → (N, 128)
        x = nn.relu(nn.Dense(64, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(32, dtype=self.dtype, name="fc2")(x))
        return nn.Dense(1, dtype=jnp.float32, name="fc3")(x)


# ------------------------------------------------------------ constructors


def ADD(
    network_arch: Sequence[int],
    C_index: Sequence[int],
    cell_arch,
    num_classes: int,
    F: int = 20,
    B: int = 5,
    low_level_layer: int = 0,
    **kw,
) -> DecodedNet:
    """Densely-connected multi-exit ADD model (ADD.py:118)."""
    return DecodedNet(
        network_arch=tuple(int(v) for v in network_arch),
        C_index=tuple(int(v) for v in C_index),
        genotype=as_genotype_rows(cell_arch),
        num_classes=num_classes,
        F=F,
        B=B,
        low_level_layer=low_level_layer,
        dense=True,
        **kw,
    )


def BaselineModel(
    network_arch: Sequence[int],
    C_index: Sequence[int],
    cell_arch,
    num_classes: int,
    F: int = 20,
    B: int = 5,
    low_level_layer: int = 0,
    **kw,
) -> DecodedNet:
    """Non-dense multi-exit baseline (baseline_model.py:93, 'Baselin_Model')."""
    return DecodedNet(
        network_arch=tuple(int(v) for v in network_arch),
        C_index=tuple(int(v) for v in C_index),
        genotype=as_genotype_rows(cell_arch),
        num_classes=num_classes,
        F=F,
        B=B,
        low_level_layer=low_level_layer,
        dense=False,
        **kw,
    )


def AutoDeepLab(
    network_arch: Sequence[int],
    cell_arch,
    num_classes: int,
    F: int = 20,
    B: int = 5,
    low_level_layer: int = 2,
    **kw,
) -> DecodedNet:
    """Canonical single-exit Auto-DeepLab (autodeeplab.py:94)."""
    return DecodedNet(
        network_arch=tuple(int(v) for v in network_arch),
        C_index=(),
        genotype=as_genotype_rows(cell_arch),
        num_classes=num_classes,
        F=F,
        B=B,
        low_level_layer=low_level_layer,
        dense=False,
        **kw,
    )
