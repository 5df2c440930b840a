"""Two-level NAS supernets over the 12-layer x 4-level trellis.

One skeleton covers both reference supernets:
  * cell_kind='mixed' → Model_search (modeling/model_search.py:10-655):
    cell-level alphas (k x 8 MixedOps) + network-level betas, exit stations
    with per-station ASPP heads.
  * cell_kind='fixed' → Model_net_search (modeling/model_net_search.py:135):
    cells frozen to a decoded genotype, betas-only search, exit stations at
    each C_index sharing one set of 4-level ASPP heads.

Architecture parameters (alphas, betas) live in their own 'arch' variable
collection so the bilevel optimizer can treat them as a separate pytree —
the functional equivalent of arch_parameters()/weight_parameters()
(model_search.py:651-655).

Known reference defects NOT replicated (SURVEY.md "do not replicate"):
  * dead `exit_1_4_new` NameError path (model_search.py:445,:606) — our
    first exit station evaluates all four level heads;
  * betas tensor initialized from garbage randn with unused entries
    (model_search.py:166) — we mask the invalid transitions explicitly.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nas.genotypes import PRIMITIVES, num_edges
from ..ops.aspp import ASPPSearch
from ..ops.norm import BatchNorm
from ..ops.primitives import (
    DoubleFactorizedReduce,
    FactorizedReduce,
    ReLUConvBN,
    conv2d,
)
from ..ops.resize import resize_bilinear
from .cell import GenotypeRows
from .supernet_cell import TrellisCell

NUM_LEVELS = 4


def normalize_betas(betas: jnp.ndarray) -> jnp.ndarray:
    """β logits (L, 4, 3) → transition probabilities with the 2/3
    boundary-edge correction (model_search.py:171-187), invalid entries 0."""
    L = betas.shape[0]
    out = jnp.zeros_like(betas)
    out = out.at[:, 0, 1:].set(jax.nn.softmax(betas[:, 0, 1:], axis=-1) * (2 / 3))
    out = out.at[1:, 1, :].set(jax.nn.softmax(betas[1:, 1, :], axis=-1))
    out = out.at[2:, 2, :].set(jax.nn.softmax(betas[2:, 2, :], axis=-1))
    out = out.at[3:, 3, :2].set(jax.nn.softmax(betas[3:, 3, :2], axis=-1) * (2 / 3))
    return out


class TrellisSupernet(nn.Module):
    num_classes: int
    num_layers: int = 12
    F: int = 8
    B: int = 5
    cell_kind: str = "mixed"  # 'mixed' | 'fixed'
    genotype: Optional[GenotypeRows] = None
    exit_layers_cfg: Tuple[int, ...] = (5,)  # early exit stations (+ final)
    shared_exit_heads: bool = True
    # dense=False is the baseline trellis (model_baseline_path_search.py:
    # 135-150): no dense_preprocess taps; s0 at layers >= 3 is the same-level
    # output from two layers back (level_*[-2]) instead of a dense concat.
    dense: bool = True
    remat: bool = True
    # Optional jax.checkpoint policy for the remat'd cells:
    #   None           — save nothing, recompute everything (default);
    #   'dots'         — save (don't recompute) matmul AND conv results
    #                    (jax dots_saveable, which matches dot_general and
    #                    conv_general_dilated — the cells are almost entirely
    #                    convs, so a dot-only policy would save ~nothing);
    #   'offload_dots' — save matmul/conv results but OFFLOAD them to
    #                    pinned host memory instead of HBM (custom policy
    #                    mirroring offload_dot_with_no_batch_dims, widened
    #                    to conv_general_dilated for the same reason).
    # 'offload_dots' trades HBM for PCIe/DMA traffic — the single-chip
    # fallback for configs whose bilevel step OOMs even under full remat
    # (SCALE_r03: 12L F=20 B=5 321² mixed supernet; the multi-chip answer
    # is make_search_steps(mesh=...), scripts/scale_supernet_mesh.py).
    remat_policy: Optional[str] = None
    # How mixed cells execute (supernet_cell.TrellisCell.mixed_exec): same
    # numerics, progressively smaller traced graphs — 'edges' (reference-
    # shaped), 'banked' (edges vmapped per block), 'scan' (whole DAG as one
    # lax.scan'd banked op; the only form whose 12L F=20 bilevel step fits
    # the AOT compiler). Param layouts differ, so it is part of the config.
    mixed_exec: str = "edges"
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @property
    def exit_stations(self) -> Tuple[int, ...]:
        # dedupe: a configured exit at the final layer IS the final exit
        # (e.g. exit_layers_cfg=(5,) with num_layers=6)
        out: List[int] = []
        for s in tuple(self.exit_layers_cfg) + (self.num_layers - 1,):
            if s not in out:
                out.append(s)
        return tuple(out)

    def setup(self):
        bad = [s for s in self.exit_layers_cfg if not 0 <= s < self.num_layers]
        if bad:
            raise ValueError(
                f"exit station(s) {bad} outside the {self.num_layers}-layer "
                "trellis — pass --exit-layers < num_layers (the default "
                "station 5 assumes the reference's 12-layer config)"
            )
        F, B, L = self.F, self.B, self.num_layers
        FB = F * B
        half = FB // 2
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        nf_kw = dict(affine=False, **kw)

        # stems (model_search.py:54-62)
        self.stem0_conv = conv2d(half, 3, stride=2, padding=1, dtype=self.dtype)
        self.stem0_bn = BatchNorm(**kw)
        self.stem1_conv = conv2d(FB, 3, stride=2, padding=1, dtype=self.dtype)
        self.stem1_bn = BatchNorm(**kw)

        # static_argnums counts the post-self call args: (s0, down, same, up,
        # alphas, train) → train at index 5 must stay a Python bool.
        # The cells' FLOPs live in conv_general_dilated (ops/packed.py lowers
        # the mixed DAG to 1×1/depthwise convs, not dot_general), so both
        # policies must match convs — jax's *_with_no_batch_dims variants
        # match ONLY dot_general and would save nothing here.
        def _offload_convs_and_dots(prim, *_, **__):
            if prim.name in ("dot_general", "conv_general_dilated"):
                return jax.ad_checkpoint.Offloadable(
                    src="device", dst="pinned_host"
                )
            return jax.ad_checkpoint.Recompute

        policies = {
            None: None,
            "dots": jax.checkpoint_policies.dots_saveable,
            "offload_dots": _offload_convs_and_dots,
        }
        if self.remat_policy not in policies:
            raise ValueError(
                f"remat_policy={self.remat_policy!r}: expected one of "
                f"{sorted(k for k in policies if k)} or None"
            )
        if self.remat_policy is not None and not self.remat:
            raise ValueError(
                f"remat_policy={self.remat_policy!r} requires remat=True — "
                "without remat the policy is never applied and the expected "
                "memory savings silently do not happen"
            )
        if self.remat:
            cell_cls = nn.remat(
                TrellisCell,
                static_argnums=(6,),
                policy=policies[self.remat_policy],
            )
        else:
            cell_cls = TrellisCell

        def cell(C_out, down, same, up, pre_rate=1.0, name=None):
            return cell_cls(
                B=B, C_out=C_out, has_down=down, has_same=same, has_up=up,
                pre_rate=pre_rate, cell_kind=self.cell_kind,
                genotype=self.genotype, mixed_exec=self.mixed_exec,
                name=name, **kw,
            )

        cells: List = []
        for i in range(L):
            tag = f"l{i}"
            if i == 0:
                cells.append([
                    cell(F, False, True, False, 0.5, name=f"{tag}_c0"),
                    cell(F * 2, True, False, False, 0.25, name=f"{tag}_c1"),
                ])
            elif i == 1:
                cells.append([
                    cell(F, False, True, True, 1.0, name=f"{tag}_c0"),
                    cell(F * 2, True, True, False, 0.5, name=f"{tag}_c1"),
                    cell(F * 4, True, False, False, 0.25, name=f"{tag}_c2"),
                ])
            elif i == 2:
                cells.append([
                    cell(F, False, True, True, 1.0, name=f"{tag}_c0"),
                    cell(F * 2, True, True, True, 1.0, name=f"{tag}_c1"),
                    cell(F * 4, True, True, False, 0.5, name=f"{tag}_c2"),
                    cell(F * 8, True, False, False, 0.25, name=f"{tag}_c3"),
                ])
            else:
                # Non-dense at i==3: the level-32 cell's s0 is l16 from layer
                # 1 (stride 16 → 32), needing a stride-2 pre-reduce. The
                # reference constructs rate 0.25 there yet feeds a stride-16
                # tensor (model_baseline_path_search.py:232-236 vs :444-448)
                # — an untested-path defect; we use the coherent 0.5.
                l32_pre = 0.5 if (not self.dense and i == 3) else 1.0
                cells.append([
                    cell(F, False, True, True, 1.0, name=f"{tag}_c0"),
                    cell(F * 2, True, True, True, 1.0, name=f"{tag}_c1"),
                    cell(F * 4, True, True, True, 1.0, name=f"{tag}_c2"),
                    cell(F * 8, True, True, False, l32_pre, name=f"{tag}_c3"),
                ])
        self.trellis = cells

        # dense taps (model_search.py:33-52): per layer 0..L-3, projections of
        # each level's output to F*fm channels (coarse levels synthesized by
        # reduction at layers 0/1 before those levels exist).
        dense = []
        for i in range(L - 2 if self.dense else 0):
            if i == 0:
                mods = [
                    ReLUConvBN(features=F, kernel_size=1, **nf_kw),
                    ReLUConvBN(features=F * 2, kernel_size=1, **nf_kw),
                    FactorizedReduce(features=F * 4, **nf_kw),
                    DoubleFactorizedReduce(features=F * 8, **nf_kw),
                ]
            elif i == 1:
                mods = [
                    ReLUConvBN(features=F, kernel_size=1, **nf_kw),
                    ReLUConvBN(features=F * 2, kernel_size=1, **nf_kw),
                    ReLUConvBN(features=F * 4, kernel_size=1, **nf_kw),
                    FactorizedReduce(features=F * 8, **nf_kw),
                ]
            else:
                mods = [
                    ReLUConvBN(features=F, kernel_size=1, **nf_kw),
                    ReLUConvBN(features=F * 2, kernel_size=1, **nf_kw),
                    ReLUConvBN(features=F * 4, kernel_size=1, **nf_kw),
                    ReLUConvBN(features=F * 8, kernel_size=1, **nf_kw),
                ]
            dense.append(mods)
        self.dense_preprocess = dense

        # exit heads: 4 per station (dilations 24/12/6/3, model_search.py:138)
        def head_set(prefix):
            dil = [24, 12, 6, 3]
            return [
                ASPPSearch(
                    out=self.num_classes, dilation=dil[lv], name=f"{prefix}_{lv}", **kw
                )
                for lv in range(NUM_LEVELS)
            ]

        if self.shared_exit_heads:
            self.exit_heads = [head_set("aspp")]
        else:
            self.exit_heads = [
                head_set(f"aspp_exit_{s}") for s in range(len(self.exit_stations))
            ]

        # architecture parameters in their own collection
        k = num_edges(B)
        if self.cell_kind == "mixed":
            self.alphas = self.variable(
                "arch", "alphas",
                lambda: 1e-3
                * jax.random.normal(self.make_rng("params"), (k, len(PRIMITIVES))),
            )
        self.betas = self.variable(
            "arch", "betas",
            lambda: 1e-3
            * jax.random.normal(self.make_rng("params"), (self.num_layers, NUM_LEVELS, 3)),
        )

    # ------------------------------------------------------------- forward

    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        L = self.num_layers
        size = x.shape[1:3]
        # The search cell's upsample uses the reference's even-dim rule
        # (cell_level_search.py:80-82 → scale_dimension_search): dims must
        # stay ODD down the whole stride-4..32 chain or up/down branch
        # outputs disagree by one pixel (the reference crashes identically).
        # Valid crops satisfy (d-1) % 64 == 0: 65, 129, 321 (the reference's
        # search crop), 769...
        for d in size:
            if (d - 1) % 64:
                raise ValueError(
                    f"supernet input dim {d} invalid: search crops need "
                    f"(d-1) % 64 == 0 (e.g. 65, 129, 321) so every trellis "
                    f"level has odd spatial size"
                )
        nb = normalize_betas(self.betas.value.astype(jnp.float32))
        alphas = None
        if self.cell_kind == "mixed":
            alphas = jax.nn.softmax(self.alphas.value.astype(jnp.float32), axis=-1)
            if self.mixed_exec == "scan":
                from .supernet_cell import alpha_table

                alphas = alpha_table(alphas, self.B)

        temp = self.stem0_bn(self.stem0_conv(x), train)
        l4 = [self.stem1_bn(self.stem1_conv(nn.relu(temp)), train)]
        l8: List = []
        l16: List = []
        l32: List = []
        d4: List = []
        d8: List = []
        d16: List = []
        d32: List = []
        exit_outputs: List[List[jnp.ndarray]] = []

        def run(cellmod, s0, down, same, up):
            return cellmod(s0, down, same, up, alphas, train)

        for i in range(L):
            row = self.trellis[i]
            if i == 0:
                (n4,) = run(row[0], temp, None, l4[-1], None)
                (n8,) = run(row[1], temp, l4[-1], None, None)
                n4 = nb[i, 0, 1] * n4
                n8 = nb[i, 0, 2] * n8
                news = [n4, n8, None, None]
            elif i == 1:
                a_same, a_up = run(row[0], l4[-2], None, l4[-1], l8[-1])
                n4 = nb[i, 0, 1] * a_same + nb[i, 1, 0] * a_up
                b_down, b_same = run(row[1], l4[-2], l4[-1], l8[-1], None)
                n8 = nb[i, 0, 2] * b_down + nb[i, 1, 1] * b_same
                (c_down,) = run(row[2], l4[-2], l8[-1], None, None)
                n16 = nb[i, 1, 2] * c_down
                news = [n4, n8, n16, None]
            elif i == 2:
                a_same, a_up = run(row[0], l4[-2], None, l4[-1], l8[-1])
                n4 = nb[i, 0, 1] * a_same + nb[i, 1, 0] * a_up
                b_down, b_same, b_up = run(row[1], l8[-2], l4[-1], l8[-1], l16[-1])
                n8 = nb[i, 0, 2] * b_down + nb[i, 1, 1] * b_same + nb[i, 2, 0] * b_up
                c_down, c_same = run(row[2], l8[-2], l8[-1], l16[-1], None)
                n16 = nb[i, 1, 2] * c_down + nb[i, 2, 1] * c_same
                (e_down,) = run(row[3], l8[-2], l16[-1], None, None)
                n32 = nb[i, 2, 2] * e_down
                news = [n4, n8, n16, n32]
            else:
                if self.dense:
                    last = i == L - 1
                    s0_4 = jnp.concatenate(d4 if last else d4[:-1], axis=-1)
                    s0_8 = jnp.concatenate(d8 if last else d8[:-1], axis=-1)
                    s0_16 = jnp.concatenate(d16 if last else d16[:-1], axis=-1)
                    s0_32 = jnp.concatenate(d32 if last else d32[:-1], axis=-1)
                else:
                    # baseline: plain same-level history from two layers back
                    # (model_baseline_path_search.py:434-476); at i==3 l32 has
                    # a single entry, so its s0 is l16 from layer 1 (:444).
                    s0_4, s0_8, s0_16 = l4[-2], l8[-2], l16[-2]
                    s0_32 = l32[-2] if len(l32) >= 2 else l16[-2]
                a_same, a_up = run(row[0], s0_4, None, l4[-1], l8[-1])
                n4 = nb[i, 0, 1] * a_same + nb[i, 1, 0] * a_up
                b_down, b_same, b_up = run(row[1], s0_8, l4[-1], l8[-1], l16[-1])
                n8 = nb[i, 0, 2] * b_down + nb[i, 1, 1] * b_same + nb[i, 2, 0] * b_up
                c_down, c_same, c_up = run(row[2], s0_16, l8[-1], l16[-1], l32[-1])
                n16 = nb[i, 1, 2] * c_down + nb[i, 2, 1] * c_same + nb[i, 3, 0] * c_up
                e_down, e_same = run(row[3], s0_32, l16[-1], l32[-1], None)
                n32 = nb[i, 2, 2] * e_down + nb[i, 3, 1] * e_same
                news = [n4, n8, n16, n32]

            n4, n8, n16, n32 = news
            l4.append(n4)
            if n8 is not None:
                l8.append(n8)
            if n16 is not None:
                l16.append(n16)
            if n32 is not None:
                l32.append(n32)

            # dense taps for layers 0..L-3 (model_search.py:205-208 etc.)
            if self.dense and i <= L - 3:
                mods = self.dense_preprocess[i]
                src16 = n16 if n16 is not None else n8
                src32 = n32 if n32 is not None else src16
                d4.append(mods[0](n4, train))
                d8.append(mods[1](n8, train))
                d16.append(mods[2](src16, train))
                d32.append(mods[3](src32, train))

            # trim history (non-dense needs the [-2] entries at every layer)
            keep = 2 if (i < 3 or not self.dense) else 1
            l4 = l4[-keep:]
            l8 = l8[-keep:]
            l16 = l16[-keep:]
            l32 = l32[-keep:]

            if i in self.exit_stations:
                station = self.exit_stations.index(i)
                heads = self.exit_heads[0 if self.shared_exit_heads else station]
                levels = [l4[-1], l8[-1], l16[-1], l32[-1]]
                outs = [heads[lv](levels[lv], train) for lv in range(NUM_LEVELS)]
                exit_outputs.append(outs)

        # sum the 4 level maps per exit after upsample (model_search.py:600-614)
        results = []
        for outs in exit_outputs:
            summed = None
            for o in outs:
                o = resize_bilinear(
                    o.astype(jnp.float32), size, align_corners=True
                )
                summed = o if summed is None else summed + o
            results.append(summed)
        return results
