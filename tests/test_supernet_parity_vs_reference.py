"""Golden end-to-end parity: our path-only supernet vs the reference
PyTorch Model_net_search (modeling/model_net_search.py).

Same recipe as test_add_parity_vs_reference: flax-initialize, randomize
params+BN stats, transplant into the torch reference, require eval-mode
per-exit logits within the reference's own parity tolerance (1e-3).

Two device artifacts of the reference are monkeypatched to run it on CPU:
  * `.cuda()` calls hardcoded in forward/_initialize_alphas_betas
    (model_net_search.py:295,706) → identity;
  * `.half()` on the normalized-betas scratch tensor (:295) → identity.
    On GPU this quantizes every beta to fp16 before the multiply — a
    memory micro-optimization, not semantics; we compare in fp32.

The other two search supernets cannot be golden-tested against torch:
Model_search's first exit station is a dead NameError path
(model_search.py:445,:606) and Model_layer_search_baseline feeds a
stride-16 tensor into a rate-0.25 pre-reduce (model_baseline_path_search.py
:232-236 vs :444-448), so neither reference forward executes. Their
behavior is pinned by construction tests in test_supernet.py /
test_baseline_supernet_and_pascal.py instead.
"""
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, "/root/reference")

from auto_dynamic_deeplab_tpu.models import ModelNetSearch
from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE, PRIMITIVES

from test_add_parity_vs_reference import _StateDict, _rand_stats

L, F, B = 6, 2, 5
C_INDEX = (3,)


class _SD(_StateDict):
    """Adds affine-free-BN writers (search nets use affine=False BNs,
    which carry running stats but no weight/bias on either side)."""

    def bn_na(self, tkey, fstats):
        self.d[tkey + ".running_mean"] = torch.from_numpy(
            np.asarray(fstats["mean"]).copy())
        self.d[tkey + ".running_var"] = torch.from_numpy(
            np.asarray(fstats["var"]).copy())

    def rcb_na(self, tprefix, fp, fs):
        self.conv(tprefix + ".op.1", fp["conv"])
        self.bn_na(tprefix + ".op.2", fs["bn"])

    def fred_na(self, tprefix, fp, fs):
        self.conv(tprefix + ".conv_1", fp["conv1"])
        self.conv(tprefix + ".conv_2", fp["conv2"])
        self.bn_na(tprefix + ".bn", fs["bn"])

    def sep_na(self, tprefix, fp, fs):
        for tidx, fkey in [(1, "dw1"), (2, "pw1"), (5, "dw2"), (6, "pw2")]:
            self.conv(f"{tprefix}.op.{tidx}", fp[fkey])
        self.bn_na(tprefix + ".op.3", fs["bn1"])
        self.bn_na(tprefix + ".op.7", fs["bn2"])

    def dil_na(self, tprefix, fp, fs):
        self.conv(tprefix + ".op.1", fp["conv"])
        self.bn_na(tprefix + ".op.2", fs["bn"])

    def pre_or_fred_na(self, tprefix, fp, fs):
        if "conv1" in fp:
            self.fred_na(tprefix, fp, fs)
        else:
            self.rcb_na(tprefix, fp, fs)


def _convert_net_search(variables, genotype):
    p, s = variables["params"], variables["batch_stats"]
    sd = _SD()

    sd.conv("stem0.0", p["stem0_conv"])
    sd.bn("stem0.1", p["stem0_bn"], s["stem0_bn"])
    sd.conv("stem1.1", p["stem1_conv"])
    sd.bn("stem1.2", p["stem1_bn"], s["stem1_bn"])

    # Fixed-cell op k holds genotype row k's primitive on the k-th smallest
    # selected edge (the reference's row-order-vs-edge-order convention,
    # models/cell.py docstring) — identical indexing on both sides.
    rows = [int(o) for _, o in genotype]
    idx = 0
    for i in range(L):
        ncells = 2 if i == 0 else (3 if i == 1 else 4)
        for j in range(ncells):
            fp, fs = p[f"l{i}_c{j}"], s[f"l{i}_c{j}"]
            t = f"cells.{idx}"
            idx += 1
            if "preprocess_down" in fp:
                sd.fred_na(t + ".preprocess_down",
                           fp["preprocess_down"], fs["preprocess_down"])
            if "preprocess_same" in fp:
                sd.rcb_na(t + ".preprocess_same",
                          fp["preprocess_same"], fs["preprocess_same"])
            if "preprocess_up" in fp:
                sd.rcb_na(t + ".preprocess_up",
                          fp["preprocess_up"], fs["preprocess_up"])
            sd.pre_or_fred_na(t + ".pre_preprocess",
                              fp["pre_preprocess"], fs["pre_preprocess"])
            for k, op_idx in enumerate(rows):
                prim = PRIMITIVES[op_idx]
                if prim.startswith("sep"):
                    sd.sep_na(f"{t}._ops.{k}", fp[f"ops_{k}"], fs[f"ops_{k}"])
                elif prim.startswith("dil"):
                    sd.dil_na(f"{t}._ops.{k}", fp[f"ops_{k}"], fs[f"ops_{k}"])

    for i in range(L - 2):
        for lv in range(4):
            sd.pre_or_fred_na(
                f"dense_preprocess.{i}.{lv}",
                p[f"dense_preprocess_{i}_{lv}"], s[f"dense_preprocess_{i}_{lv}"],
            )

    # exit heads: our aspp_{level} <-> reference aspp_{stride}
    for lv, stride in enumerate((4, 8, 16, 32)):
        fp, fs = p[f"aspp_{lv}"], s[f"aspp_{lv}"]
        t = f"aspp_{stride}"
        sd.conv(t + ".conv11.0", fp["conv11"])
        sd.bn(t + ".conv11.1", fp["bn11"], fs["bn11"])
        sd.conv(t + ".conv33.0", fp["conv33"])
        sd.bn(t + ".conv33.1", fp["bn33"], fs["bn33"])
        sd.conv(t + ".conv_p.0", fp["conv_p"])
        sd.bn(t + ".conv_p.1", fp["bn_p"], fs["bn_p"])
        sd.conv(t + ".concate_conv.0", fp["concate_conv"])
        sd.bn(t + ".concate_conv.1", fp["concate_bn"], fs["concate_bn"])
        sd.conv(t + ".final_conv", fp["final_conv"])
    return sd.d


def test_net_search_logits_match_reference(monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(torch.Tensor, "half", lambda self, *a, **k: self)
    from modeling.model_net_search import Model_net_search as TorchNetSearch

    genotype = AUTODEEPLAB_GENOTYPE
    model = ModelNetSearch(
        19, genotype, num_layers=L, F=F, B=B, C_index=C_INDEX, remat=False
    )
    x = np.random.RandomState(0).randn(1, 65, 65, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables = {**_rand_stats(variables), "arch": variables["arch"]}
    ours = [
        np.asarray(o)
        for o in model.apply(variables, jnp.asarray(x), train=False)
    ]

    args = types.SimpleNamespace(sync_bn=False, F=F, B=B)
    # the ctor arg is named `alphas` but is the decoded (k, 2) cell
    # genotype consumed by Cell_fixed (model_net_search.py:52,193)
    tmodel = TorchNetSearch(
        19, L, args, C_index=list(C_INDEX), alphas=np.asarray(genotype)
    )
    sd = _convert_net_search(variables, [(int(e), int(o)) for e, o in genotype])
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    real_missing = [
        m for m in missing if "num_batches_tracked" not in m and m != "betas"
    ]
    assert not real_missing, real_missing[:8]
    assert not unexpected, unexpected[:8]
    with torch.no_grad():
        # transplant our betas into the first L rows of the (12, 4, 3)
        # reference tensor (rows >= L are dead)
        tmodel.betas.data[:L] = torch.from_numpy(
            np.array(variables["arch"]["betas"], np.float32, copy=True))

    tmodel.eval()
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
    theirs = [np.transpose(t.numpy(), (0, 2, 3, 1)) for t in theirs]

    assert len(ours) == len(theirs) == len(C_INDEX) + 1
    for k, (a, b) in enumerate(zip(ours, theirs)):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3,
                                   err_msg=f"exit {k}")


# ---------------------------------------------------------------------------
# Golden parity for the MIXED cell+path supernet (Model_search).
#
# The torch Model_search (modeling/model_search.py:10-655) cannot execute as
# shipped — it has four fatal defects beyond the cuda/half artifacts:
#   1. `self.F` is read in __init__ (:28) but never assigned → AttributeError
#      before a single layer is built (the published scripts never run
#      `--network supernet`, search.py:75 would crash on construction);
#   2. the cell constructors (:67-137) use a bare `B` that is never a local
#      → NameError (only `self.B` exists);
#   3. the last-layer branch (:498-523) calls every cell WITHOUT
#      `normalized_alphas` → TypeError (Cell.forward requires it);
#   4. `exit_1_4_new` is computed only as a comment (:445) yet consumed at
#      :606 → NameError.
# To obtain an executable oracle we apply the MINIMAL textual fixes the
# surrounding code makes unambiguous (use the local F / bind B; pass
# normalized_alphas like every other layer; uncomment the stride-4 exit
# head), each asserted to patch exactly one site. Our ModelSearch implements
# the same intended semantics directly (models/supernet.py "defects NOT
# replicated" note).
#
# Eval-mode note: Model_search always calls MixedOp with training=True (the
# weighted sum) because Cell.forward never forwards a training flag; the
# MixedOp else-branch (argmax, cell_level_search.py:24-29) is the intended
# eval path and is what our MixedOp runs under train=False. The parity run
# patches MixedOp.forward to training=False so both sides execute the
# argmax-eval semantics with transplanted BN running stats.
# ---------------------------------------------------------------------------

ML, MF = 7, 2  # smallest config exercising ALL branches: 0,1,2,3, ==exit(4),
               # else(L-2=5), ==L-1(6); exit_layer must be >=4 (branch order)
               # and <= L-3 (dense tap indexing)
M_EXIT = 4


def _load_patched_model_search():
    with open("/root/reference/modeling/model_search.py") as f:
        src = f.read()
    patches = [
        ("f_initial = self.F * self.B",
         "B = self.B\n        f_initial = F * self.B"),
        ("# exit_1_4_new = self.aspp_exit_1_4(level_4[-1])",
         "exit_1_4_new = self.aspp_exit_1_4(level_4[-1])"),
    ]
    # the four last-layer cell calls are the only ones whose s0 concat has
    # no [:-1] — unique anchors for appending normalized_alphas
    for anchor, close in [
        ("torch.cat(level_4_dense, dim=1)", "level_8[-1])"),
        ("torch.cat(level_8_dense, dim=1)", "level_16[-1])"),
        ("torch.cat(level_16_dense, dim=1)", "level_32[-1])"),
        ("torch.cat(level_32_dense, dim=1)", "None)"),
    ]:
        i = src.index(anchor)
        j = src.index(close, i)
        patches.append(
            (src[i : j + len(close)],
             src[i : j + len(close)][:-1] + ", normalized_alphas)")
        )
    for old, new in patches:
        assert src.count(old) == 1, old[:60]
        src = src.replace(old, new)
    mod = types.ModuleType("model_search_patched")
    mod.__file__ = "model_search_patched.py"
    exec(compile(src, "model_search_patched.py", "exec"), mod.__dict__)
    return mod


def _convert_mixed_search(variables):
    """Transplant our ModelSearch variables into the (patched) torch
    Model_search state dict. Layout identical to _convert_net_search except
    cells carry per-edge MixedOps and exit heads are per-station."""
    from auto_dynamic_deeplab_tpu.nas import num_edges

    p, s = variables["params"], variables["batch_stats"]
    sd = _SD()

    sd.conv("stem0.0", p["stem0_conv"])
    sd.bn("stem0.1", p["stem0_bn"], s["stem0_bn"])
    sd.conv("stem1.1", p["stem1_conv"])
    sd.bn("stem1.2", p["stem1_bn"], s["stem1_bn"])

    k = num_edges(5)
    idx = 0
    for i in range(ML):
        ncells = 2 if i == 0 else (3 if i == 1 else 4)
        for j in range(ncells):
            fp, fs = p[f"l{i}_c{j}"], s[f"l{i}_c{j}"]
            t = f"cells.{idx}"
            idx += 1
            if "preprocess_down" in fp:
                sd.fred_na(t + ".preprocess_down",
                           fp["preprocess_down"], fs["preprocess_down"])
            if "preprocess_same" in fp:
                sd.rcb_na(t + ".preprocess_same",
                          fp["preprocess_same"], fs["preprocess_same"])
            if "preprocess_up" in fp:
                sd.rcb_na(t + ".preprocess_up",
                          fp["preprocess_up"], fs["preprocess_up"])
            sd.pre_or_fred_na(t + ".pre_preprocess",
                              fp["pre_preprocess"], fs["pre_preprocess"])
            for e in range(k):
                ep, es = fp[f"mixed_{e}"], fs[f"mixed_{e}"]
                for oi, prim in enumerate(PRIMITIVES):
                    tp = f"{t}._ops.{e}._ops.{oi}"
                    if "pool" in prim:
                        sd.bn_na(tp + ".1", es[f"pool_bn_{oi}"])
                    elif prim.startswith("sep"):
                        sd.sep_na(tp, ep[f"ops_{oi}"], es[f"ops_{oi}"])
                    elif prim.startswith("dil"):
                        sd.dil_na(tp, ep[f"ops_{oi}"], es[f"ops_{oi}"])

    for i in range(ML - 2):
        for lv in range(4):
            sd.pre_or_fred_na(
                f"dense_preprocess.{i}.{lv}",
                p[f"dense_preprocess_{i}_{lv}"], s[f"dense_preprocess_{i}_{lv}"],
            )

    # per-station exit heads: our aspp_exit_{station}_{level} <-> torch
    # aspp_exit_{station+1}_{stride}
    for station in (0, 1):
        for lv, stride in enumerate((4, 8, 16, 32)):
            fp, fs = (p[f"aspp_exit_{station}_{lv}"],
                      s[f"aspp_exit_{station}_{lv}"])
            t = f"aspp_exit_{station + 1}_{stride}"
            sd.conv(t + ".conv11.0", fp["conv11"])
            sd.bn(t + ".conv11.1", fp["bn11"], fs["bn11"])
            sd.conv(t + ".conv33.0", fp["conv33"])
            sd.bn(t + ".conv33.1", fp["bn33"], fs["bn33"])
            sd.conv(t + ".conv_p.0", fp["conv_p"])
            sd.bn(t + ".conv_p.1", fp["bn_p"], fs["bn_p"])
            sd.conv(t + ".concate_conv.0", fp["concate_conv"])
            sd.bn(t + ".concate_conv.1", fp["concate_bn"], fs["concate_bn"])
            sd.conv(t + ".final_conv", fp["final_conv"])
    return sd.d


def test_mixed_search_logits_match_reference(monkeypatch):
    from auto_dynamic_deeplab_tpu.models import ModelSearch

    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(torch.Tensor, "half", lambda self, *a, **k: self)
    mod = _load_patched_model_search()
    from modeling import cell_level_search

    # argmax-eval semantics on the torch side too (see block comment above)
    orig_fwd = cell_level_search.MixedOp.forward
    monkeypatch.setattr(
        cell_level_search.MixedOp, "forward",
        lambda self, x, weights, training=True: orig_fwd(self, x, weights, False),
    )

    model = ModelSearch(
        19, num_layers=ML, F=MF, B=5, exit_layer=M_EXIT, remat=False
    )
    x = np.random.RandomState(0).randn(1, 65, 65, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    arch = variables["arch"]
    variables = {**_rand_stats(variables), "arch": arch}

    args = types.SimpleNamespace(sync_bn=False, F=MF, B=5)
    tmodel = mod.Model_search(19, ML, args, exit_layer=M_EXIT,
                              cell=cell_level_search.Cell)
    sd = _convert_mixed_search(variables)
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    real_missing = [
        m for m in missing
        if "num_batches_tracked" not in m and m not in ("alphas", "betas")
    ]
    assert not real_missing, real_missing[:8]
    assert not unexpected, unexpected[:8]
    with torch.no_grad():
        tmodel.betas.data[:ML] = torch.from_numpy(
            np.array(arch["betas"], np.float32, copy=True))
        tmodel.alphas.data[:] = torch.from_numpy(
            np.array(arch["alphas"], np.float32, copy=True))

    tmodel.eval()
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
    theirs = [np.transpose(t.numpy(), (0, 2, 3, 1)) for t in theirs]

    ours = [
        np.asarray(o)
        for o in model.apply(variables, jnp.asarray(x), train=False)
    ]
    assert len(ours) == len(theirs) == 2
    for k, (a, b) in enumerate(zip(ours, theirs)):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3,
                                   err_msg=f"exit {k}")
