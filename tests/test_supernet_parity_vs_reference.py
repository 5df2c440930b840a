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
