"""Golden end-to-end parity: our ADD vs the reference PyTorch ADD.

We import the reference implementation from /root/reference (read-only),
copy our flax-initialized weights into it, and require eval-mode per-exit
logits to agree within the reference's own parity tolerance
(sync_batchnorm/unittest.py:24 → 1e-3).
"""
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

from auto_dynamic_deeplab_tpu.models import ADD
from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE, NETWORK_ARCH, PRIMITIVES

F_SMALL = 4
B = 5


def _rand_stats(variables, seed=7):
    rng = np.random.RandomState(seed)

    def randomize(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        arr = rng.randn(*leaf.shape).astype(np.float32) * 0.3
        if name == "var":
            arr = np.abs(arr) + 0.5
        return jnp.asarray(arr)

    stats = jax.tree_util.tree_map_with_path(randomize, variables["batch_stats"])

    def randomize_params(path, leaf):
        return jnp.asarray(rng.randn(*leaf.shape).astype(np.float32) * 0.1)

    params = jax.tree_util.tree_map_with_path(randomize_params, variables["params"])
    return {"params": params, "batch_stats": stats}


class _StateDict:
    def __init__(self):
        self.d = {}

    def conv(self, tkey, fparams):
        w = np.transpose(np.asarray(fparams["kernel"]), (3, 2, 0, 1))
        self.d[tkey + ".weight"] = torch.from_numpy(w.copy())
        if "bias" in fparams:
            self.d[tkey + ".bias"] = torch.from_numpy(np.asarray(fparams["bias"]).copy())

    def bn(self, tkey, fparams, fstats):
        self.d[tkey + ".weight"] = torch.from_numpy(np.asarray(fparams["scale"]).copy())
        self.d[tkey + ".bias"] = torch.from_numpy(np.asarray(fparams["bias"]).copy())
        self.d[tkey + ".running_mean"] = torch.from_numpy(np.asarray(fstats["mean"]).copy())
        self.d[tkey + ".running_var"] = torch.from_numpy(np.asarray(fstats["var"]).copy())

    def rcb(self, tprefix, fp, fs):
        """ReLUConvBN: torch Sequential(ReLU, Conv, BN) at .op.1/.op.2."""
        self.conv(tprefix + ".op.1", fp["conv"])
        self.bn(tprefix + ".op.2", fp["bn"], fs["bn"])

    def fred(self, tprefix, fp, fs):
        """(Double)FactorizedReduce: conv_1, conv_2, bn."""
        self.conv(tprefix + ".conv_1", fp["conv1"])
        self.conv(tprefix + ".conv_2", fp["conv2"])
        self.bn(tprefix + ".bn", fp["bn"], fs["bn"])

    def sep(self, tprefix, fp, fs):
        for tidx, fkey in [(1, "dw1"), (2, "pw1"), (5, "dw2"), (6, "pw2")]:
            self.conv(f"{tprefix}.op.{tidx}", fp[fkey])
        self.bn(tprefix + ".op.3", fp["bn1"], fs["bn1"])
        self.bn(tprefix + ".op.7", fp["bn2"], fs["bn2"])

    def dil(self, tprefix, fp, fs):
        self.conv(tprefix + ".op.1", fp["conv"])
        self.bn(tprefix + ".op.2", fp["bn"], fs["bn"])


def _convert(variables, network_arch, C_index, genotype, n):
    p, s = variables["params"], variables["batch_stats"]
    sd = _StateDict()

    sd.conv("stem0.0", p["stems"]["stem0_conv"])
    sd.bn("stem0.1", p["stems"]["stem0_bn"], s["stems"]["stem0_bn"])
    sd.conv("stem1.0", p["stems"]["stem1_conv"])
    sd.bn("stem1.1", p["stems"]["stem1_bn"], s["stems"]["stem1_bn"])
    sd.conv("stem2.1", p["stems"]["stem2_conv"])
    sd.bn("stem2.2", p["stems"]["stem2_bn"], s["stems"]["stem2_bn"])

    ops_row_order = [int(o) for _, o in genotype]
    for i in range(n):
        fp, fs = p[f"cell_{i}"], s[f"cell_{i}"]
        t = f"cells.{i}"
        if "conv1" in fp["preprocess"]:
            sd.fred(t + ".preprocess", fp["preprocess"], fs["preprocess"])
        else:
            sd.rcb(t + ".preprocess", fp["preprocess"], fs["preprocess"])
        if f"pre_0" in fp:  # dense_in
            k = 0
            while f"pre_{k}" in fp:
                sd.rcb(f"{t}.pre_preprocess.{k}", fp[f"pre_{k}"], fs[f"pre_{k}"])
                k += 1
            sd.rcb(t + ".pre_preprocess_1x1", fp["pre_preprocess_1x1"], fs["pre_preprocess_1x1"])
        else:
            sd.rcb(t + ".pre_preprocess", fp["pre_preprocess"], fs["pre_preprocess"])
        if "dense_process" in fp:
            sd.rcb(t + ".dense_process", fp["dense_process"], fs["dense_process"])
        for k, op_idx in enumerate(ops_row_order):
            prim = PRIMITIVES[op_idx]
            if prim.startswith("sep"):
                sd.sep(f"{t}._ops.{k}", fp[f"ops_{k}"], fs[f"ops_{k}"])
            elif prim.startswith("dil"):
                sd.dil(f"{t}._ops.{k}", fp[f"ops_{k}"], fs[f"ops_{k}"])

    sd.conv("low_level_conv.1", p["low_level_conv"]["conv"])
    sd.bn("low_level_conv.2", p["low_level_conv"]["bn"], s["low_level_conv"]["bn"])

    for j in range(1, 6):
        sd.conv(f"aspp.aspp{j}", p["aspp"][f"aspp{j}_conv"])
        sd.bn(f"aspp.aspp{j}_bn", p["aspp"][f"aspp{j}_bn"], s["aspp"][f"aspp{j}_bn"])
    sd.conv("aspp.conv1", p["aspp"]["conv1"])
    sd.bn("aspp.bn1", p["aspp"]["bn1"], s["aspp"]["bn1"])

    sd.conv("decoder._conv.1", p["decoder"]["conv1"])
    sd.bn("decoder._conv.2", p["decoder"]["bn1"], s["decoder"]["bn1"])
    sd.conv("decoder._conv.4", p["decoder"]["conv2"])
    sd.bn("decoder._conv.5", p["decoder"]["bn2"], s["decoder"]["bn2"])
    sd.conv("decoder._conv.7", p["decoder"]["classifier"])

    j = 0
    arch = network_arch
    for c in C_index:
        if arch[c] == arch[-1]:
            continue
        fp, fs = p[f"conv_aspp_{c}"], s[f"conv_aspp_{c}"]
        if "conv1" in fp:
            sd.fred(f"conv_aspp.{j}", fp, fs)
        else:
            sd.rcb(f"conv_aspp.{j}", fp, fs)
        j += 1
    return sd.d


# (C, (H, W)): 65x65 square cases plus one asymmetric odd full-res-shaped
# case (97x193 ~ 1025x2049/10.6) where the resize/padding conventions of the
# odd-size chain (769/1025/2049, (d-1)/2+1 downsampling) actually bite, and
# the C=4 arch (three early exits, all at level 3 != final level 2, so every
# exit goes through a conv_aspp adapter).
@pytest.mark.parametrize(
    "C,size", [(2, (65, 65)), (3, (65, 65)), (4, (97, 193))]
)
def test_add_logits_match_reference(C, size):
    from modeling.ADD import ADD as TorchADD

    cfg = NETWORK_ARCH[C]
    arch, C_index, lll = cfg["path"], cfg["C_index"], cfg["low_level_layer"]
    genotype = AUTODEEPLAB_GENOTYPE

    model = ADD(arch, C_index, genotype, 19, F=F_SMALL, B=B, low_level_layer=lll)
    x = np.random.RandomState(0).randn(1, *size, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables = _rand_stats(variables)
    ours = [np.asarray(o) for o in model.apply(variables, jnp.asarray(x), train=False)]

    args = types.SimpleNamespace(sync_bn=False, F=F_SMALL, B=B)
    tmodel = TorchADD(list(arch), list(C_index), np.asarray(genotype), 19, args, lll)
    sd = _convert(
        variables, arch, C_index, [(int(e), int(o)) for e, o in genotype], len(arch)
    )
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    # everything except num_batches_tracked counters must be covered
    real_missing = [m for m in missing if "num_batches_tracked" not in m]
    assert not real_missing, real_missing[:8]
    assert not unexpected, unexpected[:8]

    tmodel.eval()
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
    theirs = [np.transpose(t.numpy(), (0, 2, 3, 1)) for t in theirs]

    assert len(ours) == len(theirs) == C
    for k, (a, b) in enumerate(zip(ours, theirs)):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3, err_msg=f"exit {k}")


def test_aspp_lite_matches_reference():
    """ASPPLite == torch ASPP_Lite (aspp_train.py:64-85) in eval mode."""
    from modeling.aspp_train import ASPP_Lite as TorchASPPLite

    from auto_dynamic_deeplab_tpu.ops.aspp import ASPPLite

    cin, clow, mid, ncls = 32, 16, 24, 19
    rng = np.random.RandomState(2)
    x = rng.randn(1, 81, 89, cin).astype(np.float32)
    low = rng.randn(1, 161, 177, clow).astype(np.float32)

    model = ASPPLite(mid_channels=mid, num_classes=ncls)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(low), train=False
    )
    variables = _rand_stats(variables)
    ours = np.asarray(
        model.apply(variables, jnp.asarray(x), jnp.asarray(low), train=False)
    )

    tmodel = TorchASPPLite(cin, clow, mid, ncls, torch.nn.BatchNorm2d)
    p, s = variables["params"], variables["batch_stats"]
    sd = _StateDict()
    sd.rcb("_1x1_TL", p["tl"], s["tl"])
    sd.conv("_1x1_BL", p["bl_conv"])
    sd.conv("_1x1_TR", p["tr_conv"])
    sd.conv("_1x1_BR", p["br_conv"])
    missing, unexpected = tmodel.load_state_dict(sd.d, strict=False)
    assert not [m for m in missing if "num_batches_tracked" not in m]
    assert not unexpected

    tmodel.eval()
    with torch.no_grad():
        theirs = tmodel(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()),
            torch.from_numpy(np.transpose(low, (0, 3, 1, 2)).copy()),
        )
    theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)


def test_dynamic_inference_behavior_vs_reference(monkeypatch):
    """Behavioral comparison vs the torch ADD.dynamic_inference (EDM mode,
    ADD.py:379-438), documenting the intentional aspp_size deviation:

    * full depth (EDM confidence above threshold at every early exit): the
      torch dynamic path decodes the final exit exactly like ADD.forward —
      and like ours;
    * early exit: torch computes aspp_size with 2^-level instead of the
      actual stride 2^-(level+2) (ADD.py:383 vs :279), interpolating the
      stride-16 feature to stride-4 before ASPP (16x the area) — its OWN
      dynamic logits diverge from its OWN forward logits. We consistently
      use the forward convention (models/decoded.py:14-17), so our exit-0
      logits match torch's *forward*, not its defective dynamic path.
    """
    from modeling.ADD import ADD as TorchADD

    path, C_index, lll = [1, 2, 2, 2, 3, 2], [1], 0
    genotype = AUTODEEPLAB_GENOTYPE

    model = ADD(path, C_index, genotype, 19, F=F_SMALL, B=B, low_level_layer=lll)
    x = np.random.RandomState(1).randn(1, 65, 65, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables = _rand_stats(variables)
    ours = [np.asarray(o) for o in model.apply(variables, jnp.asarray(x), train=False)]

    args = types.SimpleNamespace(sync_bn=False, F=F_SMALL, B=B)
    tmodel = TorchADD(list(path), list(C_index), np.asarray(genotype), 19, args, lll)
    sd = _convert(
        variables, path, C_index, [(int(e), int(o)) for e, o in genotype], len(path)
    )
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    assert not [m for m in missing if "num_batches_tracked" not in m]
    assert not unexpected

    monkeypatch.setattr(torch.cuda, "synchronize", lambda: None)
    tmodel.eval()
    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        t_fwd = [t.numpy() for t in tmodel(tx)]
        # stub EDMs: constant confidence; torch continues while conf > T
        t_full, exit_full, _, _ = tmodel.dynamic_inference(
            tx, threshold=1.0, confidence="edm", edm=lambda y: torch.tensor(2.0)
        )
        t_early, exit_early, _, _ = tmodel.dynamic_inference(
            tx, threshold=1.0, confidence="edm", edm=lambda y: torch.tensor(0.0)
        )
    t_full, t_early = t_full.numpy(), t_early.numpy()
    assert exit_full == 0 and exit_early == 1

    # full depth: torch dynamic == torch forward final == ours final
    np.testing.assert_allclose(t_full, t_fwd[-1], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.transpose(t_full, (0, 2, 3, 1)), ours[-1], rtol=1e-3, atol=1e-3
    )

    # early exit: the reference's dynamic path diverges from its own forward
    # (the 2^-level aspp_size defect runs ASPP on a 16x-interpolated map);
    # ours matches the forward convention. The divergence is systematic and
    # larger than both the fp parity noise and the parity tolerance, while
    # our exit-0 logits stay within tolerance of the torch *forward*.
    assert t_early.shape == t_fwd[0].shape
    defect_gap = np.abs(t_early - t_fwd[0]).max()
    parity_gap = np.abs(np.transpose(t_fwd[0], (0, 2, 3, 1)) - ours[0]).max()
    assert defect_gap > 1e-3 and defect_gap > 5 * parity_gap, (
        defect_gap, parity_gap,
    )
    np.testing.assert_allclose(
        np.transpose(t_fwd[0], (0, 2, 3, 1)), ours[0], rtol=1e-3, atol=1e-3
    )


@pytest.mark.fast
def test_edm_golden_parity_vs_torch_reference():
    """Our flax EDM == the reference torch EDM (ADD.py:502-525) with the
    same weights: relu -> conv(400->128, 3, s2, p1, no bias) -> relu -> GAP
    -> MLP(128-64-32-1) with interleaved ReLUs."""
    from modeling.ADD import EDM as TorchEDM

    from auto_dynamic_deeplab_tpu.models import EDM

    rng = np.random.RandomState(5)
    x = rng.randn(2, 9, 13, 400).astype(np.float32)

    edm = EDM()
    variables = edm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # randomize so zero-init biases don't mask transpose mistakes
    variables = jax.tree.map(
        lambda a: jnp.asarray(rng.randn(*a.shape).astype(np.float32) * 0.2),
        variables,
    )
    p = jax.device_get(variables["params"])

    t = TorchEDM()
    with torch.no_grad():
        t.conv.weight.copy_(
            torch.from_numpy(np.transpose(p["conv"]["kernel"], (3, 2, 0, 1)))
        )
        for i, fc in enumerate(("fc1", "fc2", "fc3")):
            t.edm[2 * i].weight.copy_(
                torch.from_numpy(p[fc]["kernel"].T.copy())
            )
            t.edm[2 * i].bias.copy_(torch.from_numpy(p[fc]["bias"]))
    t.eval()

    with torch.no_grad():
        want = t(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = np.asarray(edm.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)
