"""Smoke + structure tests for the decoded models (ADD / baseline / AutoDeepLab)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from auto_dynamic_deeplab_tpu.models import (
    ADD,
    EDM,
    AutoDeepLab,
    BaselineModel,
    edge_op_assignment,
)
from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE, NETWORK_ARCH

F_SMALL = 4  # keep CPU tests fast; channel math scales linearly in F


def _build(model, x):
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return variables


def test_edge_op_assignment_reference_quirk():
    """Rows [19,7],[18,5] are consumed in ascending-edge order: edge 18 gets
    the op from row [19,7] (see models/cell.py docstring)."""
    rows = tuple((int(e), int(o)) for e, o in AUTODEEPLAB_GENOTYPE)
    assignment = dict(edge_op_assignment(rows))
    assert assignment[18] == 7  # dil_conv_5x5 from row [19, 7]
    assert assignment[19] == 5  # sep_conv_5x5 from row [18, 5]
    assert sorted(assignment) == [0, 1, 2, 3, 5, 8, 11, 13, 18, 19]


@pytest.mark.parametrize("C", [2, 3])
def test_add_forward_shapes(C):
    cfg = NETWORK_ARCH[C]
    model = ADD(
        cfg["path"], cfg["C_index"], AUTODEEPLAB_GENOTYPE, 19,
        F=F_SMALL, B=5, low_level_layer=cfg["low_level_layer"],
    )
    x = jnp.zeros((1, 65, 65, 3), jnp.float32)
    variables = _build(model, x)
    outs = model.apply(variables, x, train=False)
    assert len(outs) == C
    for y in outs:
        assert y.shape == (1, 65, 65, 19)
        assert y.dtype == jnp.float32


def test_add_get_feature_channels():
    cfg = NETWORK_ARCH[2]
    model = ADD(
        cfg["path"], cfg["C_index"], AUTODEEPLAB_GENOTYPE, 19,
        F=F_SMALL, B=5, low_level_layer=0,
    )
    x = jnp.zeros((1, 65, 65, 3), jnp.float32)
    variables = _build(model, x)
    logits, feature = model.apply(variables, x, train=False, method="get_feature")
    assert logits.shape == (1, 65, 65, 19)
    # exit layer 5, level arch[5]=2 → FB * 4 channels (400 at F=20, B=5)
    assert feature.shape[-1] == F_SMALL * 5 * 4
    # EDM consumes the feature directly
    edm = EDM()
    ev = edm.init(jax.random.PRNGKey(1), feature)
    conf = edm.apply(ev, feature)
    assert conf.shape == (1, 1)


def test_baseline_and_autodeeplab():
    cfg = NETWORK_ARCH[2]
    x = jnp.zeros((1, 65, 65, 3), jnp.float32)

    base = BaselineModel(
        cfg["path"], cfg["C_index"], AUTODEEPLAB_GENOTYPE, 19, F=F_SMALL, B=5
    )
    bv = _build(base, x)
    outs = base.apply(bv, x, train=False)
    assert len(outs) == 2 and outs[0].shape == (1, 65, 65, 19)

    adl_cfg = NETWORK_ARCH["autodeeplab"]
    adl = AutoDeepLab(
        adl_cfg["path"], AUTODEEPLAB_GENOTYPE, 19, F=F_SMALL, B=5,
        low_level_layer=adl_cfg["low_level_layer"],
    )
    av = _build(adl, x)
    outs = adl.apply(av, x, train=False)
    assert len(outs) == 1 and outs[0].shape == (1, 65, 65, 19)


def test_add_gradients_flow_to_all_exits():
    """Joint multi-exit loss must reach every parameter that should train,
    including the shared head (structural sharing, SURVEY.md §7)."""
    cfg = NETWORK_ARCH[2]
    model = ADD(
        cfg["path"], cfg["C_index"], AUTODEEPLAB_GENOTYPE, 19, F=F_SMALL, B=5
    )
    x = jnp.asarray(np.random.RandomState(0).randn(2, 33, 33, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)

    def loss_fn(params):
        outs, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return sum(jnp.mean(jnp.square(o)) for o in outs) / len(outs)

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    zero = [jax.tree_util.keystr(p) for p, g in flat if float(jnp.abs(g).max()) == 0.0]
    # The shared aspp/decoder and every cell must receive gradient.
    assert not any("aspp" in k or "decoder" in k for k in zero), zero[:5]
    touched_cells = {
        int(jax.tree_util.keystr(p).split("cell_")[1].split("'")[0].split('"')[0].rstrip("]/").split("/")[0])
        for p, g in flat
        if "cell_" in jax.tree_util.keystr(p) and float(jnp.abs(g).max()) > 0
    }
    assert touched_cells == set(range(12)), touched_cells


@pytest.mark.parametrize("n", [3, 4, 5])
def test_add_short_dense_paths(n):
    """Short decoded paths (n < 6) overlap the dense-cell index ranges
    (dense_in = i>=3, dense_out = i<n-2); run_cells must branch on the same
    predicates as the constructor. The reference hardcodes n=12 and crashes
    here — full-chain search at small scale decodes such paths."""
    import numpy as np

    from auto_dynamic_deeplab_tpu.models import ADD
    from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE

    path = [1, 2, 2, 3, 3][:n]
    c_index = [1] if n > 2 else [0]
    model = ADD(path, c_index, AUTODEEPLAB_GENOTYPE, 19, F=2, B=5,
                low_level_layer=0, axis_name=None)
    x = jnp.zeros((1, 33, 33, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    outs = model.apply(variables, x, train=False)
    assert [tuple(o.shape) for o in outs] == [(1, 33, 33, 19)] * 2
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)
    logits, feat = model.apply(variables, x, train=False, method="get_feature")
    assert logits.shape == (1, 33, 33, 19)
