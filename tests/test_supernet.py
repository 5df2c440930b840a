"""Supernet (cell+path and path-only) structure, gradients, bilevel search."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from auto_dynamic_deeplab_tpu.data import DataLoader, SyntheticSegmentation
from auto_dynamic_deeplab_tpu.models import ModelNetSearch, ModelSearch, normalize_betas
from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE
from auto_dynamic_deeplab_tpu.nas.decode import normalize_betas as normalize_betas_np
from auto_dynamic_deeplab_tpu.train.search_trainer import SearchConfig, SearchTrainer

# 65x65 keeps every trellis level odd (the reference's 321-crop invariant).
# Non-zero input matters: with affine-free BNs, an all-zero input collapses
# every activation (and hence every gradient) to exactly zero.
X = jnp.asarray(np.random.RandomState(7).randn(2, 65, 65, 3), jnp.float32)


def test_normalize_betas_matches_host_decoder(rng):
    b = rng.randn(12, 4, 3).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(normalize_betas(jnp.asarray(b))),
        normalize_betas_np(b),
        rtol=1e-5, atol=1e-6,
    )


def test_model_search_shapes_and_arch_collection():
    m = ModelSearch(19, num_layers=6, F=2, B=5, exit_layer=3, remat=False)
    v = m.init(jax.random.PRNGKey(0), X, train=True)
    assert set(v) == {"arch", "params", "batch_stats"}
    assert v["arch"]["alphas"].shape == (20, 8)
    assert v["arch"]["betas"].shape == (6, 4, 3)
    outs = m.apply(v, X, train=False)
    assert [tuple(o.shape) for o in outs] == [(2, 65, 65, 19)] * 2


def test_model_net_search_betas_only():
    m = ModelNetSearch(19, AUTODEEPLAB_GENOTYPE, num_layers=6, F=2, B=5,
                       C_index=(3,), remat=False)
    v = m.init(jax.random.PRNGKey(0), X, train=True)
    assert "alphas" not in v["arch"]
    outs = m.apply(v, X, train=False)
    assert len(outs) == 2


def test_arch_gradients_nonzero():
    """Both alphas and betas must receive gradient through the trellis."""
    m = ModelSearch(19, num_layers=6, F=2, B=5, exit_layer=3, remat=False)
    v = m.init(jax.random.PRNGKey(0), X, train=True)
    y = jnp.asarray(np.random.RandomState(0).randint(0, 19, (2, 65, 65)))

    def loss_fn(arch):
        outs, _ = m.apply(
            {"params": v["params"], "batch_stats": v["batch_stats"], "arch": arch},
            X, train=True, mutable=["batch_stats"],
        )
        from auto_dynamic_deeplab_tpu.train.loss import multi_exit_cross_entropy
        return multi_exit_cross_entropy(outs, y)

    g = jax.grad(loss_fn)(v["arch"])
    assert float(jnp.abs(g["alphas"]).max()) > 0
    assert float(jnp.abs(g["betas"]).max()) > 0
    # invalid beta transitions stay exactly zero-gradient (masked softmax)
    assert float(jnp.abs(g["betas"][0, 0, 0])) == 0
    assert float(jnp.abs(g["betas"][0, 1:, :]).max()) == 0


def test_mixed_op_eval_argmax():
    """Eval runs ONLY the argmax op, unweighted (cell_level_search.py:24-29):
    output is invariant to every non-argmax weight, ignores the argmax
    weight's magnitude, and is exactly zero when argmax selects 'none'."""
    from auto_dynamic_deeplab_tpu.models.supernet_cell import MixedOp

    rng = np.random.RandomState(3)
    op = MixedOp(C=4)
    x = jnp.asarray(rng.randn(1, 9, 9, 4), jnp.float32)
    w = jnp.asarray(jax.nn.softmax(jnp.asarray(rng.randn(8))))
    v = op.init(jax.random.PRNGKey(0), x, w, True)

    k = int(jnp.argmax(w))
    out = op.apply(v, x, w, False)
    # (a) independent of non-argmax weights
    w2 = w.at[(k + 1) % 8].set(w[(k + 1) % 8] * 0.5)
    w2 = jnp.where(jnp.arange(8) == k, w.max() + 1.0, w2)  # keep argmax at k
    np.testing.assert_array_equal(np.asarray(out), np.asarray(op.apply(v, x, w2, False)))
    # (b) unweighted: explicit one-hot gives the same output
    onehot = jnp.zeros(8).at[k].set(1.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(op.apply(v, x, onehot, False)))
    # (c) argmax == 'none' (index 0) → exact zero (reference runs Zero)
    w_none = jnp.zeros(8).at[0].set(5.0)
    assert float(jnp.abs(op.apply(v, x, w_none, False)).max()) == 0.0
    # (d) train mode still mixes: output differs from the argmax-only eval
    out_train, _ = op.apply(v, x, w, True, mutable=["batch_stats"])
    assert not np.allclose(np.asarray(out_train), np.asarray(out))


def test_search_trainer_bilevel(tmp_path):
    m = ModelNetSearch(19, AUTODEEPLAB_GENOTYPE, num_layers=6, F=2, B=5,
                       C_index=(3,), remat=False)
    ds = SyntheticSegmentation(length=8, crop_size=(65, 65))
    la = DataLoader(ds, batch_size=4, num_workers=2)
    lb = DataLoader(SyntheticSegmentation(length=8, crop_size=(65, 65), seed=3),
                    batch_size=4, num_workers=2)
    lv = DataLoader(SyntheticSegmentation(length=2, crop_size=(65, 65), seed=4),
                    batch_size=2, shuffle=False, drop_last=False)
    cfg = SearchConfig(epochs=2, alpha_epoch=1, eval_interval=2,
                       run_dir=str(tmp_path), lr=0.01)
    trainer = SearchTrainer(m, la, lb, lv, cfg)
    betas_before = np.asarray(trainer.arch["betas"]).copy()
    l0 = trainer.training(0)   # weights only
    betas_mid = np.asarray(trainer.arch["betas"]).copy()
    np.testing.assert_array_equal(betas_before, betas_mid)  # pre-alpha_epoch
    l1 = trainer.training(1)   # bilevel
    assert not np.allclose(betas_mid, np.asarray(trainer.arch["betas"]))
    assert np.isfinite([l0, l1]).all()

    result = trainer.validation(1)
    assert len(result["miou"]) == 2
    decoded = trainer.decode_and_save(1)
    assert decoded["path"].shape == (6,)
    assert decoded["path"][0] in (0, 1)


def test_multi_exit_loss_sum_reduce():
    """reduce='sum' (search_layer.py:190) == n_exits * reduce='mean'."""
    from auto_dynamic_deeplab_tpu.train.loss import multi_exit_cross_entropy

    rng = np.random.RandomState(0)
    logits = [jnp.asarray(rng.normal(size=(2, 9, 9, 5)).astype(np.float32))
              for _ in range(2)]
    target = jnp.asarray(rng.randint(0, 5, size=(2, 9, 9)))
    mean = multi_exit_cross_entropy(logits, target, reduce="mean")
    total = multi_exit_cross_entropy(logits, target, reduce="sum")
    np.testing.assert_allclose(float(total), 2.0 * float(mean), rtol=1e-6)


def test_search_layer_driver_end_to_end(tmp_path):
    """Dedicated 2-exit driver (search_layer.py parity): one bilevel epoch
    on synthetic data decodes a valid path and moves the betas."""
    from auto_dynamic_deeplab_tpu.cli.search_layer import main

    result = main([
        "--dataset", "synthetic",
        "--network", "baseline_path",
        "--num-layers", "6", "--F", "2", "--B", "5",
        "--exit-layer", "3",
        "--epochs", "2", "--alpha-epoch", "1", "--eval-interval", "2",
        "--batch-size", "4", "--workers", "2",
        "--synthetic-length", "8", "--synthetic-crop", "65", "65",
        "--run-dir", str(tmp_path), "--no-dp", "--no-remat",
    ])
    assert len(result["miou"]) == 2
    assert np.isfinite(result["train_loss"])


def test_mixed_search_steps_jit():
    """Jitted bilevel steps on the MIXED (cell+path) supernet — regression
    for the reduce_window-max init-value bug: jit(value_and_grad) through
    max_pool failed with "Linearization failed..." while eager grad passed,
    so only eager-grad coverage existed for mixed cells (search.py:190-224
    runs exactly this jitted path)."""
    from auto_dynamic_deeplab_tpu.train import lr_schedule, make_search_steps
    from auto_dynamic_deeplab_tpu.train.step import (
        make_arch_optimizer,
        make_optimizer,
    )

    m = ModelSearch(5, num_layers=6, F=2, B=2, exit_layer=3, remat=False)
    x = X[:1]
    y = jnp.asarray(np.random.RandomState(3).randint(0, 5, (1, 65, 65)))
    v = m.init(jax.random.PRNGKey(0), x, train=True)
    params, arch, bs = v["params"], v["arch"], v["batch_stats"]
    w_tx = make_optimizer(lr_schedule("poly", 0.025, 2, 2), weight_decay=3e-4)
    a_tx = make_arch_optimizer(3e-3, 1e-3)
    ws, as_ = make_search_steps(m, w_tx, a_tx)
    batch = {"image": x, "label": y}
    p2, bs2, _, loss = ws(params, bs, arch, w_tx.init(params), batch)
    assert np.isfinite(float(loss))
    a2, _, _, aloss = as_(p2, bs2, arch, a_tx.init(arch), batch)
    assert np.isfinite(float(aloss))
    assert not np.allclose(np.asarray(arch["alphas"]), np.asarray(a2["alphas"]))


# ------------------------------------------------------------- banked cells


def _bank_cell_tree(tree, B):
    """Restack a cell's per-edge mixed_{e} subtrees into bank_{i} stacked
    lanes (the BankedMixedOp param layout)."""
    if not isinstance(tree, dict):
        return tree
    if "mixed_0" in tree:
        out = {k: v for k, v in tree.items() if not k.startswith("mixed_")}
        offset = 0
        for i in range(B):
            n = 2 + i
            lanes = [tree[f"mixed_{offset + j}"] for j in range(n)]
            out[f"bank_{i}"] = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *lanes)
            offset += n
        return out
    return {k: _bank_cell_tree(v, B) for k, v in tree.items()}


def test_banked_mixed_op_lane_parity():
    """BankedMixedOp lane e == plain MixedOp run with lane-e params, in both
    train (incl. BN batch_stats updates) and eval (argmax-only) modes."""
    from auto_dynamic_deeplab_tpu.models.supernet_cell import BankedMixedOp, MixedOp

    rng = np.random.RandomState(5)
    E, C = 3, 4
    xs = jnp.asarray(rng.randn(E, 2, 9, 9, C), jnp.float32)
    ws = jnp.asarray(jax.nn.softmax(jnp.asarray(rng.randn(E, 8)), axis=-1))
    bank = BankedMixedOp(C=C)
    v = bank.init(jax.random.PRNGKey(1), xs, ws, True)
    out_tr, upd = bank.apply(v, xs, ws, True, mutable=["batch_stats"])
    out_ev = bank.apply(v, xs, ws, False)

    single = MixedOp(C=C)
    for e in range(E):
        lane = jax.tree.map(lambda a: a[e], v)
        y_tr, upd_e = single.apply(lane, xs[e], ws[e], True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(out_tr[e]), np.asarray(y_tr),
                                   rtol=1e-5, atol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a[e]), np.asarray(b), rtol=1e-5, atol=1e-6),
            upd["batch_stats"], upd_e["batch_stats"],
        )
        y_ev = single.apply(lane, xs[e], ws[e], False)
        np.testing.assert_allclose(np.asarray(out_ev[e]), np.asarray(y_ev),
                                   rtol=1e-5, atol=1e-5)


def _scan_cell_tree(tree, B):
    """Banked layout -> scan layout: stack the B banks zero-padded to B+2
    lanes under blocks/bank (the lax.scan'd BankedMixedOp layout). Padded
    lanes carry zero mixing weight, so zero params are never observable."""
    if not isinstance(tree, dict):
        return tree
    if "bank_0" in tree:
        out = {k: v for k, v in tree.items() if not k.startswith("bank_")}
        lanes = B + 2

        def padded(i):
            def f(a):
                width = [(0, lanes - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
                return jnp.pad(a, width)
            return jax.tree.map(f, tree[f"bank_{i}"])

        out["blocks"] = {"bank": jax.tree.map(
            lambda *xs: jnp.stack(xs, 0), *[padded(i) for i in range(B)]
        )}
        return out
    return {k: _scan_cell_tree(v, B) for k, v in tree.items()}


@pytest.mark.parametrize("mode", ["banked", "scan"])
def test_mixed_exec_supernet_matches_edges(mode):
    """'banked' and 'scan' mixed-cell execution are the SAME network as the
    per-edge form: transplanting the per-edge params (stacked per block,
    zero-padded to scan lanes) reproduces its outputs, and the lowered
    graph is substantially smaller."""
    kw = dict(num_layers=6, F=2, B=2, exit_layer=3, remat=False)
    m = ModelSearch(5, **kw)
    mb = ModelSearch(5, mixed_exec=mode, **kw)
    x = X[:1]
    v = m.init(jax.random.PRNGKey(0), x, train=True)

    def convert(tree):
        banked = _bank_cell_tree(tree, 2)
        return banked if mode == "banked" else _scan_cell_tree(banked, 2)

    vb = {
        "arch": v["arch"],
        "params": convert(v["params"]),
        "batch_stats": convert(v["batch_stats"]),
    }
    # layouts agree leaf-for-leaf with the real init of that mode
    vb_init = mb.init(jax.random.PRNGKey(0), x, train=True)
    assert jax.tree.structure(vb) == jax.tree.structure(vb_init)
    assert jax.tree.all(jax.tree.map(lambda a, b: a.shape == b.shape, vb, vb_init))

    for train in (True, False):
        outs = m.apply(v, x, train=train, mutable=["batch_stats"] if train else False)
        outs_b = mb.apply(vb, x, train=train, mutable=["batch_stats"] if train else False)
        if train:
            outs, outs_b = outs[0], outs_b[0]
        # Tolerance: both modes reassociate the block sum and batch the
        # convs differently; through 6 trellis layers of affine-free BNs
        # that drifts to ~5e-4 (banked) / ~3e-3 (scan, wider lane batching)
        # max abs on logits of order 2-4 (measured) — float noise, not
        # semantics (a wrong transplant errs at O(1)).
        tol = 2e-3 if mode == "banked" else 5e-3
        for o, ob in zip(outs, outs_b):
            np.testing.assert_allclose(np.asarray(o), np.asarray(ob),
                                       rtol=tol, atol=tol)

    # the point of both modes: a much smaller traced/lowered program.
    # At B=2 the factors are small (2-3 edges/block); the real B=5 config
    # shrinks ~4x (banked) / ~20x (scan) — asserted directionally here.
    def lowered_size(mod, vars_):
        f = jax.jit(lambda vv, xx: mod.apply(vv, xx, train=False))
        return len(f.lower(vars_, x).as_text())

    s_plain = lowered_size(m, v)
    s_mode = lowered_size(mb, vb)
    assert s_mode < 0.75 * s_plain, (s_mode, s_plain)


def test_scan_supernet_bilevel_grads():
    """The scan form must TRAIN: jitted bilevel weight+arch steps produce
    finite losses and move the alphas (grads flow through the lax.scan,
    the padded lanes, and the alpha table)."""
    from auto_dynamic_deeplab_tpu.train import lr_schedule, make_search_steps
    from auto_dynamic_deeplab_tpu.train.step import (
        make_arch_optimizer,
        make_optimizer,
    )

    m = ModelSearch(5, num_layers=6, F=2, B=2, exit_layer=3, remat=False,
                    mixed_exec="scan")
    x = X[:1]
    y = jnp.asarray(np.random.RandomState(3).randint(0, 5, (1, 65, 65)))
    v = m.init(jax.random.PRNGKey(0), x, train=True)
    params, arch, bs = v["params"], v["arch"], v["batch_stats"]
    w_tx = make_optimizer(lr_schedule("poly", 0.025, 2, 2), weight_decay=3e-4)
    a_tx = make_arch_optimizer(3e-3, 1e-3)
    ws, as_ = make_search_steps(m, w_tx, a_tx)
    batch = {"image": x, "label": y}
    p2, bs2, _, loss = ws(params, bs, arch, w_tx.init(params), batch)
    assert np.isfinite(float(loss))
    a2, _, _, aloss = as_(p2, bs2, arch, a_tx.init(arch), batch)
    assert np.isfinite(float(aloss))
    assert not np.allclose(np.asarray(arch["alphas"]), np.asarray(a2["alphas"]))


def test_search_trainer_resume(tmp_path):
    """resume='auto' restores params/arch/optimizers/epoch from the newest
    committed checkpoint (reference search --resume, search.py:104-116)."""
    def build(resume=None):
        m = ModelNetSearch(19, AUTODEEPLAB_GENOTYPE, num_layers=6, F=2, B=5,
                           C_index=(3,), remat=False)
        la = DataLoader(SyntheticSegmentation(length=4, crop_size=(65, 65)),
                        batch_size=2, num_workers=2)
        lb = DataLoader(SyntheticSegmentation(length=4, crop_size=(65, 65), seed=3),
                        batch_size=2, num_workers=2)
        lv = DataLoader(SyntheticSegmentation(length=2, crop_size=(65, 65), seed=4),
                        batch_size=2, shuffle=False, drop_last=False)
        cfg = SearchConfig(epochs=2, alpha_epoch=0, eval_interval=1,
                           run_dir=str(tmp_path), lr=0.01, resume=resume)
        return SearchTrainer(m, la, lb, lv, cfg)

    first = build()
    first.training(0)
    first.validation(0)  # commits the checkpoint (incl. optimizer states)

    resumed = build(resume="auto")
    assert resumed.start_epoch == 1
    np.testing.assert_array_equal(
        np.asarray(resumed.arch["betas"]), np.asarray(first.arch["betas"])
    )
    for a, b in zip(jax.tree_util.tree_leaves(resumed.params),
                    jax.tree_util.tree_leaves(first.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state (SGD momentum buffers) restored, not re-initialized
    la_, lb_ = jax.tree_util.tree_leaves(resumed.w_opt), jax.tree_util.tree_leaves(first.w_opt)
    assert len(la_) == len(lb_)
    assert any(np.abs(np.asarray(x)).max() > 0 for x in la_ if hasattr(x, "shape"))
    # a cold build without resume starts from epoch 0 with fresh arch
    cold = build()
    assert cold.start_epoch == 0


def test_exit_station_out_of_range_raises():
    """Exit stations beyond the trellis must fail at construction with a
    clear message, not as an IndexError mid-validation (r4 regression: the
    default station 5 with --num-layers 4 built an unreachable exit)."""
    import pytest

    from auto_dynamic_deeplab_tpu.models import ModelNetSearch
    from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE

    model = ModelNetSearch(
        19, AUTODEEPLAB_GENOTYPE, num_layers=4, F=2, B=2, C_index=(5,)
    )
    with pytest.raises(ValueError, match="exit station"):
        model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 65, 65, 3), jnp.float32),
            train=False,
        )


@pytest.mark.parametrize("policy", ["dots", "offload_dots"])
def test_remat_policy_same_numerics(policy):
    """remat_policy only changes WHAT the remat'd cells save (recompute vs
    keep vs offload conv/matmul results) — forward outputs and weight
    gradients must be bit-comparable to plain remat. 'offload_dots' is the
    single-chip fallback for configs whose bilevel step OOMs HBM under full
    remat (SCALE_r03: 12L F=20 B=5 321x321 mixed supernet)."""
    kw = dict(num_layers=4, F=2, B=2, exit_layer=2)
    m0 = ModelSearch(5, remat=True, **kw)
    mp = ModelSearch(5, remat=True, remat_policy=policy, **kw)
    x = X[:1]
    v = m0.init(jax.random.PRNGKey(0), x, train=True)

    def loss(model, params):
        outs, _ = model.apply(
            {**v, "params": params}, x, train=True, mutable=["batch_stats"]
        )
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    try:
        l_p, g_p = jax.value_and_grad(lambda p: loss(mp, p))(v["params"])
        l_p = float(l_p)
    except Exception as e:  # pragma: no cover - backend-dependent
        if policy == "offload_dots":
            pytest.skip(f"host offload unsupported on this backend: {e}")
        raise
    l_0, g_0 = jax.value_and_grad(lambda p: loss(m0, p))(v["params"])
    assert np.isfinite(l_p)
    np.testing.assert_allclose(l_p, float(l_0), rtol=1e-5)
    flat0, flatp = jax.tree.leaves(g_0), jax.tree.leaves(g_p)
    for a, b in zip(flat0, flatp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_remat_policy_unknown_raises():
    m = ModelSearch(5, num_layers=6, F=2, B=2, exit_layer=3,
                    remat=True, remat_policy="everything")
    with pytest.raises(ValueError, match="remat_policy"):
        m.init(jax.random.PRNGKey(0), X[:1], train=True)


def test_remat_policy_validated_without_remat():
    """remat_policy is validated even when remat=False: a policy that is
    silently ignored (ADVICE r4) would hand a caller expecting offload-based
    memory savings plain no-remat behavior with no warning."""
    for policy in ("everything", "dots"):
        m = ModelSearch(5, num_layers=6, F=2, B=2, exit_layer=3,
                        remat=False, remat_policy=policy)
        with pytest.raises(ValueError, match="remat"):
            m.init(jax.random.PRNGKey(0), X[:1], train=True)


def test_remat_policy_actually_saves_convs():
    """The 'dots' policy must SAVE conv results, not just matmuls: the cells
    lower to conv_general_dilated (ops/packed.py), so a dot_general-only
    policy (jax's *_with_no_batch_dims family) saves ~nothing — numerics
    tests cannot catch that (ADVICE r4 medium). Detect it structurally: with
    convs saved, the backward pass recomputes fewer convs, so the grad HLO
    contains strictly fewer convolution ops than under save-nothing remat."""
    kw = dict(num_layers=4, F=2, B=2, exit_layer=2)

    def conv_count(policy):
        m = ModelSearch(5, remat=True, remat_policy=policy, **kw)
        v = m.init(jax.random.PRNGKey(0), X[:1], train=True)

        def loss(params):
            outs, _ = m.apply(
                {**v, "params": params}, X[:1], train=True,
                mutable=["batch_stats"],
            )
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

        hlo = jax.jit(jax.grad(loss)).lower(v["params"]).as_text()
        return hlo.count("convolution(")

    n_none, n_dots = conv_count(None), conv_count("dots")
    assert n_dots < n_none, (n_dots, n_none)
