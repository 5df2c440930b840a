"""Train-step invariants:
  * 8-way data-parallel shard_map step == single-device step on the same
    global batch (grad pmean + BN psum make them numerically equivalent),
  * the SGD(+nesterov, +weight-decay) chain matches torch.optim.SGD.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from auto_dynamic_deeplab_tpu.models import ADD
from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE, NETWORK_ARCH
from auto_dynamic_deeplab_tpu.parallel import make_mesh
from auto_dynamic_deeplab_tpu.train import (
    create_train_state,
    lr_schedule,
    make_optimizer,
    make_single_device_train_step,
    make_train_step,
)


# short 6-layer path keeps CPU compile time sane; still exercises dense
# taps, an early exit, FactorizedReduce preprocess, and the shared head.
_PATH, _C_INDEX = [1, 2, 2, 2, 3, 2], [1]


def _model(axis_name):
    return ADD(
        _PATH, _C_INDEX, AUTODEEPLAB_GENOTYPE, 19,
        F=2, B=5, low_level_layer=0, axis_name=axis_name,
    )


def test_sharded_step_equals_single_device(rng):
    """One 8-way data-parallel step == one global-batch step (grad pmean +
    BN psum). Gradients agree to ~2e-4 relative (fp32 reduction-order
    noise through 6 BN'd cells); updates are lr-scaled, hence the atol
    (observed worst case ~4e-4 abs on near-zero weights: psum reduces in a
    different association order than one fused global-batch reduction)."""
    sched = lr_schedule("poly", 0.05, 10, 4)
    tx = make_optimizer(sched, weight_decay=4e-5)

    x = rng.randn(8, 17, 17, 3).astype(np.float32)
    y = rng.randint(0, 19, size=(8, 17, 17)).astype(np.int32)
    batch = {"image": jnp.asarray(x), "label": jnp.asarray(y)}

    single = _model(None)
    state0 = create_train_state(single, jax.random.PRNGKey(0), batch["image"][:1], tx)

    step_1d = make_single_device_train_step(single, tx)
    s1, m1 = step_1d(state0, batch)

    sharded = _model("data")
    mesh = make_mesh()
    state0b = create_train_state(single, jax.random.PRNGKey(0), batch["image"][:1], tx)
    step_8d = make_train_step(sharded, tx, mesh)
    s8, m8 = step_8d(state0b, batch)

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=2e-4)

    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat8 = jax.tree_util.tree_leaves(s8.params)
    assert len(flat1) == len(flat8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2, atol=2e-3)

    stats1 = jax.tree_util.tree_leaves(s1.batch_stats)
    stats8 = jax.tree_util.tree_leaves(s8.batch_stats)
    for a, b in zip(stats1, stats8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-4)


def test_sharded_search_steps_equal_single_device(rng):
    """8-way data-parallel bilevel search steps == single-device steps on
    the same global batch (search.py:144-149 runs search under
    DataParallel+SyncBN; here grads pmean + BN psum over the mesh)."""
    from auto_dynamic_deeplab_tpu.models import ModelNetSearch
    from auto_dynamic_deeplab_tpu.train import make_search_steps
    from auto_dynamic_deeplab_tpu.train.step import make_arch_optimizer

    # 65x65: supernet crops need (d-1) % 64 == 0 (even-dim upsample rule)
    x = rng.randn(8, 65, 65, 3).astype(np.float32)
    y = rng.randint(0, 19, size=(8, 65, 65)).astype(np.int32)
    batch = {"image": jnp.asarray(x), "label": jnp.asarray(y)}

    kw = dict(num_layers=6, F=2, B=5, C_index=(3,), remat=False)
    single = ModelNetSearch(19, AUTODEEPLAB_GENOTYPE, **kw)
    sharded = ModelNetSearch(19, AUTODEEPLAB_GENOTYPE, axis_name="data", **kw)

    v = single.init(jax.random.PRNGKey(0), batch["image"][:1], train=True)
    params, stats, arch = v["params"], v["batch_stats"], v["arch"]

    w_tx = make_optimizer(lr_schedule("poly", 0.05, 10, 4), weight_decay=3e-4)
    a_tx = make_arch_optimizer(3e-3, weight_decay=1e-3)
    w_opt, a_opt = w_tx.init(params), a_tx.init(arch)

    w1, a1 = make_search_steps(single, w_tx, a_tx)
    w8, a8 = make_search_steps(sharded, w_tx, a_tx, mesh=make_mesh())

    p1, st1, _, l1 = w1(params, stats, arch, w_opt, batch)
    p8, st8, _, l8 = w8(params, stats, arch, w_opt, batch)
    assert float(l1) == pytest.approx(float(l8), rel=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2, atol=2e-3)
    for a, b in zip(jax.tree_util.tree_leaves(st1), jax.tree_util.tree_leaves(st8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-4)

    ar1, _, _, _ = a1(p1, st1, arch, a_opt, batch)
    ar8, _, _, _ = a8(p8, st8, arch, a_opt, batch)
    for a, b in zip(jax.tree_util.tree_leaves(ar1), jax.tree_util.tree_leaves(ar8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2, atol=2e-3)


def test_sgd_chain_matches_torch():
    w0 = np.array([1.5, -2.0, 0.5], np.float32)
    lr, momentum, wd = 0.05, 0.9, 4e-5

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.SGD([tw], lr=lr, momentum=momentum, weight_decay=wd, nesterov=True)

    tx = make_optimizer(lambda step: lr, momentum=momentum, weight_decay=wd)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)

    for i in range(5):
        # loss = 0.5 * ||w||^2 + sum(w * i) → grad = w + i
        topt.zero_grad()
        tloss = 0.5 * (tw ** 2).sum() + (tw * i).sum()
        tloss.backward()
        topt.step()

        grads = {"w": params["w"] + i}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        np.testing.assert_allclose(
            np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-5, atol=1e-7
        )


def test_arch_adam_chain_matches_torch():
    """make_arch_optimizer == torch.optim.Adam(weight_decay=wd): L2 decay is
    added to the gradient BEFORE the Adam moments (search.py:99-102) — a
    different trajectory from optax.adamw's decoupled decay."""
    from auto_dynamic_deeplab_tpu.train.step import make_arch_optimizer

    w0 = np.array([0.3, -1.2, 2.5], np.float32)
    lr, wd = 3e-3, 1e-3

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tw], lr=lr, betas=(0.9, 0.999), weight_decay=wd)

    tx = make_arch_optimizer(lr, weight_decay=wd)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)

    for i in range(8):
        topt.zero_grad()
        tloss = 0.5 * (tw ** 2).sum() + (tw * float(i)).sum()
        tloss.backward()
        topt.step()

        grads = {"w": params["w"] + i}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        np.testing.assert_allclose(
            np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-5, atol=1e-6
        )

    # sanity: adamw (decoupled) diverges from this trajectory
    txw = optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=wd)
    pw = {"w": jnp.asarray(w0)}
    sw = txw.init(pw)
    for i in range(8):
        up, sw = txw.update({"w": pw["w"] + i}, sw, pw)
        pw = optax.apply_updates(pw, up)
    assert not np.allclose(np.asarray(pw["w"]), np.asarray(params["w"]), atol=1e-7)


@pytest.mark.fast
def test_make_data_mesh_divides_batch():
    """make_data_mesh never builds a mesh wider than the batch: a wider mesh
    makes the step loops drop every batch as a ragged tail (silent no-op)."""
    from auto_dynamic_deeplab_tpu.parallel.mesh import make_data_mesh

    assert jax.device_count() == 8
    assert make_data_mesh(16).shape["data"] == 8
    assert make_data_mesh(8).shape["data"] == 8
    assert make_data_mesh(4).shape["data"] == 4
    assert make_data_mesh(6).shape["data"] == 2
    assert make_data_mesh(3) is None  # gcd(8, 3) == 1
    assert make_data_mesh(1) is None


def test_class_leading_step_matches_default(rng):
    """class_leading=True runs the logits tail + CE in (N, C, H, W); the
    resize math is bit-identical (resize_bilinear_cl) and the CE is the same
    reduction over a transposed layout, so loss and parameter updates must
    match the NHWC step to fp32 noise."""
    sched = lr_schedule("poly", 0.05, 10, 4)
    x = rng.randn(2, 17, 17, 3).astype(np.float32)
    y = rng.randint(0, 19, size=(2, 17, 17)).astype(np.int32)
    y[0, :4] = 255  # exercise ignore_index masking in both layouts
    batch = {"image": jnp.asarray(x), "label": jnp.asarray(y)}
    weight = jnp.asarray(rng.rand(19).astype(np.float32) + 0.5)

    model = _model(None)
    tx = make_optimizer(sched, weight_decay=4e-5)
    s0a = create_train_state(model, jax.random.PRNGKey(0), batch["image"][:1], tx)
    s0b = create_train_state(model, jax.random.PRNGKey(0), batch["image"][:1], tx)

    step_nhwc = make_single_device_train_step(model, tx, weight)
    step_cl = make_single_device_train_step(model, tx, weight, class_leading=True)
    sa, ma = step_nhwc(s0a, batch)
    sb, mb = step_cl(s0b, batch)

    assert float(ma["loss"]) == pytest.approx(float(mb["loss"]), rel=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(sa.params), jax.tree_util.tree_leaves(sb.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)
