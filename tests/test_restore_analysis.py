"""copy_state_dict tolerant restore, entropy-signal study, and
preemption-safe auto-resume (checkpoint -> new process -> continue)."""
import jax
import jax.numpy as jnp
import numpy as np

from auto_dynamic_deeplab_tpu.data import DataLoader, SyntheticSegmentation
from auto_dynamic_deeplab_tpu.models import ADD
from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE
from auto_dynamic_deeplab_tpu.train.analysis import entropy_signal_study, time_measure
from auto_dynamic_deeplab_tpu.train.dynamic import DynamicInferenceEngine
from auto_dynamic_deeplab_tpu.train.trainer import TrainConfig, Trainer
from auto_dynamic_deeplab_tpu.utils.restore import copy_state_dict
from auto_dynamic_deeplab_tpu.utils.saver import find_latest_checkpoint


def test_copy_state_dict_tolerant():
    target = {
        "a": jnp.zeros((2, 3)),
        "b": {"w": jnp.zeros((4,)), "extra": jnp.zeros((1,))},
    }
    source = {
        "a": np.ones((2, 3), np.float32),
        "b": {"w": np.ones((5,), np.float32)},  # mismatched shape
        "stale": np.zeros(7),
    }
    updated, report = copy_state_dict(target, source, verbose=False)
    np.testing.assert_array_equal(np.asarray(updated["a"]), np.ones((2, 3)))
    np.testing.assert_array_equal(np.asarray(updated["b"]["w"]), np.zeros(4))
    assert any("extra" in k for k in report["missing"])
    assert any("stale" in k for k in report["unexpected"])
    assert len(report["mismatched"]) == 1


def test_entropy_signal_study_and_time_measure():
    model = ADD([1, 2, 2, 2, 3, 2], [1], AUTODEEPLAB_GENOTYPE, 19, F=2, B=5)
    x = jnp.zeros((1, 33, 33, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    loader = DataLoader(
        SyntheticSegmentation(length=4, crop_size=(33, 33)),
        batch_size=2, shuffle=False, drop_last=False, num_workers=2,
    )
    study = entropy_signal_study(model, variables, loader)
    assert study["n"] == 4
    for key in ("cos_entropy_loss", "cos_max_loss", "cos_pool_loss"):
        assert -1.0 <= study[key] <= 1.0 or np.isnan(study[key])

    engine = DynamicInferenceEngine(model, variables)
    dt = time_measure(engine, jnp.asarray(loader.dataset[0]["image"])[None])
    assert dt > 0


def _tiny_trainer(tmp_path, **cfg_kw):
    model = ADD([1, 2, 2, 2, 3, 2], [1], AUTODEEPLAB_GENOTYPE, 19, F=2, B=5)
    loader = DataLoader(
        SyntheticSegmentation(length=4, crop_size=(17, 17)),
        batch_size=4, num_workers=0,
    )
    val = DataLoader(
        SyntheticSegmentation(length=2, crop_size=(17, 17), seed=1),
        batch_size=2, shuffle=False, drop_last=False, num_workers=0,
    )
    cfg = TrainConfig(
        epochs=4, eval_interval=1, run_dir=str(tmp_path),
        dataset="synthetic", checkname="resume_test",
        data_parallel=False, **cfg_kw,
    )
    return Trainer(model, loader, val, cfg)


def test_auto_resume_continues_training(tmp_path):
    """Kill-and-restart recovery: a fresh Trainer with resume='auto' picks up
    the newest committed checkpoint (step, optimizer, best_pred, next epoch)."""
    t1 = _tiny_trainer(tmp_path)
    t1.fit(epochs=2)  # validates (and checkpoints) every epoch
    step1 = int(t1.state.step)
    assert step1 > 0
    assert find_latest_checkpoint(str(tmp_path), "synthetic", "resume_test")

    t2 = _tiny_trainer(tmp_path, resume="auto")
    assert t2.start_epoch == 2
    assert int(t2.state.step) == step1
    assert t2.best_pred == t1.best_pred
    for a, b in zip(
        jax.tree_util.tree_leaves(t1.state.params),
        jax.tree_util.tree_leaves(t2.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed fit runs only the remaining epochs
    t2.fit(epochs=3)
    assert int(t2.state.step) == step1 + len(t2.train_loader)


def test_ft_resume_loads_weights_but_restarts(tmp_path):
    t1 = _tiny_trainer(tmp_path)
    t1.fit(epochs=1)
    t2 = _tiny_trainer(tmp_path, resume="auto", ft=True)
    assert t2.start_epoch == 0
    assert int(t2.state.step) == 0  # optimizer/schedule restart
    for a, b in zip(
        jax.tree_util.tree_leaves(t1.state.params),
        jax.tree_util.tree_leaves(t2.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_auto_resume_cold_start_is_noop(tmp_path):
    t = _tiny_trainer(tmp_path, resume="auto")
    assert t.start_epoch == 0
    assert int(t.state.step) == 0
