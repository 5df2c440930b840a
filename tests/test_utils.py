"""Saver round-trip, meters, FLOPs accounting."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from auto_dynamic_deeplab_tpu.utils import (
    AverageMeter,
    Saver,
    count_params,
    xla_cost,
)


def test_average_meter():
    m = AverageMeter()
    m.update(2.0)
    m.update(4.0, n=3)
    assert m.avg == (2.0 + 12.0) / 4
    assert m.count == 4


def test_saver_roundtrip(tmp_path):
    saver = Saver(str(tmp_path / "run"), "synthetic", "unit")
    state = {
        "params": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)},
        "step": jnp.asarray(5, jnp.int32),
    }
    saver.save_checkpoint(state, is_best=True, epoch=3, best_pred=0.42)
    target = jax.tree.map(jnp.zeros_like, state)
    restored, meta = saver.load_checkpoint(target)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
    assert meta["epoch"] == 3
    assert os.path.exists(os.path.join(saver.experiment_dir, "best_pred.txt"))

    # second experiment auto-increments and respects previous best
    saver2 = Saver(str(tmp_path / "run"), "synthetic", "unit")
    assert saver2.experiment_dir.endswith("experiment_1")
    saver2.save_experiment_config({"lr": 0.05, "F": 20})
    assert os.path.exists(os.path.join(saver2.experiment_dir, "parameters.txt"))

    # architecture artifacts
    d = saver2.save_architecture(0, np.arange(12), betas=np.zeros((12, 4, 3)))
    assert os.path.exists(os.path.join(d, "network_path.npy"))


def test_xla_cost_and_params():
    def f(w, x):
        return jnp.dot(x, w)

    w = jnp.zeros((64, 32))
    x = jnp.zeros((16, 64))
    cost = xla_cost(f, w, x)
    assert cost.get("flops", 0) >= 2 * 16 * 64 * 32 * 0.9
    assert count_params({"w": w}) == 64 * 32


def test_device_time_and_flops():
    from auto_dynamic_deeplab_tpu.utils import device_time, flops_of

    f = jax.jit(lambda a, b: a @ b)
    a = jnp.ones((64, 64))
    t = device_time(f, a, a, iters=3, warmup=1)
    assert t > 0
    assert flops_of(lambda a, b: a @ b, a, a) >= 2 * 64 ** 3 * 0.9


def test_search_recipe_alignment():
    """SearchConfig defaults == the PUBLISHED recipe, and the shipped shell
    script passes exactly those values (reference scripts/search_cityscapes.sh:
    lr 0.05 / min-lr 0.003 / arch-lr 1e-3 / wd 8e-4 / arch-wd 1e-3)."""
    import os

    from auto_dynamic_deeplab_tpu.train.search_trainer import SearchConfig

    cfg = SearchConfig()
    recipe = {
        "--lr": cfg.lr,
        "--min-lr": cfg.min_lr,
        "--arch-lr": cfg.arch_lr,
        "--weight-decay": cfg.weight_decay,
        "--arch-weight-decay": cfg.arch_weight_decay,
    }
    assert recipe == {
        "--lr": 0.05,
        "--min-lr": 0.003,
        "--arch-lr": 1e-3,
        "--weight-decay": 8e-4,
        "--arch-weight-decay": 1e-3,
    }
    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "search_cityscapes.sh",
    )
    with open(script) as f:
        toks = f.read().replace("\\\n", " ").split()
    passed = {t: float(toks[i + 1]) for i, t in enumerate(toks) if t in recipe}
    assert passed == recipe, (passed, recipe)
