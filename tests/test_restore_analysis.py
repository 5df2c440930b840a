"""copy_state_dict tolerant restore + entropy-signal study."""
import jax
import jax.numpy as jnp
import numpy as np

from auto_dynamic_deeplab_tpu.data import DataLoader, SyntheticSegmentation
from auto_dynamic_deeplab_tpu.models import ADD
from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE
from auto_dynamic_deeplab_tpu.train.analysis import entropy_signal_study, time_measure
from auto_dynamic_deeplab_tpu.train.dynamic import DynamicInferenceEngine
from auto_dynamic_deeplab_tpu.utils.restore import copy_state_dict


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
