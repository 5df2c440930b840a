"""Pipeline-parallel early-exit inference (parallel/pipeline.py).

The reference's "device"/"cloud" genotype split
(decode_autodeeplab.py:106-107) as a runtime: segments on separate devices,
each holding only its own weights, explicit state handoff between stages.
Must reproduce the single-device engine's outputs exactly on both the
early-exit and the full-depth path.
"""
import jax
import jax.numpy as jnp
import numpy as np

from auto_dynamic_deeplab_tpu.models import ADD
from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE
from auto_dynamic_deeplab_tpu.parallel import PipelinedDynamicInference
from auto_dynamic_deeplab_tpu.train.dynamic import DynamicInferenceEngine

_PATH, _C_INDEX = [1, 2, 2, 2, 3, 2], [1]


def _setup(rng):
    model = ADD(
        _PATH, _C_INDEX, AUTODEEPLAB_GENOTYPE, 19,
        F=2, B=5, low_level_layer=0, axis_name=None,
    )
    x = jnp.asarray(rng.randn(1, 17, 17, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables, x


def test_pipeline_matches_single_device_engine(rng):
    model, variables, x = _setup(rng)
    devices = jax.devices()[:2]
    assert len(devices) == 2
    engine = DynamicInferenceEngine(model, variables)

    pipe = PipelinedDynamicInference(
        model, variables, (17, 17), devices=devices, confidence="entropy",
        threshold=-1.0,  # never exit: exercises the cross-device handoff
    )
    # stage weights are genuinely partitioned: the deep stage has no stems
    # and no early cells; the early stage has no deep cells
    assert len(pipe.stages) == 2
    p0 = pipe.stages[0]["variables"]["params"]
    p1 = pipe.stages[1]["variables"]["params"]
    assert "stems" in p0 and "cell_0" in p0 and "cell_5" not in p0
    assert "stems" not in p1 and "cell_5" in p1 and "cell_0" not in p1
    assert pipe.stages[0]["device"] != pipe.stages[1]["device"]
    for leaf in jax.tree.leaves(p1):
        assert leaf.devices() == {devices[1]}

    logits_p, exit_p, conf_p = pipe.infer(x)
    logits_e, exit_e, _, conf_e = engine.infer(
        x, threshold=-1.0, confidence="entropy"
    )
    assert exit_p == exit_e == 1  # full depth: last exit station index
    assert conf_p == conf_e
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(logits_e), rtol=1e-5, atol=1e-5
    )


def test_evaluation_dynamic_pipelined(rng):
    """Evaluation.dynamic_inference(pipeline_devices=2) drives the whole
    metric surface (mIoU/latency/fps/exit-rate) through the pipeline and
    matches the single-device engine's decisions."""
    from auto_dynamic_deeplab_tpu.data import DataLoader, SyntheticSegmentation
    from auto_dynamic_deeplab_tpu.train.evaluator import Evaluation

    model, variables, _ = _setup(rng)
    evaluation = Evaluation(model, variables, num_classes=19)
    loader = DataLoader(
        SyntheticSegmentation(length=4, crop_size=(17, 17), seed=2),
        batch_size=2, shuffle=False, drop_last=False,
    )
    stats = evaluation.dynamic_inference(
        loader, threshold=0.5, confidence="entropy", pipeline_devices=2
    )
    ref = evaluation.dynamic_inference(
        loader, threshold=0.5, confidence="entropy", fused=False
    )
    assert stats["n_images"] == 4
    assert stats["exit_histogram"] == ref["exit_histogram"]
    assert stats["miou"] == ref["miou"]
    assert stats["fps"] > 0


def test_evaluation_pipelined_variable_sizes_and_device_check(rng):
    """ADVICE r2: the pipeline holder is keyed by spatial size (a second
    input size builds a second pipeline instead of tripping the per-shape
    assert), and requesting more devices than exist raises instead of
    silently collapsing to fewer stages."""
    import numpy as np
    import pytest

    from auto_dynamic_deeplab_tpu.train.evaluator import Evaluation

    model, variables, _ = _setup(rng)
    evaluation = Evaluation(model, variables, num_classes=19)
    r = np.random.RandomState(3)

    def batch(hw):
        return {
            "image": r.randn(1, *hw, 3).astype(np.float32),
            "label": r.randint(0, 19, size=(1, *hw)).astype(np.int32),
        }

    loader = [batch((17, 17)), batch((33, 33))]
    stats = evaluation.dynamic_inference(
        loader, threshold=0.5, confidence="entropy", pipeline_devices=2
    )
    assert stats["n_images"] == 2

    with pytest.raises(RuntimeError, match="devices"):
        evaluation.dynamic_inference(
            loader, threshold=0.5, confidence="entropy",
            pipeline_devices=len(jax.devices()) + 1,
        )


def test_pipeline_early_exit_stays_on_first_stage(rng):
    model, variables, x = _setup(rng)
    devices = jax.devices()[:2]
    engine = DynamicInferenceEngine(model, variables)

    pipe = PipelinedDynamicInference(
        model, variables, (17, 17), devices=devices, confidence="entropy",
        threshold=2.0,  # normalized entropy <= 1: always exits at station 0
    )
    logits_p, exit_p, conf_p = pipe.infer(x)
    logits_e, exit_e, _, conf_e = engine.infer(
        x, threshold=2.0, confidence="entropy"
    )
    assert exit_p == exit_e == 0
    assert conf_p == conf_e
    # the early exit never left stage 0's device
    assert logits_p.devices() == {devices[0]}
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(logits_e), rtol=1e-5, atol=1e-5
    )
