"""Dynamic early-exit engine + end-to-end training smoke on synthetic data.

Key invariants:
  * segmented inference logits == whole-graph forward logits, per exit
  * forcing early exit returns the first exit's logits and skips later
    segments (exit_index bookkeeping)
  * batched bucketed mode agrees with per-image mode
  * a few train steps reduce loss and validation runs end to end
  * EDM pipeline: dataset generation + L1 training learns on-trend values
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from auto_dynamic_deeplab_tpu.data import DataLoader, SyntheticSegmentation
from auto_dynamic_deeplab_tpu.models import ADD, EDM
from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE
from auto_dynamic_deeplab_tpu.train.dynamic import DynamicInferenceEngine
from auto_dynamic_deeplab_tpu.train.edm_trainer import make_edm_dataset, train_edm
from auto_dynamic_deeplab_tpu.train.evaluator import Evaluation
from auto_dynamic_deeplab_tpu.train.trainer import TrainConfig, Trainer

_PATH, _C_INDEX = [1, 2, 2, 2, 3, 2], [1]


def _small_add(axis_name=None):
    return ADD(
        _PATH, _C_INDEX, AUTODEEPLAB_GENOTYPE, 19,
        F=2, B=5, low_level_layer=0, axis_name=axis_name,
    )


@pytest.fixture(scope="module")
def model_and_vars():
    model = _small_add()
    x = jnp.zeros((1, 33, 33, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def test_segmented_equals_whole_graph(rng, model_and_vars):
    model, variables = model_and_vars
    x = jnp.asarray(rng.randn(1, 33, 33, 3), jnp.float32)
    whole = model.apply(variables, x, train=False)

    engine = DynamicInferenceEngine(model, variables)
    # never exit early (entropy threshold below any possible value)
    logits, exit_idx, dt, conf = engine.infer(x, threshold=-1.0, confidence="entropy")
    assert exit_idx == len(model.exit_layers) - 1
    # engine logits are (N, C, H, W) — the reference's torch layout
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(logits), 1, -1), np.asarray(whole[-1]),
        rtol=1e-4, atol=1e-4,
    )

    # always exit at the first exit (threshold above max entropy 1.0)
    logits0, exit_idx0, _, conf0 = engine.infer(x, threshold=2.0, confidence="entropy")
    assert exit_idx0 == 0
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(logits0), 1, -1), np.asarray(whole[0]),
        rtol=1e-4, atol=1e-4,
    )
    assert dt > 0 and 0 <= conf0 <= 1


def test_batched_bucketed_matches_per_image(rng, model_and_vars):
    model, variables = model_and_vars
    x = jnp.asarray(rng.randn(4, 33, 33, 3), jnp.float32)
    engine = DynamicInferenceEngine(model, variables)

    # pick a threshold splitting the batch using first-exit entropies
    firsts = []
    for i in range(4):
        l, k, _, c = engine.infer(x[i : i + 1], threshold=2.0, confidence="entropy")
        firsts.append(c)
    thr = float(np.median(firsts))

    per_image = [
        engine.infer(x[i : i + 1], threshold=thr, confidence="entropy")
        for i in range(4)
    ]
    batch_logits, batch_exit = engine.infer_batch(
        x, threshold=thr, confidence="entropy"
    )
    for i in range(4):
        assert batch_exit[i] == per_image[i][1], i
        np.testing.assert_allclose(
            batch_logits[i], np.asarray(per_image[i][0])[0], rtol=1e-4, atol=1e-4
        )


def test_edm_pipeline(model_and_vars):
    model, variables = model_and_vars
    ds = SyntheticSegmentation(length=16, crop_size=(33, 33))
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2)
    features, entropies = make_edm_dataset(model, variables, loader)
    assert features.shape[0] == 16 and entropies.shape == (16,)
    assert features.shape[-1] == 2 * 5 * 4  # FB * fm[level of exit]

    edm, edm_vars, loss = train_edm(features, entropies, epochs=30, batch_size=8)
    pred = np.asarray(edm.apply(edm_vars, jnp.asarray(features))[:, 0])
    base = np.mean(np.abs(entropies - entropies.mean()))
    assert loss < base * 1.5  # learns at least the scale

    # EDM-gated dynamic inference end to end
    engine = DynamicInferenceEngine(model, variables, edm=edm, edm_variables=edm_vars)
    logits, k, dt, conf = engine.infer(
        jnp.asarray(ds[0]["image"])[None], threshold=1e9, confidence="edm"
    )
    assert k == 0  # huge threshold → conf <= threshold → immediate exit


def test_trainer_end_to_end(tmp_path):
    model = _small_add("data")
    ds = SyntheticSegmentation(length=16, crop_size=(33, 33))
    train_loader = DataLoader(ds, batch_size=8, shuffle=True, num_workers=2)
    val_loader = DataLoader(
        SyntheticSegmentation(length=4, crop_size=(33, 33), seed=1),
        batch_size=2, shuffle=False, drop_last=False,
    )
    cfg = TrainConfig(
        epochs=3, lr=0.02, eval_interval=3, run_dir=str(tmp_path), dataset="synthetic",
    )
    trainer = Trainer(model, train_loader, val_loader, cfg)
    l0 = trainer.training(0)
    l1 = trainer.training(1)
    l2 = trainer.training(2)
    assert np.isfinite([l0, l1, l2]).all()
    assert l2 < l0  # learning on synthetic structure

    result = trainer.validation(2)
    assert len(result["miou"]) == 2
    assert all(0.0 <= m <= 1.0 for m in result["miou"])

    # eval_interval <= 0 disables validation (the reference's --no-val)
    cfg0 = TrainConfig(
        epochs=1, lr=0.02, eval_interval=0, run_dir=str(tmp_path),
        dataset="synthetic",
    )
    assert Trainer(model, train_loader, val_loader, cfg0).fit() == {}


def test_evaluation_dynamic(model_and_vars):
    model, variables = model_and_vars
    evaluation = Evaluation(model, variables, num_classes=19)
    val_loader = DataLoader(
        SyntheticSegmentation(length=4, crop_size=(33, 33), seed=2),
        batch_size=2, shuffle=False, drop_last=False,
    )
    stats = evaluation.dynamic_inference(
        val_loader, threshold=0.5, confidence="entropy"
    )
    assert stats["n_images"] == 4
    assert stats["fps"] > 0
    assert sum(stats["exit_histogram"]) == 4
    assert 0.0 <= stats["early_exit_rate"] <= 1.0


def test_fused_cond_matches_segmented(rng, model_and_vars):
    """Single-program lax.cond dynamic inference == segmented engine."""
    model, variables = model_and_vars
    engine = DynamicInferenceEngine(model, variables)
    x = jnp.asarray(rng.randn(1, 33, 33, 3), jnp.float32)

    for thr, expect_exit in [(2.0, 0), (-1.0, 1)]:
        seg_logits, seg_k, _, seg_conf = engine.infer(
            x, threshold=thr, confidence="entropy"
        )
        f_logits, f_k, _, f_conf = engine.infer_fused(
            x, threshold=thr, confidence="entropy"
        )
        assert f_k == seg_k == expect_exit
        np.testing.assert_allclose(
            np.asarray(f_logits), np.asarray(seg_logits), rtol=1e-4, atol=1e-4
        )
        if expect_exit == 0:
            assert f_conf == pytest.approx(seg_conf, rel=1e-4)


def test_pallas_stems_batched_unrolled(rng):
    """use_pallas_stems=True with N>1 unrolls the batch-1 fused-stems kernel
    per image (it used to fall back to XLA stems — ~2x slower at bs4 full
    res); every sample must match the XLA path, not just sample 0."""
    from jax.experimental.pallas import tpu as pltpu

    model = ADD(
        _PATH, _C_INDEX, AUTODEEPLAB_GENOTYPE, 19,
        F=2, B=5, low_level_layer=0, dtype=jnp.bfloat16,
    )
    x = jnp.asarray(rng.randn(2, 33, 33, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    plain = DynamicInferenceEngine(model, variables, use_pallas_stems=False)
    forced = DynamicInferenceEngine(model, variables, use_pallas_stems=True)
    assert forced._pallas_stems
    ref_logits, ref_exit = plain.infer_batch(x, threshold=-1.0, confidence="entropy")
    with pltpu.force_tpu_interpret_mode():
        got_logits, got_exit = forced.infer_batch(
            x, threshold=-1.0, confidence="entropy"
        )
    np.testing.assert_array_equal(ref_exit, got_exit)
    for i in range(2):  # per-sample: a kernel reading only x[0] fails i=1
        rel = np.abs(got_logits[i] - ref_logits[i]).max() / (
            np.abs(ref_logits[i]).max() + 1e-9
        )
        assert rel < 0.1, (i, rel)


def test_pallas_stems_engine_interpret(rng):
    """Batch-1 fused-stems path through the engine (interpret mode): the
    kernel's bf16 stems feed the rest of the backbone and the result stays
    close to the XLA bf16 path."""
    from jax.experimental.pallas import tpu as pltpu

    model = ADD(
        _PATH, _C_INDEX, AUTODEEPLAB_GENOTYPE, 19,
        F=2, B=5, low_level_layer=0, dtype=jnp.bfloat16,
    )
    x = jnp.asarray(rng.randn(1, 33, 33, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    plain = DynamicInferenceEngine(model, variables, use_pallas_stems=False)
    fused = DynamicInferenceEngine(model, variables, use_pallas_stems=True)
    ref = np.asarray(plain.infer(x, threshold=-1.0, confidence="entropy")[0], np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused.infer(x, threshold=-1.0, confidence="entropy")[0], np.float32
        )
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.1, rel


def test_programs_take_weights_as_arguments(model_and_vars):
    """No inference program may close over the weight pytree: closed-over
    weights become HLO constants, which remote-relay TPU runtimes re-upload
    on every execution (measured 41.6 ms/launch vs 2.35 ms for the flagship
    ADD on v5e). Guard: the lowered fused program's HLO must carry the
    weights as entry parameters, not as large constants."""
    model, variables = model_and_vars
    engine = DynamicInferenceEngine(model, variables)
    size = (33, 33)
    program = engine.fused_program(size, confidence="entropy")
    x = jnp.zeros((1, 33, 33, 3), jnp.float32)

    # The engine's stored program is a bound wrapper over a jit fn whose
    # leading arguments are the weight pytrees.
    lowered = program.raw.lower(variables, None, x, jnp.float32(0.0))
    hlo = lowered.as_text()
    # With weights as arguments the module text stays small; closed-over
    # weights would appear as multi-MB dense constants (or elided blobs).
    assert len(hlo) < 8_000_000, f"suspiciously large HLO text: {len(hlo)}"
    assert "__elided__" not in hlo
    # and the bound program still runs and exits at station 0
    assert int(program(x, jnp.float32(2.0))[1]) == 0
