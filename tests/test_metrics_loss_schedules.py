"""Metrics / loss / LR-schedule parity vs torch & the reference scheduler."""
import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

from auto_dynamic_deeplab_tpu.train.loss import cross_entropy, multi_exit_cross_entropy
from auto_dynamic_deeplab_tpu.train.schedules import lr_schedule
from auto_dynamic_deeplab_tpu.utils.metrics import Evaluator


def test_evaluator_matches_reference_cpu(rng):
    from utils.metrics import Evaluator_cpu

    ours = Evaluator(19)
    ref = Evaluator_cpu(19)
    for _ in range(3):
        gt = rng.randint(0, 20, size=(2, 33, 47))
        gt[gt == 19] = 255  # ignore pixels
        pred = rng.randint(0, 19, size=(2, 33, 47))
        ours.add_batch(gt, pred)
        ref.add_batch(gt, pred)

    np.testing.assert_allclose(np.asarray(ours.confusion_matrix), ref.confusion_matrix)
    assert ours.Mean_Intersection_over_Union() == pytest.approx(
        ref.Mean_Intersection_over_Union(), rel=1e-6
    )
    assert ours.Pixel_Accuracy() == pytest.approx(ref.Pixel_Accuracy(), rel=1e-6)
    assert ours.Frequency_Weighted_Intersection_over_Union() == pytest.approx(
        ref.Frequency_Weighted_Intersection_over_Union(), rel=1e-6
    )


@pytest.mark.parametrize("weighted", [False, True])
def test_cross_entropy_matches_torch(rng, weighted):
    logits = rng.randn(2, 9, 11, 19).astype(np.float32)
    target = rng.randint(0, 19, size=(2, 9, 11)).astype(np.int64)
    target[0, :3, :3] = 255  # ignore region
    weight = np.abs(rng.randn(19)).astype(np.float32) + 0.1 if weighted else None

    ours = float(
        cross_entropy(
            jnp.asarray(logits), jnp.asarray(target),
            None if weight is None else jnp.asarray(weight),
        )
    )
    crit = torch.nn.CrossEntropyLoss(
        weight=None if weight is None else torch.from_numpy(weight), ignore_index=255
    )
    theirs = float(
        crit(
            torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)).copy()),
            torch.from_numpy(target),
        )
    )
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_multi_exit_loss_is_mean_of_exits(rng):
    logits = [jnp.asarray(rng.randn(1, 5, 5, 19).astype(np.float32)) for _ in range(3)]
    target = jnp.asarray(rng.randint(0, 19, size=(1, 5, 5)))
    per = [float(cross_entropy(l, target)) for l in logits]
    joint = float(multi_exit_cross_entropy(logits, target))
    assert joint == pytest.approx(sum(per) / 3, rel=1e-6)


@pytest.mark.parametrize(
    "mode,kwargs",
    [
        ("poly", {}),
        ("cos", dict(min_lr=0.003)),
        ("step", dict(lr_step=30)),
    ],
)
def test_schedule_matches_reference(mode, kwargs):
    from utils.lr_scheduler import LR_Scheduler

    iters, epochs, base = 10, 100, 0.05
    sched = lr_schedule(mode, base, epochs, iters, **kwargs)
    ref = LR_Scheduler(mode, base, epochs, iters, **kwargs)

    class _Opt:
        param_groups = [{"lr": 0.0}]

    opt = _Opt()
    for (epoch, it) in [(0, 0), (0, 5), (10, 3), (50, 9), (99, 9)]:
        ref(opt, it, epoch, 0.0)
        ours = float(sched(epoch * iters + it))
        # float32 pow near the schedule tail costs a few ulp vs python f64
        assert ours == pytest.approx(opt.param_groups[0]["lr"], rel=1e-3, abs=1e-9), (
            mode, epoch, it,
        )
