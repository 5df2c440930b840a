"""Confidence-signal analysis — equivalent of eval_edm.py's testing_entropy
study (:196-250): how well do cheap signals (global-avg-pool magnitude,
normalized entropy, max-probability coverage) track the true per-image loss,
measured by cosine similarity over the val set. Used to justify the EDM.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.confidence import confidence_max, normalized_shannon_entropy
from .loss import cross_entropy


def cosine_similarity(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = np.linalg.norm(a) * np.linalg.norm(b)
    return float(a @ b / denom) if denom > 0 else float("nan")


def entropy_signal_study(
    model, variables, loader, num_classes: int = 19, threshold: float = 0.9
) -> Dict:
    """Collect per-image (first-exit) signals and their cosine similarity to
    the per-image CE loss."""

    @jax.jit
    def signals(variables, x, y):
        logits, feature = model.apply(
            variables, x, train=False, method="get_feature"
        )
        per_image_loss = jnp.stack(
            [cross_entropy(logits[i : i + 1], y[i : i + 1]) for i in range(x.shape[0])]
        )
        return (
            normalized_shannon_entropy(logits, num_classes),
            confidence_max(logits, threshold),
            jnp.mean(jnp.abs(feature), axis=(1, 2, 3)),  # GAP magnitude
            per_image_loss,
        )

    ent, maxc, pool, loss = [], [], [], []
    for batch in loader:
        e, m, p, l = signals(
            variables, jnp.asarray(batch["image"]), jnp.asarray(batch["label"])
        )
        ent.extend(np.asarray(e))
        maxc.extend(np.asarray(m))
        pool.extend(np.asarray(p))
        loss.extend(np.asarray(l))

    return {
        "cos_entropy_loss": cosine_similarity(ent, loss),
        "cos_max_loss": cosine_similarity(maxc, loss),
        "cos_pool_loss": cosine_similarity(pool, loss),
        "n": len(loss),
        "entropy": np.asarray(ent),
        "loss": np.asarray(loss),
    }


def time_measure(engine, x, confidence: str = "entropy", threshold: float = -1.0):
    """Latency probe (autodeeplab.py:206-229 / ADD timing): one timed
    full-depth pass; returns seconds."""
    _, _, dt, _ = engine.infer(x, threshold=threshold, confidence=confidence)
    return dt
