"""Exit-confidence signals (modeling/operations.py:161-180), jit-friendly.

Unlike the reference (which calls .item(), forcing a device sync per exit),
these return device arrays so confidence evaluation fuses into the exit
program; the dynamic-inference engine fetches a single scalar per decision.
Per-image vectors are returned (the reference runs batch 1).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def normalized_shannon_entropy(
    logits: jnp.ndarray, num_classes: int = 19, class_axis: int = -1
) -> jnp.ndarray:
    """Mean per-pixel Shannon entropy of softmax(logits), normalized by
    log(num_classes). logits: (N, H, W, C) (or (N, C, H, W) with
    class_axis=1) → (N,). Low = confident."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=class_axis)
    p = jnp.exp(logp)
    ent = -jnp.sum(p * logp, axis=class_axis)  # (N, H, W)
    return jnp.mean(ent, axis=(1, 2)) / math.log(num_classes)


def confidence_max(
    logits: jnp.ndarray, threshold: float, class_axis: int = -1
) -> jnp.ndarray:
    """Fraction of pixels whose max softmax probability exceeds threshold.
    logits: (N, H, W, C) (or (N, C, H, W) with class_axis=1) → (N,).
    High = confident."""
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=class_axis)
    max_map = jnp.max(p, axis=class_axis)
    return jnp.mean((max_map > threshold).astype(jnp.float32), axis=(1, 2))
