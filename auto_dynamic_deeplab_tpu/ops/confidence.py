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


def normalized_shannon_entropy(logits: jnp.ndarray, num_classes: int = 19) -> jnp.ndarray:
    """Mean per-pixel Shannon entropy of softmax(logits), normalized by
    log(num_classes). logits: (N, H, W, C) → (N,). Low = confident."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    ent = -jnp.sum(p * logp, axis=-1)  # (N, H, W)
    return jnp.mean(ent, axis=(1, 2)) / math.log(num_classes)


def confidence_max(logits: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Fraction of pixels whose max softmax probability exceeds threshold.
    logits: (N, H, W, C) → (N,). High = confident."""
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    max_map = jnp.max(p, axis=-1)
    return jnp.mean((max_map > threshold).astype(jnp.float32), axis=(1, 2))
