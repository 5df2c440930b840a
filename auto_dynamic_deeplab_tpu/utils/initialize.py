"""Jitted model initialization.

Eager flax ``model.init`` dispatches every parameter-init / BN op as its own
tiny device execution. On a remote-relay TPU each dispatch pays a host<->device
round trip, so the flagship ADD init at 65x65 measured **274 s** of pure RTT
(bench phase log, round 3). Under ``jax.jit`` the whole init is ONE compiled
program — and the compile is served from the persistent compilation cache on
every run after the first.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def jit_init(model, rng, sample_input, train: bool = False):
    """``model.init(rng, sample_input, train=train)`` as one compiled program."""
    fn = jax.jit(lambda r, x: model.init(r, x, train=train))
    return fn(rng, jnp.asarray(sample_input))
