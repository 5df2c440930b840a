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


def machine_scoped_cache_dir(base: str = "/tmp/add_tpu_jax_cache") -> str:
    """Persistent-cache dir for CPU-backend runs, keyed by host CPU features.

    CPU executables are AOT-compiled for the host's exact feature set; a
    cache shared across heterogeneous hosts loads mismatched executables
    (XLA warns "could lead to execution errors such as SIGILL"), and two
    processes (a TPU bench + a CPU test run) writing one dir concurrently
    segfaulted a round-3 suite inside a cache write. TPU executables are
    topology-keyed and host-independent — TPU-only runs keep ``base``."""
    import hashlib
    import platform

    key = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    key = line.strip()
                    break
    except OSError:
        pass
    return f"{base}_cpu_{hashlib.sha1(key.encode()).hexdigest()[:10]}"


def jit_init(model, rng, sample_input, train: bool = False):
    """``model.init(rng, sample_input, train=train)`` as one compiled program."""
    fn = jax.jit(lambda r, x: model.init(r, x, train=train))
    return fn(rng, jnp.asarray(sample_input))
