"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax import.

This is the TPU answer to "test multi-replica numerics without a cluster"
(SURVEY.md §4): cross-replica BN psum, data-parallel gradient psum, and the
full shard_map train step all run on 8 virtual CPU devices.
"""
import os

# The harness may pin JAX_PLATFORMS to a TPU tunnel; tests always run on a
# virtual 8-device CPU backend (the env var alone is not honored when a
# platform plugin is preloaded, so use the config API as well).
# Escape hatch: ADD_TPU_TESTS=1 keeps the real backend so the
# compiled-Mosaic parity tests (skipif backend not tpu/axon) can run:
#   ADD_TPU_TESTS=1 pytest tests -k on_tpu
_ON_TPU = os.environ.get("ADD_TPU_TESTS") == "1"
if not _ON_TPU:
    os.environ.pop("JAX_PLATFORMS", None)
os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
# Persistent compilation cache: the model tests compile large graphs; reruns
# drop from ~27 min to a few minutes. CPU runs use a machine-scoped dir —
# CPU AOT executables are host-feature-specific (stale cross-host entries
# risk SIGILL) and sharing one dir with a concurrent TPU bench process
# segfaulted a cache write (round 3).
from auto_dynamic_deeplab_tpu.utils.initialize import machine_scoped_cache_dir  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    "/tmp/add_tpu_jax_cache" if _ON_TPU else machine_scoped_cache_dir(),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # Function-scoped: each test gets the SAME stream every run, regardless
    # of which other tests exist or run first. (A shared session-scoped
    # stream made marginal-tolerance equivalence tests flip when unrelated
    # tests were added ahead of them.)
    return np.random.RandomState(0)


# ---------------------------------------------------------------- fast set
# `pytest -m fast`: the sub-5-minute subset (host-side logic + small-compile
# unit tests). The full suite is a ~30-min nightly on one CPU core; this
# keeps a quick gate developers will actually run.
_FAST_MODULES = {
    "test_decode",
    "test_metrics_loss_schedules",
    "test_utils",
    "test_data",
    "test_device_transforms",
    "test_native",
    "test_resize",
}
_FAST_TESTS = {
    "test_sgd_chain_matches_torch",
    "test_arch_adam_chain_matches_torch",
    "test_mixed_op_eval_argmax",
}

# ------------------------------------------------------------- slow set
# `pytest -m "not slow"`: the mid-tier gate — everything except the
# compile-heaviest files (golden torch-parity transplants, the staged
# product chain, multi-process dp). Measured tier wall-times: docs/STATUS.md.
_SLOW_MODULES = {
    "test_add_parity_vs_reference",
    "test_supernet_parity_vs_reference",
    "test_multiprocess_dp",
    "test_full_chain",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if (
            item.module.__name__ in _FAST_MODULES
            or item.name.split("[")[0] in _FAST_TESTS
        ):
            item.add_marker(pytest.mark.fast)
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
