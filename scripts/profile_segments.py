"""Segment-level device-time breakdown of the flagship ADD forward on TPU.

Times each piece of the early-exit path (stems, per-cell, adapter, ASPP,
decoder) as its own jitted program at the real eval resolution, so the
optimization work targets the true hot spots. Numbers include per-launch
overhead; the relative ranking is what matters.
"""
import os
import sys
import time

# Allow `python scripts/profile_segments.py` without PYTHONPATH (setting
# PYTHONPATH=/root/repo breaks the axon TPU plugin's own imports).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from auto_dynamic_deeplab_tpu.models import ADD
from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE, NETWORK_ARCH


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    cfg = NETWORK_ARCH[2]
    model = ADD(
        cfg["path"], cfg["C_index"], AUTODEEPLAB_GENOTYPE, 19,
        F=20, B=5, low_level_layer=cfg["low_level_layer"], dtype=jnp.bfloat16,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 65, 65, 3), jnp.float32), train=False
    )
    x = jnp.asarray(np.random.RandomState(0).randn(1, 1025, 2049, 3).astype(np.float32))
    size = (1025, 2049)

    stem = jax.jit(lambda x: model.apply(variables, x, False, method="stem_state"))
    t_stem, state = timed(stem, x)
    print(f"stems: {t_stem*1e3:8.2f} ms")

    total_cells = 0.0
    for i in range(12):
        seg = jax.jit(
            lambda s, i=i: model.apply(variables, s, i, i, False, method="run_cells")
        )
        t, state = timed(seg, state)
        total_cells += t
        lvl = cfg["path"][i]
        print(f"cell_{i:2d} (level {lvl}): {t*1e3:8.2f} ms")
    print(f"cells total: {total_cells*1e3:8.2f} ms")

    # head at the first early exit (layer 5) and the final exit (layer 11)
    for e in model.exit_layers:
        head = jax.jit(
            lambda s, e=e: model.apply(
                variables, s, e, size, False, method="exit_logits"
            )
        )
        t, _ = timed(head, state)
        print(f"exit head @ layer {e}: {t*1e3:8.2f} ms")

    print(f"device: {jax.devices()[0]}")


if __name__ == "__main__":
    main()
