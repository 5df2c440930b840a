"""Cumulative-depth profile of the flagship ADD early-exit path.

Compiles P_k = stem + cells[0..k] (+ optionally the exit head) as ONE jitted
program returning a scalar, for k = -1..11. Successive time differences give
true in-program per-cell cost (launch overhead cancels).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from auto_dynamic_deeplab_tpu.models import ADD
from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE, NETWORK_ARCH


def time_program(fn, *args, iters=15):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def state_scalar(state):
    leaves = [x for x in jax.tree.leaves(state) if x is not None]
    return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)


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

    def prog(depth, with_head=None):
        @jax.jit
        def run(x):
            state = model.apply(variables, x, False, method="stem_state")
            if depth >= 0:
                state = model.apply(
                    variables, state, 0, depth, False, method="run_cells"
                )
            if with_head is not None:
                logits = model.apply(
                    variables, state, with_head, size, False, method="exit_logits"
                )
                return jnp.sum(logits)
            return state_scalar(state)

        return run

    t_empty = time_program(jax.jit(lambda x: jnp.sum(x)), x)
    print(f"baseline sum(x) program: {t_empty*1e3:7.2f} ms")

    prev = time_program(prog(-1), x)
    print(f"stems:          {prev*1e3:7.2f} ms (cumulative)")
    for k in range(12):
        t = time_program(prog(k), x)
        print(
            f"+cell_{k:<2d} (L{cfg['path'][k]}): {t*1e3:7.2f} ms cumulative, "
            f"delta {(t - prev)*1e3:6.2f} ms"
        )
        prev = t

    t5h = time_program(prog(5, with_head=5), x)
    print(f"stem+cells0-5+head@5: {t5h*1e3:7.2f} ms (early-exit path, one launch)")
    t11h = time_program(prog(11, with_head=11), x)
    print(f"full+head@11:         {t11h*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
