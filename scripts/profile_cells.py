"""Per-cell device-time breakdown of the flagship ADD programs on the TPU.

Groups trace rows by named_scope (cell_0..cell_11, stems, aspp, decoder) to
find where the early-exit and full-depth budgets actually go — the input to
the fused-cell kernel work.
"""
import os
import sys

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/add_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)
sys.path.insert(0, os.path.dirname(_here))


def main():
    from auto_dynamic_deeplab_tpu.models import ADD
    from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE, NETWORK_ARCH
    from auto_dynamic_deeplab_tpu.train.dynamic import DynamicInferenceEngine
    from trace_measure import trace_and_sum, pretty

    cfg = NETWORK_ARCH[2]
    model = ADD(
        cfg["path"], cfg["C_index"], AUTODEEPLAB_GENOTYPE, 19,
        F=20, B=5, low_level_layer=cfg["low_level_layer"], dtype=jnp.bfloat16,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 65, 65, 3), jnp.float32), train=False
    )
    x = jnp.asarray(
        np.random.RandomState(0).randn(1, 1025, 2049, 3).astype(np.float32)
    )

    engine = DynamicInferenceEngine(model, variables)
    program = engine.fused_program((1025, 2049), confidence="entropy")

    def early(x):
        return program(x, jnp.float32(2.0))

    def full(x):
        return program(x, jnp.float32(-1.0))

    for name, fn in (("EARLY", early), ("FULL", full)):
        print(f"==== {name} ====")
        r = trace_and_sum(fn, x, runs=6, segments=(1, 2, 3))
        pretty(r, top=25)
        sys.stdout.flush()


if __name__ == "__main__":
    main()
