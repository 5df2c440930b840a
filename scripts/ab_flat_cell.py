"""A/B the fused flat-layout cell DAG (kernels/cell_ops.py) against the XLA
cells inside the real early-exit program at 1025x2049 bf16 on the TPU.

Prints trace device-time totals for flat_eval={False,True} plus the
per-scope breakdown of the flat variant.
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
    x = jnp.asarray(
        np.random.RandomState(0).randn(1, 1025, 2049, 3).astype(np.float32)
    )
    variants = {
        "xla": {},
        "packed": {"packed_eval": True},
        "flat": {"flat_eval": True},
        # flat DAG + packed dense-tap projections compose (cell.py routes
        # the block DAG to the flat kernels, the dense-in 1x1s to packed)
        "flat+packed": {"flat_eval": True, "packed_eval": True},
        # exact SepConv dense-form rewrite (dw∘pw == one dense conv)
        "dense-sep": {"dense_sep_eval": True},
    }
    only = sys.argv[1:]
    if only:
        variants = {
            k: v for k, v in variants.items() if k == "xla" or k in only
        }
    results = {}
    for name, kw in variants.items():
        model = ADD(
            cfg["path"], cfg["C_index"], AUTODEEPLAB_GENOTYPE, 19,
            F=20, B=5, low_level_layer=cfg["low_level_layer"],
            dtype=jnp.bfloat16, **kw,
        )
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 65, 65, 3), jnp.float32),
            train=False,
        )
        engine = DynamicInferenceEngine(model, variables)
        program = engine.fused_program((1025, 2049), confidence="entropy")

        def early(x):
            return program(x, jnp.float32(2.0))[0]

        def full(x):
            return program(x, jnp.float32(-1.0))[0]

        r_early = trace_and_sum(early, x, runs=5)
        r_full = trace_and_sum(full, x, runs=5)
        results[name] = (r_early, r_full)
        print(f"\n=== {name} ===")
        print("early-exit:", r_early["total_ms"], "ms/run")
        print("full-depth:", r_full["total_ms"], "ms/run")
        if name in ("flat", "flat+packed", "dense-sep"):
            pretty(r_early, top=25)

    e0, f0 = (results["xla"][i]["total_ms"] for i in (0, 1))
    for name in results:
        if name == "xla":
            continue
        e1, f1 = (results[name][i]["total_ms"] for i in (0, 1))
        print(f"\n{name}: early-exit {e0:.2f} -> {e1:.2f} ms ({e0 / e1:.2f}x), "
              f"full-depth {f0:.2f} -> {f1:.2f} ms ({f0 / f1:.2f}x)")


if __name__ == "__main__":
    main()
