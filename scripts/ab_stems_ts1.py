"""Sweep the fused-stems tile size TS1 on the real TPU at 1025x2049 bf16.

The stems chain measures 2.4 ms but carries only ~30 GMAC (~0.3 ms at v5e
peak): the kernel is overhead-bound (per-tile transposes + row-loop small
matmuls), so larger tiles should amortize. Every TS1 is bit-identical
(tests/test_kernels.py::test_ts1_tile_sizes_match); this picks the fastest.
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
    from auto_dynamic_deeplab_tpu.kernels.stems import fold_stem_bns, fused_stems
    from auto_dynamic_deeplab_tpu.models.decoded import _Stems
    from trace_measure import trace_and_sum

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 1025, 2049, 3).astype(np.float32))
    stems = _Stems(dtype=jnp.bfloat16)
    variables = stems.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 65, 65, 3), jnp.float32), False
    )
    args = fold_stem_bns(variables["params"], variables["batch_stats"])

    ref = None
    for ts1 in (2, 4, 8, 16):
        try:
            fn = lambda x: fused_stems(x, *args, TS1=ts1)  # noqa: E731
            s0, s1 = jax.tree.map(np.asarray, fn(x))
            if ref is None:
                ref = (s0, s1)
            else:
                # interpret mode is bit-identical across TS1; on hardware a
                # different row-tile changes the MXU accumulation tiling and
                # ~30ppm of near-tie elements round one bf16 ulp apart —
                # bound the drift instead of demanding bit equality.
                for got, want in zip((s0, s1), ref):
                    d = np.abs(got.astype(np.float32) - want.astype(np.float32))
                    frac = float((got != want).mean())
                    assert d.max() <= 0.0157 and frac < 1e-3, (d.max(), frac)
            t = trace_and_sum(fn, x, runs=5)["total_ms"]
            print(f"TS1={ts1:2d}: {t:.3f} ms/run")
        except Exception as e:
            print(f"TS1={ts1:2d}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
