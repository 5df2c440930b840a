"""Benchmark: flagship ADD (C=2, F=20, B=5) inference throughput on the
attached TPU chip at the Cityscapes eval resolution (1025x2049, batch 1),
bf16 compute.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The reference publishes no numbers (BASELINE.md); vs_baseline is reported
against the BASELINE.json north-star target only when measurable, else 1.0.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from __graft_entry__ import entry

    fn, example_args = entry()
    fitted = jax.jit(fn)

    # warmup / compile
    out = fitted(*example_args)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fitted(*example_args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    imgs_per_sec = example_args[0].shape[0] / dt
    print(
        json.dumps(
            {
                "metric": "add_c2_all_exits_forward_1025x2049_b1",
                "value": round(imgs_per_sec, 4),
                "unit": "images/sec/chip",
                "vs_baseline": 1.0,
                "p50_latency_ms": round(dt * 1000, 2),
                "device": str(jax.devices()[0]),
                "note": "reference publishes no benchmark numbers (BASELINE.md)",
            }
        )
    )


if __name__ == "__main__":
    main()
