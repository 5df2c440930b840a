"""Trace-based breakdown of the stage-2 train step on the real TPU.

The reference trains 2689 epochs (scripts/train_dist.sh) — training
throughput dominates the real-world cost of the pipeline. This traces the
single-device fwd+bwd+SGD step at the reference config (flagship ADD C=2
F=20, 769x769, bf16, remat) and groups device time by scope so the next
optimization target is measured, not guessed.

Usage: python scripts/profile_train_step.py [--bs 8] [--res 769] [--runs 3]
"""
import argparse
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
from trace_measure import trace_and_sum, pretty  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--res", type=int, default=769)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-remat", action="store_true")
    args = ap.parse_args()

    from auto_dynamic_deeplab_tpu.models import ADD
    from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE, NETWORK_ARCH
    from auto_dynamic_deeplab_tpu.train import (
        create_train_state,
        lr_schedule,
        make_optimizer,
        make_single_device_train_step,
    )

    cfg = NETWORK_ARCH[2]
    model = ADD(
        cfg["path"], cfg["C_index"], AUTODEEPLAB_GENOTYPE, 19,
        F=20, B=5, low_level_layer=cfg["low_level_layer"],
        dtype=jnp.bfloat16, remat=not args.no_remat,
    )
    tx = make_optimizer(lr_schedule("poly", 0.05, 2689, 100), weight_decay=4e-5)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, args.res, args.res, 3), jnp.float32), tx,
    )
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(args.bs, args.res, args.res, 3), jnp.float32),
        "label": jnp.asarray(
            rng.randint(0, 19, (args.bs, args.res, args.res)), jnp.int32
        ),
    }
    step = make_single_device_train_step(model, tx)
    holder = {"state": state}

    def timed(_):
        holder["state"], m = step(holder["state"], batch)
        return m

    r = trace_and_sum(timed, 0, runs=args.runs, segments=(1, 2))
    pretty(r, top=30)
    t = r["total_ms"]
    print(
        f"\nstep: {t:.1f} ms  ->  {args.bs / (t / 1000.0):.2f} img/s/chip "
        f"(bs{args.bs} {args.res}x{args.res} bf16 remat={not args.no_remat})"
    )
    try:
        s = jax.devices()[0].memory_stats()
        print(
            f"HBM: {s.get('peak_bytes_in_use', 0) / 2**30:.2f} GiB peak / "
            f"{s.get('bytes_limit', 0) / 2**30:.2f} GiB"
        )
    except Exception:
        pass


if __name__ == "__main__":
    main()
