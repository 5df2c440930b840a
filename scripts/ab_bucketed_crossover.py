"""Bucketed batched serving vs serial batch-1: FIND THE CROSSOVER.

VERDICT r4 weak #6: the round-4 full-resolution adjudication showed
`DynamicInferenceEngine.infer_batch` LOSES to the serial batch-1 segment
loop at 1025x2049 (16.3 vs ~11.1 ms/img at the same 2/4 exit mix — one
image already saturates the chip), and its docstring PREDICTS the batched
path pays only "when per-launch overhead dominates (small images,
dispatch-bound serving)". That prediction had never been measured. This
script measures it on the real chip across small resolutions and records
where (if anywhere) batching crosses over.

Metric: WALL time per image, chained via block_until_ready — in the
dispatch-bound regime the per-launch overhead (python dispatch + relay RTT
+ device launch) IS the quantity batching amortizes, so wall, not
device-profiler time, is the honest serving metric. Serial runs the
engine's real per-image serving path (`infer`, one scalar confidence
readback per decision, reference ADD.py:380-437); bucketed runs
`infer_batch` at the SAME entropy threshold (median exit-0 confidence of
the batch, so ~half the images exit early — the r4 mix).

Prints one JSON line; archive to docs/measurements/bucketed_crossover_r05.json.
"""
import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax

if "--cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")
    from auto_dynamic_deeplab_tpu.utils.initialize import machine_scoped_cache_dir

    jax.config.update("jax_compilation_cache_dir", machine_scoped_cache_dir())
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/add_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np


def build_engine(F: int):
    from auto_dynamic_deeplab_tpu.models import ADD
    from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE, NETWORK_ARCH
    from auto_dynamic_deeplab_tpu.train.dynamic import DynamicInferenceEngine
    from auto_dynamic_deeplab_tpu.utils.initialize import jit_init

    cfg = NETWORK_ARCH[2]
    model = ADD(
        cfg["path"], cfg["C_index"], AUTODEEPLAB_GENOTYPE, 19, F=F, B=5,
        low_level_layer=cfg["low_level_layer"], dtype=jnp.bfloat16,
    )
    variables = jit_init(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 65, 65, 3), jnp.float32),
        train=False,
    )
    return model, DynamicInferenceEngine(model, variables)


def measure(engine, hw, batch, repeats):
    rng = np.random.RandomState(0)
    xb = jnp.asarray(rng.randn(batch, *hw, 3), jnp.float32)
    size = tuple(hw)

    # threshold = median exit-0 entropy of THIS batch -> ~batch/2 exit early
    d0 = engine._decide(0, size, "entropy", 0.0)
    # decide programs are batch-shape-specialized; probe per-image (batch 1)
    per = [float(np.asarray(d0(xb[i : i + 1])[1])[0]) for i in range(batch)]
    thr = float(np.median(per))

    # ---- serial batch-1 serving loop (the engine's real per-image path)
    exits_serial = []
    for i in range(batch):  # warm every program the mix will touch
        _, e, _, _ = engine.infer(xb[i : i + 1], thr, "entropy")
        exits_serial.append(int(e))
    t0 = time.perf_counter()
    for _ in range(repeats):
        for i in range(batch):
            engine.infer(xb[i : i + 1], thr, "entropy")
    serial_ms = (time.perf_counter() - t0) / (repeats * batch) * 1000

    # ---- bucketed batched path at the same threshold
    bucket_sizes = [max(1, batch // 2), batch]
    _, exits_b = engine.infer_batch(
        xb, threshold=thr, confidence="entropy", bucket_sizes=bucket_sizes
    )  # warm + record split
    t0 = time.perf_counter()
    for _ in range(repeats):
        out, _ = engine.infer_batch(
            xb, threshold=thr, confidence="entropy", bucket_sizes=bucket_sizes
        )
    jax.block_until_ready(out)
    bucket_ms = (time.perf_counter() - t0) / (repeats * batch) * 1000

    n_early = int(sum(int(e) == 0 for e in exits_b))
    return {
        "hw": list(hw),
        "batch": batch,
        "threshold": round(thr, 4),
        "early_exit_count_bucketed": n_early,
        "exit_mix_serial": exits_serial,
        "serial_wall_ms_per_img": round(serial_ms, 3),
        "bucketed_wall_ms_per_img": round(bucket_ms, 3),
        "bucketed_over_serial": round(bucket_ms / serial_ms, 3),
        "pays_off": bool(bucket_ms < serial_ms),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--F", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument(
        "--sizes", type=str, default="129x129,257x257,513x513",
        help="comma-separated HxW list, small->large",
    )
    args = ap.parse_args()

    model, engine = build_engine(args.F)
    sizes = [tuple(map(int, s.split("x"))) for s in args.sizes.split(",")]

    rows = []
    for hw in sizes:
        t0 = time.perf_counter()
        row = measure(engine, hw, args.batch, args.repeats)
        row["total_phase_wall_s"] = round(time.perf_counter() - t0, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)

    crossover = next((r["hw"] for r in rows if r["pays_off"]), None)
    verdict = {
        "metric": "bucketed_vs_serial_crossover",
        "backend": jax.default_backend(),
        "rows": rows,
        "crossover_at": crossover,
        "r4_full_res_adjudication": (
            "1025x2049 b4: bucketed 16.3 ms/img DEVICE vs ~11.1 serial "
            "(BENCH_r04) — loses when one image saturates the chip"
        ),
        "verdict": (
            "bucketed batching pays at <= %sx%s (dispatch-bound)" % tuple(crossover)
            if crossover
            else "bucketed batching does NOT pay at any measured size: "
            "strike the small-image aspiration from the docs"
        ),
    }
    print(json.dumps(verdict), flush=True)


if __name__ == "__main__":
    main()
