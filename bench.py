"""Benchmark on the attached TPU chip: flagship ADD (C=2, F=20, B=5) at the
Cityscapes eval resolution (1025x2049, batch 1, bf16 compute).

Headline: dynamic early-exit inference throughput (exit at the first exit —
the fast path early exit buys). The extra fields bench the PRODUCT surface
(reference: eval.py:195-230):
  * EDM-gated dynamic inference with real EDM weights from a synthetic
    stage-3 (make_edm_dataset + train_edm), early-exit and full-depth;
  * an entropy-threshold sweep reporting exit-rate vs expected latency
    (exit rates measured by running the fused program per image; expected
    latency = rate-weighted mix of the measured per-exit device times);
  * trace-based training throughput at 769x769 bf16 (the stage-2 config).

Timing is DEVICE time from jax.profiler traces, validated against matmul
physics (a 4096^3 bf16 matmul measures 0.76 ms = 182 TF/s on v5e, 92% of
peak). Host wall clocks are untrustworthy here: dispatch is asynchronous
(block_until_ready returns before the device finishes) and the relay
de-duplicates identical in-flight executions, so wall-based "latencies"
can read 50x better than physics allows.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
The reference publishes no numbers (BASELINE.md), so vs_baseline is NOT a
reference comparison: it is the full-depth/early-exit device-time ratio
(the speedup early exit buys) — see "vs_baseline_meaning".
"""
import json
import os
import sys
import time

_T0 = time.monotonic()
# Hard wall-clock budget: the driver runs bench under its own timeout and a
# kill mid-run records nothing (round 2: rc=124, no JSON). Phases beyond the
# headline are skipped when the remaining budget can't fit their compiles,
# and a watchdog prints the best-so-far JSON and exits 0 at the deadline.
_DEADLINE_S = float(os.environ.get("ADD_BENCH_DEADLINE_S", "540"))


def _remaining() -> float:
    return _DEADLINE_S - (time.monotonic() - _T0)


def _mark(phase: str):
    sys.stderr.write(f"bench[{time.monotonic() - _T0:7.1f}s] {phase}\n")
    sys.stderr.flush()

if "--smoke" in sys.argv[1:]:
    # Smoke mode validates the bench CODE PATH on CPU. The JAX_PLATFORMS
    # env var alone is not honored when a platform plugin is preloaded
    # (sitecustomize), and a dead TPU relay hangs backend init — force the
    # CPU platform through the config API before backend init.
    os.environ.pop("JAX_PLATFORMS", None)

import jax

if "--smoke" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the fused dynamic program takes minutes to
# compile on a remote-relay TPU; cache it across processes.
if "JAX_COMPILATION_CACHE_DIR" in os.environ:
    _cache_dir = os.environ["JAX_COMPILATION_CACHE_DIR"]
elif "--smoke" in sys.argv[1:]:
    # smoke runs on CPU: host-feature-specific executables get their own dir
    from auto_dynamic_deeplab_tpu.utils.initialize import machine_scoped_cache_dir

    _cache_dir = machine_scoped_cache_dir()
else:
    _cache_dir = "/tmp/add_tpu_jax_cache"
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))


def _train_synthetic_edm(model, variables, rng, size):
    """Real stage-3 EDM weights from a synthetic dataset: features/entropies
    from the frozen backbone's first-exit program on synthetic images
    (train_edm.py:146-185 pipeline, smaller corpus)."""
    from auto_dynamic_deeplab_tpu.train.edm_trainer import (
        make_edm_dataset,
        train_edm,
    )

    images = [
        {"image": rng.randn(1, *size, 3).astype(np.float32)} for _ in range(6)
    ]
    feats, ents = make_edm_dataset(model, variables, images)
    # The random-init backbone emits features with std ~5e2 (a trained
    # stage-2 wouldn't), which leaves Adam hopelessly ill-conditioned
    # against the [0,1] entropy targets (final L1 ~60 at the real feature
    # resolution). Condition the problem with a per-channel SCALE-only
    # standardization — it commutes with the EDM's leading ReLU
    # (relu(x/s) = relu(x)/s for s>0) — train on the scaled corpus, then
    # fold 1/s into the first conv kernel's input channels so the returned
    # weights consume RAW features (exactly what the product engine feeds).
    sd = feats.std(axis=(0, 1, 2)) + 1e-6
    edm, scaled_vars, loss = train_edm(
        feats / sd, ents, epochs=400, batch_size=3, lr=1e-2
    )
    params = dict(scaled_vars["params"])
    params["conv"] = dict(
        params["conv"], kernel=params["conv"]["kernel"] / sd[None, None, :, None]
    )
    edm_vars = {**scaled_vars, "params": params}
    on_raw = np.asarray(edm.apply(edm_vars, jnp.asarray(feats[:2]))[:, 0])
    on_scaled = np.asarray(
        edm.apply(scaled_vars, jnp.asarray(feats[:2] / sd))[:, 0]
    )
    drift = float(np.abs(on_raw - on_scaled).max())
    assert drift < 1e-3, f"scale fold drifted: {drift}"
    return edm, edm_vars, loss


def _backend_watchdog(seconds: float = 240.0):
    """Fail fast instead of hanging forever when the TPU relay is down:
    backend init (jax.devices) can block indefinitely on a dead relay.
    Returns a cancel() to call once the backend is up."""
    import threading

    done = threading.Event()

    def fire():
        if not done.wait(seconds):
            sys.stderr.write(
                f"bench: backend init did not complete in {seconds:.0f}s "
                "(TPU relay down?) — aborting\n"
            )
            sys.stderr.flush()
            os._exit(17)

    threading.Thread(target=fire, daemon=True).start()
    return done.set


def _deadline_watchdog(result_holder: dict):
    """At the deadline, print the best-so-far result (if the headline was
    measured) and exit 0 — a driver-side kill records nothing at all."""
    import threading

    done = threading.Event()

    def fire():
        while not done.wait(min(10.0, max(_remaining(), 0.1))):
            if _remaining() > 0:
                continue
            if "result" in result_holder:
                result_holder["result"]["note"] = (
                    result_holder["result"].get("note", "")
                    + " [deadline hit: later phases skipped]"
                )
                print(json.dumps(result_holder["result"]), flush=True)
                os._exit(0)
            sys.stderr.write(
                f"bench: deadline {_DEADLINE_S:.0f}s hit before the headline "
                "metric was measured — aborting\n"
            )
            os._exit(18)

    threading.Thread(target=fire, daemon=True).start()
    return done.set


def main(smoke: bool = False):
    """smoke=True: tiny shapes / tiny F so the whole surface executes in
    minutes on CPU — validates the bench code path, not performance."""
    cancel = _backend_watchdog()
    jax.devices()  # backend init; hangs here if the relay is dead
    cancel()
    _mark('backend up')
    holder: dict = {}
    cancel_deadline = _deadline_watchdog(holder)

    from auto_dynamic_deeplab_tpu.models import ADD
    from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE, NETWORK_ARCH
    from auto_dynamic_deeplab_tpu.train import (
        create_train_state,
        lr_schedule,
        make_optimizer,
        make_single_device_train_step,
    )
    from auto_dynamic_deeplab_tpu.train.dynamic import DynamicInferenceEngine
    from trace_measure import trace_and_sum

    rng = np.random.RandomState(0)
    cfg = NETWORK_ARCH[2]
    F = 2 if smoke else 20
    eval_hw = (65, 129) if smoke else (1025, 2049)
    edm_hw = (65, 129) if smoke else (513, 1025)
    train_hw = (65, 65) if smoke else (769, 769)
    train_bs = 2 if smoke else 8
    runs = 1 if smoke else 8
    runs_slow = 1 if smoke else 4  # EDM programs + train step (pre-smoke counts)
    model = ADD(
        cfg["path"], cfg["C_index"], AUTODEEPLAB_GENOTYPE, 19,
        F=F, B=5, low_level_layer=cfg["low_level_layer"], dtype=jnp.bfloat16,
    )
    from auto_dynamic_deeplab_tpu.utils.initialize import jit_init

    # jitted init: the eager flax init measured 274 s of pure dispatch RTT
    # over the relay (bench phase log) — one compiled program instead.
    variables = jit_init(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 65, 65, 3), jnp.float32),
        train=False,
    )
    xs = [
        jnp.asarray(rng.randn(1, *eval_hw, 3).astype(np.float32))
        for _ in range(4)
    ]
    x = xs[0]

    # ---- entropy-gated fused program: per-exit device times ---------------
    _mark('model init done')
    engine = DynamicInferenceEngine(model, variables)
    program = engine.fused_program(eval_hw, confidence="entropy")

    def early(x):  # permissive threshold → exit at the first station
        return program(x, jnp.float32(2.0))

    def full(x):  # impossible threshold → full depth
        return program(x, jnp.float32(-1.0))

    # On CPU (smoke) profiler traces carry no device events → 0 ms; clamp so
    # smoke mode still exercises every downstream formula without dividing
    # by zero (the smoke numbers are code-path validation, not performance).
    # On the real backend an empty trace is a measurement failure (e.g. a
    # relay outage mid-bench) and must fail loudly, not record garbage.
    def _t(r):
        if not smoke and r["total_ms"] <= 0.0:
            raise RuntimeError("empty device trace: refusing to report 0 ms")
        return max(r["total_ms"], 1e-6) / 1000.0

    _mark('fused program built; tracing early')
    t_early = _t(trace_and_sum(early, x, runs=runs))
    _mark('early traced')
    t_full = _t(trace_and_sum(full, x, runs=runs))
    _mark('full traced')

    result = {
        "metric": (
            "SMOKE_add_c2_dynamic_earlyexit" if smoke
            else "add_c2_dynamic_earlyexit_1025x2049_b1"
        ),
        "value": round(1.0 / t_early, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(t_full / t_early, 4),
        "vs_baseline_meaning": "full-depth/early-exit device-time ratio (NOT a reference comparison; the reference publishes no numbers — BASELINE.md)",
        "early_exit_latency_ms": round(t_early * 1000, 2),
        "full_depth_latency_ms": round(t_full * 1000, 2),
        "device": str(jax.devices()[0]),
        "note": "device-time via jax.profiler trace (host wall clocks lie on relays); single-program lax.cond dynamic inference",
    }
    # Headline measured: print immediately (insurance against a driver-side
    # kill mid-extras — the LAST JSON line printed wins) and arm the watchdog
    # fallback. Each further phase runs only if its compile budget fits.
    holder["result"] = result
    print(json.dumps(result), flush=True)

    # ---- p50 latency (BASELINE.md: "images/sec/chip and p50 latency") -----
    if not smoke and _remaining() > 90:
        # Median across independent single-run traces (host wall percentiles
        # are meaningless through the relay's noisy RTT).
        _mark('p50 singles')
        singles = sorted(
            _t(trace_and_sum(early, x, runs=1)) for _ in range(5)
        )
        # Higher than the 8-run mean: an isolated execution carries
        # per-dispatch overhead that pipelined back-to-back runs amortize.
        result["p50_early_exit_latency_ms"] = round(singles[2] * 1000, 2)
        print(json.dumps(result), flush=True)

    # ---- all-exits forward + FLOPs/params (eval.py:233-238 surface) -------
    if smoke or _remaining() > 90:
        # Weights as jit ARGUMENTS (not closed-over constants): remote-relay
        # runtimes re-upload embedded constants every execution (~46 MB).
        _mark('all-exits fwd')
        fwd = jax.jit(lambda v, x: tuple(model.apply(v, x, train=False)))
        t_fwd = _t(trace_and_sum(fwd, variables, x, runs=runs))
        result["all_exits_forward_ms"] = round(t_fwd * 1000, 2)
        try:
            from auto_dynamic_deeplab_tpu.utils.flops import count_params

            analysis = fwd.lower(variables, x).compile().cost_analysis()
            if isinstance(analysis, list):
                analysis = analysis[0]
            result["complexity"] = {
                "params": count_params(variables["params"]),
                "all_exits_forward_gflops": round(
                    float((analysis or {}).get("flops", -1e9)) / 1e9, 2
                ),
            }
        except Exception as exc:  # cost analysis is backend-dependent
            result["complexity"] = {"error": str(exc)[:120]}

    # ---- entropy threshold sweep: exit rate vs expected latency -----------
    # Exit decisions per image per threshold from the fused program (cheap,
    # no tracing); expected latency mixes the measured per-exit times.
    if smoke or _remaining() > 45:
        _mark('sweep')
        # Dispatch everything asynchronously, block once: a per-call
        # readback costs a full relay round trip (50-500 ms each).
        conf_pend = [program(xi, jnp.float32(-1.0))[2] for xi in xs]
        jax.block_until_ready(conf_pend)
        ents = [float(np.asarray(c)) for c in conf_pend]
        qs = np.quantile(ents, [0.25, 0.5, 0.75])
        sweep = []
        thresholds = sorted({0.0, *[round(float(q), 4) for q in qs], 1.0})
        exit_pend = {
            thr: [program(xi, jnp.float32(thr))[1] for xi in xs]
            for thr in thresholds
        }
        jax.block_until_ready(exit_pend)
        for thr in thresholds:
            exits = [int(np.asarray(e)) for e in exit_pend[thr]]
            rate = float(np.mean([e == 0 for e in exits]))
            sweep.append(
                {
                    "threshold": thr,
                    "early_exit_rate": rate,
                    "expected_latency_ms": round(
                        (rate * t_early + (1 - rate) * t_full) * 1000, 2
                    ),
                }
            )
        result["entropy_threshold_sweep"] = sweep
        print(json.dumps(result), flush=True)

    # ---- training throughput: stage-2 step at 769x769 bf16 ----------------
    # remat=False: the full fwd+bwd fits HBM up to bs16 at 769x769 (measured
    # 08-19, profile_train_step.py) and remat costs 19-23% step time here
    # (bs8: 164.2 -> 133.2 ms). Remat remains available (--remat) for
    # configs that need it (supernet search, larger crops/batches).
    if smoke or _remaining() > 150:
        _mark('train phase')
        train_model = ADD(
            cfg["path"], cfg["C_index"], AUTODEEPLAB_GENOTYPE, 19,
            F=F, B=5, low_level_layer=cfg["low_level_layer"],
            dtype=jnp.bfloat16, remat=False,
        )
        bs = train_bs
        tx = make_optimizer(
            lr_schedule("poly", 0.05, 100, 100), weight_decay=4e-5
        )
        state = create_train_state(
            train_model,
            jax.random.PRNGKey(0),
            jnp.zeros((1, *train_hw, 3), jnp.float32),
            tx,
        )
        step = make_single_device_train_step(train_model, tx)
        batch = {
            "image": jnp.asarray(rng.randn(bs, *train_hw, 3).astype(np.float32)),
            "label": jnp.asarray(
                rng.randint(0, 19, size=(bs, *train_hw)).astype(np.int32)
            ),
        }
        # the step donates its state argument: chain states across calls
        sholder = {"state": state}

        def timed_step(_):
            sholder["state"], metrics = step(sholder["state"], batch)
            return metrics

        t_train = _t(trace_and_sum(timed_step, 0, runs=runs_slow))
        result["train_769x769_bf16"] = {
            "batch": bs,
            "step_ms": round(t_train * 1000, 2),
            "images_per_sec_per_chip": round(bs / t_train, 2),
        }
        print(json.dumps(result), flush=True)

    # ---- bucketed batched dynamic inference (serving throughput) ----------
    # BASELINE.json: early exits must save FLOPs "under XLA (masked batching
    # / cond-gated programs)". The cond-gated program is the batch-1 number
    # above; this is the batched path: per-exit confidences for the whole
    # batch, then only the continuing images re-launch, compacted to padded
    # buckets (train/dynamic.py infer_batch).
    if smoke or _remaining() > 80:
        _mark('bucketed batch phase')
        xb = jnp.concatenate(xs, axis=0)  # (4, H, W, 3)
        conf_pend = [program(xi, jnp.float32(2.0))[2] for xi in xs]
        jax.block_until_ready(conf_pend)
        thr_b = float(np.median([float(np.asarray(c)) for c in conf_pend]))

        def bucketed(_):
            # bucket_sizes pinned to [2, 4]: the exit split jitters with bf16
            # near-ties between runs, and per-bucket segment programs are
            # separate compiles — one stable bucket covers keep-counts 1-2.
            return engine.infer_batch(
                xb, threshold=thr_b, confidence="entropy", bucket_sizes=[2, 4]
            )

        _, exits_b = bucketed(0)  # warm + record the exit split
        t_bucket = _t(trace_and_sum(bucketed, 0, runs=runs_slow))
        result["bucketed_dynamic_b4"] = {
            "batch": int(xb.shape[0]),
            "device_ms_per_batch": round(t_bucket * 1000, 2),
            "images_per_sec_per_chip": round(xb.shape[0] / t_bucket, 2),
            "threshold": round(thr_b, 4),
            "early_exit_count": int(sum(int(e) == 0 for e in exits_b)),
        }
        print(json.dumps(result), flush=True)

    # ---- EDM-gated dynamic inference (real synthetic-trained EDM) ---------
    if smoke or _remaining() > 140:
        _mark('edm phase')
        edm, edm_vars, edm_loss = _train_synthetic_edm(
            model, variables, rng, edm_hw
        )
        edm_engine = DynamicInferenceEngine(
            model, variables, edm=edm, edm_variables=edm_vars
        )
        edm_prog = edm_engine.fused_program(eval_hw, confidence="edm")
        conf_pend = [edm_prog(xi, jnp.float32(-1e9))[2] for xi in xs]
        jax.block_until_ready(conf_pend)
        confs = [float(np.asarray(c)) for c in conf_pend]
        thr_mix = float(np.median(confs))  # EDM exits when conf <= threshold
        t_edm_early = _t(
            trace_and_sum(
                lambda x: edm_prog(x, jnp.float32(1e9)), x, runs=runs_slow
            )
        )
        t_edm_full = _t(
            trace_and_sum(
                lambda x: edm_prog(x, jnp.float32(-1e9)), x, runs=runs_slow
            )
        )
        rate_pend = [edm_prog(xi, jnp.float32(thr_mix))[1] for xi in xs]
        jax.block_until_ready(rate_pend)
        edm_rate = float(
            np.mean([int(np.asarray(e)) == 0 for e in rate_pend])
        )
        result["edm_gated"] = {
            "early_exit_latency_ms": round(t_edm_early * 1000, 2),
            "full_depth_latency_ms": round(t_edm_full * 1000, 2),
            "edm_train_l1_loss": round(edm_loss, 4),
            "median_threshold": round(thr_mix, 4),
            "exit_rate_at_median": edm_rate,
        }
        print(json.dumps(result), flush=True)

    skipped = [
        k for k in (
            "all_exits_forward_ms", "entropy_threshold_sweep",
            "train_769x769_bf16", "edm_gated", "bucketed_dynamic_b4",
        ) if k not in result
    ]
    if not smoke and "p50_early_exit_latency_ms" not in result:
        skipped.append("p50_early_exit_latency_ms")
    if skipped:
        result["skipped_phases"] = skipped
    cancel_deadline()
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main(smoke="--smoke" in sys.argv[1:])
