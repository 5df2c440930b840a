"""Demonstrate the MESH-SHARDED mixed cell+path supernet bilevel search at
the reference's default config (search.py:77-88: `--network supernet`, 12L,
F=20, B=5, 321x321) — the one config that OOMs every single-chip execution
form on a 16 GB v5e (SCALE_r03.json).

Runs ONE weight step + ONE arch step of `make_search_steps(mesh=...)` on an
8-device virtual CPU mesh (bs8 global = 8 chips x bs1), scan-mode mixed
cells + remat — exactly the sharded program a real v5e-8 slice would run —
and records compile/step wall times and the compiled per-device memory
analysis in SCALE_r04.json-ready JSON on stdout.

Usage: python scripts/scale_supernet_mesh.py [--batch 8] [--hw 321]
"""
import argparse
import json
import os
import resource
import subprocess
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, default=321)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--F", type=int, default=20)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--compile-only", action="store_true",
                    help="lower+compile the weight step and record the "
                         "per-device HLO memory analysis, skip execution. "
                         "For mesh widths whose total replica temps exceed "
                         "THIS single host's RAM (a virtual N-device CPU "
                         "mesh backs all N devices with one host; a real "
                         "slice gives each chip its own 16 GB HBM).")
    args = ap.parse_args()

    os.environ.pop("JAX_PLATFORMS", None)
    # XLA CPU collectives carry a hard 40 s rendezvous termination timeout;
    # on a 1-core host the 8 replica threads reach the first all-reduce
    # minutes apart (per-replica compute at this config is minutes), which
    # F-check-aborted two runs. Raise it — correctness, not liveness, is
    # what this demo attests. Respect any caller-provided XLA_FLAGS.
    flags = os.environ.get("XLA_FLAGS", "")
    if "collective_call_terminate_timeout" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", int(args.devices))
    from auto_dynamic_deeplab_tpu.utils.initialize import machine_scoped_cache_dir

    jax.config.update("jax_compilation_cache_dir", machine_scoped_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import numpy as np

    from auto_dynamic_deeplab_tpu.models import ModelSearch
    from auto_dynamic_deeplab_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from auto_dynamic_deeplab_tpu.train.schedules import lr_schedule
    from auto_dynamic_deeplab_tpu.train.step import (
        make_arch_optimizer,
        make_search_steps,
    )
    from auto_dynamic_deeplab_tpu.utils.initialize import jit_init
    import optax

    t_start = time.monotonic()
    # bf16 compute / f32 params — the production search precision (and what
    # scale_proof.py's single-chip attempts use). The f32 form of this demo
    # was OOM-killed at 130 GB host RSS: 8 replicas' fwd+bwd activations at
    # 321^2 F=20 exceed the 125 GB host; bf16 halves them.
    model = ModelSearch(
        19, num_layers=args.layers, F=args.F, B=5, exit_layer=5,
        remat=True, axis_name=DATA_AXIS, mixed_exec="scan",
        dtype=jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    hw = (args.hw, args.hw)
    batch = {
        "image": jnp.asarray(
            rng.randn(args.batch, *hw, 3).astype(np.float32)
        ),
        "label": jnp.asarray(
            rng.randint(0, 19, (args.batch, *hw)).astype(np.int32)
        ),
    }
    variables = jit_init(
        model, jax.random.PRNGKey(0), batch["image"][:1], train=True
    )
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"])
    )
    t_init = time.monotonic() - t_start

    schedule = lr_schedule("cos", 0.05, 300, 1, min_lr=0.003)
    w_tx = optax.chain(
        optax.add_decayed_weights(8e-4),
        optax.sgd(learning_rate=schedule, momentum=0.9),
    )
    a_tx = make_arch_optimizer(1e-3, 1e-3)
    mesh = make_mesh(n_data=args.devices)
    weight_step, arch_step = make_search_steps(model, w_tx, a_tx, mesh=mesh)

    params, stats, arch = (
        variables["params"], variables.get("batch_stats", {}), variables["arch"]
    )
    w_opt = w_tx.init(params)
    a_opt = a_tx.init(arch)

    # compile + memory analysis for the weight step
    t0 = time.monotonic()
    lowered = weight_step.lower(params, stats, arch, w_opt, batch)
    compiled = lowered.compile()
    t_w_compile = time.monotonic() - t0
    mem = {}
    try:
        m = compiled.memory_analysis()
        mem = {
            "hlo_argument_gb": round(m.argument_size_in_bytes / 2**30, 3),
            "hlo_temp_gb": round(m.temp_size_in_bytes / 2**30, 3),
            "hlo_output_gb": round(m.output_size_in_bytes / 2**30, 3),
        }
    except Exception as exc:  # backend-dependent
        mem = {"error": str(exc)[:120]}

    if args.compile_only:
        peak_rss_gb = (
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20
        )
        print(json.dumps({
            "config": (
                f"ModelSearch (mixed cell+path, search.py:77-88 default) "
                f"{args.layers}L F={args.F} B=5, {args.hw}x{args.hw} "
                f"bs{args.batch} global over {args.devices}-device mesh "
                f"(bs{args.batch // args.devices}/device), scan cells, "
                "remat, bf16 compute / f32 params, COMPILE-ONLY"
            ),
            "n_weight_params": n_params,
            "init_wall_s": round(t_init, 1),
            "weight_step_compile_wall_s": round(t_w_compile, 1),
            "memory_per_device": mem,
            "host_peak_rss_gb": round(peak_rss_gb, 2),
        }), flush=True)
        return

    t0 = time.monotonic()
    params, stats, w_opt, w_loss = compiled(params, stats, arch, w_opt, batch)
    w_loss = float(w_loss)
    t_w_step = time.monotonic() - t0

    t0 = time.monotonic()
    arch, stats, a_opt, a_loss = arch_step(params, stats, arch, a_opt, batch)
    a_loss = float(a_loss)
    t_a = time.monotonic() - t0

    peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20
    out = {
        "config": (
            f"ModelSearch (mixed cell+path, search.py:77-88 default) "
            f"{args.layers}L F={args.F} B=5, {args.hw}x{args.hw} "
            f"bs{args.batch} global over {args.devices}-device mesh "
            f"(bs{args.batch // args.devices}/device), scan cells, remat, "
            "bf16 compute / f32 params, bilevel shard_map steps "
            "(grad pmean + BN psum)"
        ),
        "n_weight_params": n_params,
        "init_wall_s": round(t_init, 1),
        "weight_step_compile_wall_s": round(t_w_compile, 1),
        "weight_step_wall_s": round(t_w_step, 1),
        "arch_step_wall_s_incl_compile": round(t_a, 1),
        "weight_loss": round(w_loss, 4),
        "arch_loss": round(a_loss, 4),
        "memory_per_device": mem,
        "host_peak_rss_gb": round(peak_rss_gb, 2),
        "note": (
            "virtual CPU mesh (jax_num_cpu_devices): same GSPMD program a "
            "v5e-8 runs; per-device HLO memory is the 16 GB-HBM-relevant "
            "number. Wall times are 1-core-CPU compile/execute — NOT device "
            "performance"
        ),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    main()
