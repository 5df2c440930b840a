"""Scale proof on the real TPU chip (VERDICT r1 item 4).

Nothing in round 1 ever ran at reference scale. This script compiles and
traces, on the attached chip:

  1. ONE stage-1 search-supernet step at the reference search config
     (scripts/search_cityscapes.sh): 12-layer x 4-level trellis, F=20, B=5,
     mixed cells (cell+path search), 321x321, bs >= 2, remat — the weight
     step AND the arch (bilevel) step;
  2. ONE stage-2 train step at the reference train config
     (scripts/train_dist.sh): flagship ADD C=2 F=20, 769x769, target bs16
     (4 GPUs x bs4 in the reference), falling back bs16 -> 8 -> 4 on OOM
     with the failure recorded.

Reports trace-based device step time and HBM memory stats per phase.
Usage: python scripts/scale_proof.py [--out FILE]
"""
import argparse
import json
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
from trace_measure import trace_and_sum


def _mem(jitted=None, *args, **kwargs):
    """Runtime HBM stats when the backend exposes them; otherwise (relay
    backends return None) fall back to the compiled program's own memory
    analysis (argument/output/temp sizes — the compiler's HBM plan)."""
    out = {}
    try:
        s = jax.devices()[0].memory_stats()
        if s:
            out.update(
                bytes_in_use_gb=round(s.get("bytes_in_use", 0) / 2**30, 3),
                peak_bytes_in_use_gb=round(
                    s.get("peak_bytes_in_use", 0) / 2**30, 3
                ),
                bytes_limit_gb=round(s.get("bytes_limit", 0) / 2**30, 3),
            )
    except Exception as e:
        out["stats_error"] = str(e)[:200]
    if jitted is not None:
        try:  # cached compile: lower+compile of an already-run jit is a hit
            m = jitted.lower(*args, **kwargs).compile().memory_analysis()
            arg = getattr(m, "argument_size_in_bytes", 0)
            tmp = getattr(m, "temp_size_in_bytes", 0)
            outb = getattr(m, "output_size_in_bytes", 0)
            out["hlo_argument_gb"] = round(arg / 2**30, 3)
            out["hlo_temp_gb"] = round(tmp / 2**30, 3)
            out["hlo_output_gb"] = round(outb / 2**30, 3)
            out["hlo_peak_est_gb"] = round((arg + tmp + outb) / 2**30, 3)
        except Exception as e:
            out["hlo_error"] = str(e)[:200]
    return out


def search_supernet_step(res=321, bs=2, network="supernet", remat=True,
                         mixed_exec="edges", remat_policy=None):
    from auto_dynamic_deeplab_tpu.models import ModelNetSearch, ModelSearch
    from auto_dynamic_deeplab_tpu.train import lr_schedule, make_search_steps
    from auto_dynamic_deeplab_tpu.train.step import make_arch_optimizer, make_optimizer

    if network == "net_supernet":
        # the reference's PUBLISHED search recipe (search_cityscapes.sh):
        # path-only supernet, fixed genotype cells, betas-only arch, bs16,
        # C=2 -> exit station [5]
        from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE

        model = ModelNetSearch(
            19, AUTODEEPLAB_GENOTYPE, num_layers=12, F=20, B=5,
            C_index=(5,), remat=remat, dtype=jnp.bfloat16,
        )
    else:
        model = ModelSearch(
            19, num_layers=12, F=20, B=5, remat=remat, dtype=jnp.bfloat16,
            mixed_exec=mixed_exec, remat_policy=remat_policy,
        )
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(bs, res, res, 3), jnp.float32),
        "label": jnp.asarray(rng.randint(0, 19, (bs, res, res)), jnp.int32),
    }
    import time as _time

    t0 = _time.time()
    v = model.init(jax.random.PRNGKey(0), batch["image"][:1], train=True)
    params, stats, arch = v["params"], v["batch_stats"], v["arch"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"[scale_proof]   init done ({_time.time() - t0:.0f}s)", flush=True)

    w_tx = make_optimizer(lr_schedule("cos", 0.025, 300, 100, min_lr=0.003),
                          weight_decay=3e-4)
    a_tx = make_arch_optimizer(3e-3, weight_decay=1e-3)
    w_opt, a_opt = w_tx.init(params), a_tx.init(arch)
    w_step, a_step = make_search_steps(model, w_tx, a_tx)

    t0 = _time.time()
    p1, st1, w_opt, loss = w_step(params, stats, arch, w_opt, batch)
    loss = float(loss)
    print(f"[scale_proof]   weight step compiled+ran ({_time.time() - t0:.0f}s)",
          flush=True)
    t_w = trace_and_sum(
        lambda: w_step(params, stats, arch, w_opt, batch), runs=3
    )["total_ms"]
    ar1, _, a_opt, aloss = a_step(p1, st1, arch, a_opt, batch)
    t_a = trace_and_sum(
        lambda: a_step(p1, st1, arch, a_opt, batch), runs=3
    )["total_ms"]
    assert np.isfinite(loss) and np.isfinite(float(aloss))
    return {
        "config": (
            f"{'ModelNetSearch (reference search_cityscapes.sh recipe)' if network == 'net_supernet' else 'ModelSearch mixed'}"
            f" 12L F=20 B=5, {res}x{res} bs{bs}, remat={remat}, "
            f"mixed_exec={mixed_exec}, bf16"
        ),
        "n_weight_params": n_params,
        "weight_step_ms": round(t_w, 1),
        "arch_step_ms": round(t_a, 1),
        "weight_loss": round(loss, 4),
        "imgs_per_sec_chip_weight_step": round(bs / (t_w / 1000.0), 2),
        "memory": _mem(w_step, params, stats, arch, w_opt, batch),
    }


def train_step_769(bs):
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
        dtype=jnp.bfloat16, remat=False,
    )
    tx = make_optimizer(lr_schedule("poly", 0.05, 2689, 100), weight_decay=4e-5)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 769, 769, 3), jnp.float32), tx
    )
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(bs, 769, 769, 3), jnp.float32),
        "label": jnp.asarray(rng.randint(0, 19, (bs, 769, 769)), jnp.int32),
    }
    step = make_single_device_train_step(model, tx)
    holder = {"state": state}

    def timed(_):
        holder["state"], m = step(holder["state"], batch)
        return m

    loss = float(timed(0)["loss"])
    t = trace_and_sum(timed, 0, runs=3)["total_ms"]
    assert np.isfinite(loss)
    return {
        "config": f"ADD C=2 F=20 769x769 bs{bs}, no-remat, bf16",
        "step_ms": round(t, 1),
        "images_per_sec_per_chip": round(bs / (t / 1000.0), 2),
        "loss": round(loss, 4),
        "memory": _mem(step, holder["state"], batch),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--search-bs", type=int, default=2)
    ap.add_argument("--supernet-remat", action="store_true",
                    help="remat the mixed-supernet cells: the scan+no-remat "
                         "form OOMed HBM at compile (r2) — remat trades the "
                         "stacked scan temps for recompute")
    ap.add_argument("--supernet-remat-policy", default=None,
                    choices=["dots", "offload_dots"],
                    help="jax.checkpoint policy for the remat'd cells; "
                         "'offload_dots' saves conv/matmul results to "
                         "pinned HOST memory — the single-chip fallback "
                         "for the 12L F=20 config that OOMs 16 GB HBM "
                         "under plain remat (SCALE_r03). Implies "
                         "--supernet-remat.")
    ap.add_argument("--train-bs", type=int, default=16)
    ap.add_argument("--only", nargs="+", default=None,
                    help="run only these phases (train_769, search_net_321, "
                         "search_supernet_321); merge into --out if it exists")
    args = ap.parse_args()

    import time

    result = {"device": str(jax.devices()[0])}
    if args.only and args.out and os.path.exists(args.out):
        with open(args.out) as f:
            result.update(json.load(f))

    def flush():
        text = json.dumps(result, indent=2)
        print(text, flush=True)
        if args.out:
            with open(args.out, "w") as f:
                f.write(text + "\n")

    # Train step first: it is known to compile in minutes; the supernet
    # compile can take hours on the relay, and a timeout mid-compile must
    # not lose the phases that DID finish (r2 runbook lesson: 90 min of
    # supernet compile produced an empty scale_proof.txt).
    bs = args.train_bs
    while bs >= 4 and (args.only is None or "train_769" in args.only):
        print(f"[scale_proof] train_769 bs{bs} ...", flush=True)
        t0 = time.time()
        try:
            result[f"train_769_bs{bs}"] = train_step_769(bs)
            result[f"train_769_bs{bs}"]["phase_wall_s"] = round(time.time() - t0, 1)
            flush()
            break
        except Exception as e:
            result[f"train_769_bs{bs}"] = {"error": f"{type(e).__name__}: {e}"[:800]}
            flush()
            bs //= 2

    # The reference's published stage-1 recipe (search_cityscapes.sh) is the
    # path-only net_supernet at bs16 — prove that first. The full mixed
    # cell+path supernet (the reference's --network default, never used by
    # its shipped scripts) is a far larger graph: per-edge, its bilevel
    # step's MLIR is ~88 MB and the relay's AOT compile helper was
    # SIGKILLed on it (08-19); banked cells shrank it to 18 MB serialized
    # and STILL got SIGKILLed. mixed_exec='scan' traces each cell's
    # primitives once (whole DAG as one lax.scan'd banked op) for another
    # ~5x; run without remat (smaller HLO; 321x321 bs2 activations are
    # small enough without checkpointing).
    phases = [
        ("search_net_321", dict(bs=args.train_bs, network="net_supernet")),
        ("search_supernet_321", dict(bs=args.search_bs,
                                     remat=(args.supernet_remat
                                            or args.supernet_remat_policy
                                            is not None),
                                     remat_policy=args.supernet_remat_policy,
                                     mixed_exec="scan")),
    ]
    for name, kw in phases:
        if args.only is not None and name not in args.only:
            continue
        print(f"[scale_proof] {name} {kw} "
              "(compile may take hours on a relay) ...", flush=True)
        t0 = time.time()
        try:
            result[name] = search_supernet_step(**kw)
            result[name]["phase_wall_s"] = round(time.time() - t0, 1)
        except Exception as e:
            # keep head AND tail: relay compile errors bury the actual
            # compiler diagnostic after kilobytes of proxy log preamble
            msg = f"{type(e).__name__}: {e}"
            if len(msg) > 4000:
                msg = msg[:2000] + " ...[elided]... " + msg[-2000:]
            result[name] = {"error": msg}
        flush()


if __name__ == "__main__":
    main()
