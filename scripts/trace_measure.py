"""Device-time measurement via the jax.profiler trace — the only reliable
instrument on the axon relay (host wall clocks see async dispatch, a noisy
~50-500 ms fetch RTT, and duplicate-dispatch elision; the device timeline
sees none of that).

Usage: trace_and_sum(fn, *args) -> dict with total device ms per run and a
breakdown by tf_op segment. Absolute scale may carry a constant profiler
factor; ratios between measurements are what matter.
"""
import collections
import glob
import gzip
import json
import os
import shutil
import tempfile

import jax
import numpy as np


def trace_and_sum(fn, *args, runs: int = 3, segments=(1,), top_n: int = 25):
    """Run fn(*args) `runs` times under a profiler trace; return device-time
    totals. `segments`: tf_op path component indices to group by."""
    out = fn(*args)                       # warm (compile outside the trace)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])   # real sync (D2H)
    logdir = tempfile.mkdtemp(prefix="xprof_")
    try:
        jax.profiler.start_trace(logdir)
        for _ in range(runs):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        jax.profiler.stop_trace()
        path = sorted(glob.glob(os.path.join(
            logdir, "plugins/profile/*/*.trace.json.gz")))[-1]
        with gzip.open(path) as f:
            data = json.load(f)
    finally:
        shutil.rmtree(logdir, ignore_errors=True)

    pids = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    total = 0.0
    seg = collections.Counter()
    ops = collections.Counter()
    for e in data["traceEvents"]:
        # Count only real HLO op events: these carry an `hlo_category` in
        # args. Executable ENVELOPES do not — they duplicate the whole
        # program's duration on the same track, and not all are named
        # `jit_*` (a donated-arg train step emits a bare "0" envelope,
        # which the old name-based filter counted: every train-step total
        # measured before this fix was DOUBLE the real device time).
        # `conditional` stays excluded: the branch envelope would double-
        # count the executed branch's interior ops.
        args_ = e.get("args") or {}
        if (
            e.get("ph") == "X"
            and "dur" in e
            and pids.get(e.get("pid"), "").startswith("/device")
            and "hlo_category" in args_
            and args_["hlo_category"] != "conditional"
        ):
            d = e["dur"]
            total += d
            tf = (e.get("args") or {}).get("tf_op", "")
            parts = tf.split("/")
            key = "/".join(parts[i] for i in segments if i < len(parts))
            seg[key or "(none)"] += d
            ops[(key, e["name"])] += d
    return {
        "total_ms": total / runs / 1000.0,
        "segments": {k: v / runs / 1000.0 for k, v in seg.most_common()},
        "top_ops": [
            (k[0], k[1], v / runs / 1000.0) for k, v in ops.most_common(top_n)
        ],
        # per-HLO-op device ms (instruction name -> ms/run), for roofline
        "op_ms": dict(_sum_by_name(ops, runs)),
    }


def _sum_by_name(ops, runs):
    by_name = collections.Counter()
    for (_, name), v in ops.items():
        by_name[name] += v
    return {n: v / runs / 1000.0 for n, v in by_name.items()}


def pretty(result, top: int = 0):
    print(f"device total: {result['total_ms']:8.2f} ms/run")
    for k, v in result["segments"].items():
        print(f"  {v:8.2f} ms  {k}")
    for seg_, name, v in result["top_ops"][: top or 0]:
        print(f"    {v:8.2f} ms  {name:<30s} {seg_[:60]}")
