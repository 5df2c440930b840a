"""Roofline analysis of the early-exit segment program (VERDICT r4 ask #6).

Question to close: the all-exits forward runs at ~14% of v5e bf16 peak — is
that "money on the table", or the physics of small-channel/memory-bound
shapes? For every HLO instruction that shows up in the device trace of the
decide_0 (early-exit) program, this script joins:

  * measured device time (jax.profiler trace, per-instruction), with
  * static minimum HBM traffic (sum of operand + output buffer sizes parsed
    from the optimized HLO text — a LOWER bound on bytes moved: it assumes
    perfect reuse inside the op and no spills), and
  * for convolutions, exact FLOPs from the HLO window/dim attributes,

and reports per-op and whole-program floors:

  mem_floor  = bytes / 819 GB/s      (v5e HBM bandwidth)
  mxu_floor  = flops / 197 TF/s      (v5e bf16 peak)
  floor      = max(mem_floor, mxu_floor) per op; program floor = sum.

If measured/floor is close to 1, the program is at the speed of light for
its shapes and the kernel tax stops here; a large gap names exactly which
fusions leave headroom. Prints one JSON block and a human table on stderr.

Usage: python scripts/roofline.py [--hw 1025 2049] [--full] [--out FILE]
"""
import argparse
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "scripts"))

HBM_GBS = 819e9  # v5e HBM bandwidth
PEAK_BF16 = 197e12  # v5e bf16 MXU peak

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _type_bytes(type_str: str) -> int:
    """Bytes of an HLO type string; tuples sum their elements."""
    total = 0
    for m in _SHAPE_RE.finditer(type_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


# HLO opcodes that can carry the op's FLOPs/bytes at top level on TPU
_OPCODES = {
    "fusion", "convolution", "custom-call", "reduce", "copy", "copy-start",
    "copy-done", "transpose", "bitcast", "broadcast", "concatenate", "slice",
    "dynamic-slice", "dynamic-update-slice", "dot", "add", "subtract",
    "multiply", "divide", "maximum", "minimum", "exponential", "log", "tanh",
    "compare", "select", "convert", "reshape", "pad", "reverse", "scatter",
    "gather", "tuple", "get-tuple-element", "all-reduce", "all-gather",
    "reduce-scatter", "collective-permute", "rng", "iota", "parameter",
    "sqrt", "rsqrt", "power", "negate", "abs", "floor", "clamp", "and", "or",
    "not", "xor", "reduce-window", "select-and-scatter", "map", "sort",
    "while", "conditional", "call", "bitcast-convert", "log-plus-one",
    "exponential-minus-one", "sign", "cosine", "sine", "atan2", "remainder",
}
_NAME_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*)$")
_OPC_RE = re.compile(r"([a-z][a-z0-9\-]*)\(")
_OPERAND_RE = re.compile(r"%([\w.\-]+)")
_CALLS_RE = re.compile(r"calls=%?([\w.\-]+)")


def parse_hlo(hlo_text: str):
    """name -> dict(out_bytes, opcode, operand names, raw line). Also maps
    fused-computation names (``calls=%foo``) to their calling instruction —
    profiler trace events are named after the fused computation, not the
    top-level fusion instruction."""
    defs = {}
    aliases = {}
    comp_conv_flops = {}  # computation name -> conv FLOPs inside its body
    current_comp = None
    comp_re = re.compile(r"^\s*%?([\w.\-]+)\s*(?:\([^=]*\))?\s*->.*{\s*$")
    for line in hlo_text.splitlines():
        if line.startswith("}"):
            current_comp = None  # body closed (ENTRY bodies never attach)
        cm0 = comp_re.match(line)
        if cm0 and "=" not in line and not line.lstrip().startswith("ENTRY"):
            current_comp = cm0.group(1)
            comp_conv_flops.setdefault(current_comp, 0.0)
        if current_comp and " convolution(" in line:
            comp_conv_flops[current_comp] += conv_flops(line)
        m = _NAME_RE.match(line)
        if not m or "=" not in line:
            continue
        name, rhs = m.groups()
        opcode, opc_pos = None, None
        for om in _OPC_RE.finditer(rhs):
            if om.group(1) in _OPCODES:
                opcode, opc_pos = om.group(1), om.start()
                break
        if opcode is None:
            continue
        type_str = rhs[:opc_pos]
        rest = rhs[opc_pos:]
        args_part = rest.split("), ")[0] if "), " in rest else rest
        operands = _OPERAND_RE.findall(args_part)
        defs[name] = {
            "out_bytes": _type_bytes(type_str),
            "opcode": opcode,
            "operands": operands,
            "line": line.strip(),
        }
        cm = _CALLS_RE.search(rest)
        if cm:
            aliases[cm.group(1)] = name
            defs[name]["calls"] = cm.group(1)
    # conv FLOPs of fused computations attach to their calling instruction
    for d in defs.values():
        if d.get("calls") in comp_conv_flops:
            d["conv_flops"] = comp_conv_flops[d["calls"]]
    # resolve aliases into first-class entries (trace name -> instruction)
    for alias, target in aliases.items():
        if alias not in defs and target in defs:
            defs[alias] = defs[target]
    return defs


def conv_flops(line: str) -> float:
    """FLOPs of a convolution HLO from its text: 2 * out_elements *
    (in_features/groups) * prod(window)."""
    out_m = _SHAPE_RE.search(line.split("=")[1])
    if not out_m:
        return 0.0
    out_dims = [int(d) for d in out_m.group(2).split(",") if d]
    win = re.search(r"window={size=([\dx]+)", line)
    window = (
        [int(x) for x in win.group(1).split("x")] if win else [1]
    )
    dl = re.search(r"dim_labels=(\w+)_(\w+)->(\w+)", line)
    groups_m = re.search(r"feature_group_count=(\d+)", line)
    groups = int(groups_m.group(1)) if groups_m else 1
    # input features: from the rhs (kernel) shape's 'i' dim
    flops_window = 1
    for w in window:
        flops_window *= w
    # find kernel operand type: second shape on the operand side
    operand_shapes = _SHAPE_RE.findall(line.split("convolution(")[-1])
    in_feat = 1
    if dl and len(operand_shapes) >= 2:
        kshape = [int(d) for d in operand_shapes[1][1].split(",") if d]
        klabels = dl.group(2)  # e.g. 01io
        if "i" in klabels and len(kshape) == len(klabels):
            in_feat = kshape[klabels.index("i")]
    out_elems = 1
    for d in out_dims:
        out_elems *= d
    # in_feat is the kernel's per-group input-feature dim, so groups are
    # already accounted for (depthwise: i=1)
    return 2.0 * out_elems * in_feat * flops_window


def analyze(compiled, op_ms: dict, label: str):
    hlo = compiled.as_text()
    defs = parse_hlo(hlo)
    rows = []
    t_total = sum(op_ms.values())
    for name, ms in sorted(op_ms.items(), key=lambda kv: -kv[1]):
        d = defs.get(name)
        if d is None:
            rows.append({"op": name, "ms": round(ms, 3), "note": "not in HLO"})
            continue
        in_bytes = sum(
            defs[o]["out_bytes"] for o in d["operands"] if o in defs
        )
        # slice-like ops read ≈ what they write; charging the whole operand
        # buffer made the floor sum exceed the measurement (not a bound)
        slicey = d["opcode"] in ("slice", "dynamic-slice", "gather") or \
            "slice" in d.get("calls", "")
        if slicey:
            in_bytes = min(in_bytes, d["out_bytes"])
        bytes_total = d["out_bytes"] + in_bytes
        mem_floor = bytes_total / HBM_GBS * 1e3
        if d["opcode"] == "convolution":
            flops = conv_flops(d["line"])
        else:
            flops = float(d.get("conv_flops", 0.0))
        mxu_floor = flops / PEAK_BF16 * 1e3
        floor = max(mem_floor, mxu_floor)
        rows.append({
            "op": name,
            "opcode": d["opcode"],
            "ms": round(ms, 3),
            "gb_touched_min": round(bytes_total / 2**30, 4),
            "mem_floor_ms": round(mem_floor, 3),
            "gflops": round(flops / 1e9, 2),
            "mxu_floor_ms": round(mxu_floor, 3),
            "floor_ms": round(floor, 3),
            "x_over_floor": round(ms / floor, 2) if floor > 1e-6 else None,
            "bound": (
                "mxu" if mxu_floor > mem_floor else "hbm"
            ) if floor > 1e-6 else "?",
        })
    floor_sum = sum(r.get("floor_ms", 0.0) or 0.0 for r in rows)
    # Op-granularity speed-of-light: ops already at/below their (sometimes
    # overestimated — internal slicing) byte floor contribute their measured
    # time; ops above it contribute the floor. This is the best wall
    # achievable WITHOUT cross-op fusion (i.e. without whole-cell kernels
    # that keep intermediates in VMEM).
    attainable = sum(
        min(r["ms"], r["floor_ms"]) if r.get("floor_ms") else r["ms"]
        for r in rows
    )
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        prog_flops = float((ca or {}).get("flops", 0.0))
    except Exception:
        prog_flops = 0.0
    summary = {
        "label": label,
        "measured_device_ms": round(t_total, 3),
        "sum_of_per_op_floors_ms": round(floor_sum, 3),
        "x_over_floor": round(t_total / floor_sum, 2) if floor_sum else None,
        "attainable_floor_op_granularity_ms": round(attainable, 3),
        "headroom_x_at_op_granularity": round(t_total / attainable, 2)
        if attainable else None,
        "program_gflops_cost_analysis": round(prog_flops / 1e9, 2),
        "program_mxu_floor_ms": round(prog_flops / PEAK_BF16 * 1e3, 3),
        "hbm_bound_share": round(
            sum(r["ms"] for r in rows if r.get("bound") == "hbm") /
            max(t_total, 1e-9), 3,
        ),
    }
    return rows, summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=[1025, 2049])
    ap.add_argument("--F", type=int, default=20)
    ap.add_argument("--runs", type=int, default=8)
    ap.add_argument("--full", action="store_true",
                    help="also analyze the final (full-depth) segment")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/add_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from auto_dynamic_deeplab_tpu.models import ADD
    from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE, NETWORK_ARCH
    from auto_dynamic_deeplab_tpu.train.dynamic import DynamicInferenceEngine
    from auto_dynamic_deeplab_tpu.utils.initialize import jit_init
    from trace_measure import trace_and_sum

    cfg = NETWORK_ARCH[2]
    model = ADD(
        cfg["path"], cfg["C_index"], AUTODEEPLAB_GENOTYPE, 19,
        F=args.F, B=5, low_level_layer=cfg["low_level_layer"],
        dtype=jnp.bfloat16,
    )
    variables = jit_init(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 65, 65, 3), jnp.float32),
    )
    size = tuple(args.hw)
    engine = DynamicInferenceEngine(model, variables)
    x = jnp.asarray(
        np.random.RandomState(0).randn(1, *size, 3).astype(np.float32)
    )

    d0 = engine._decide(0, size, "entropy", 0.0)
    compiled_d0 = d0.raw.lower(variables, None, x).compile()

    def early(x):
        return compiled_d0(variables, None, x)

    r = trace_and_sum(early, x, runs=args.runs)
    rows, summary = analyze(compiled_d0, r["op_ms"], "decide_0 (early exit)")
    out = {"early": {"summary": summary, "ops": rows[:40]}}

    if args.full:
        carry = jax.eval_shape(d0.raw, variables, None, x)[0]
        fin = engine._final(size)
        compiled_fin = fin.raw.lower(variables, None, carry).compile()
        carry_val = early(x)[0]

        def final(c):
            return compiled_fin(variables, None, c)

        rf = trace_and_sum(final, carry_val, runs=args.runs)
        rows_f, summary_f = analyze(
            compiled_fin, rf["op_ms"], "final (deep segment)"
        )
        out["final"] = {"summary": summary_f, "ops": rows_f[:40]}

    for k, v in out.items():
        s = v["summary"]
        sys.stderr.write(
            f"\n== {s['label']}: measured {s['measured_device_ms']} ms, "
            f"floor {s['sum_of_per_op_floors_ms']} ms "
            f"({s['x_over_floor']}x over), hbm-bound share "
            f"{s['hbm_bound_share']}\n"
        )
        for row in v["ops"][:15]:
            sys.stderr.write(
                f"  {row['ms']:8.3f} ms  {row.get('floor_ms', 0):7.3f} floor"
                f"  {row.get('bound', '?'):4s}  {row.get('opcode', '?'):14s}"
                f" {row['op'][:48]}\n"
            )
    print(json.dumps(out), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
