"""Chipless compile probes for the flat-cell kernels' scoped-VMEM fit.

The axon relay compiles via a chipless TpuAotCompiler, so `.lower().compile()`
checks Mosaic's scoped-VMEM allocation (16 MB limit) WITHOUT touching the
chip. Sweeps the flagship cell shapes x chunk sizes to find what fits;
drives the block_stage / sep_fused / dense_stage self-budget constants.

Usage: python scripts/probe_cell_kernel_vmem.py [--quick]
"""
import argparse
import os
import sys

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/add_tpu_jax_cache"),
)

import jax.numpy as jnp
import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))

from auto_dynamic_deeplab_tpu.kernels import cell_ops as K
from auto_dynamic_deeplab_tpu.models.cell import edge_op_assignment, as_genotype_rows
from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE, PRIMITIVES
from auto_dynamic_deeplab_tpu.ops.primitives import OPS


def probe(fn, *args):
    try:
        jax.jit(fn).lower(*args).compile()
        return "OK"
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        if "Scoped allocation" in msg:
            import re

            m = re.search(r"size ([\d.]+)M", msg)
            return f"VMEM_OOM {m.group(1)}M" if m else "VMEM_OOM"
        return "FAIL " + msg.splitlines()[0][:120]


def block_probe(C, H, W, chunk, names, dtype):
    """Compile one block_stage kernel with the given edge primitives."""
    spec = K.FlatSpec(H=H, W=W, chunk=chunk)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32)).astype(dtype)

    edges = []
    for i, name in enumerate(names):
        op = OPS[name](C, 1)
        v = op.init(jax.random.PRNGKey(i), x.astype(jnp.float32), False)
        edges.append((K.to_flat(x, spec), name, v))

    def fn(*srcs):
        es = [(s, n, v) for s, (_, n, v) in zip(srcs, edges)]
        out = K.block_stage(es, spec, interpret=False)
        if out is None:
            raise RuntimeError("budget-refused")
        return out

    try:
        return probe(fn, *[e[0] for e in edges])
    except RuntimeError as e:
        return str(e)


def full_cell_probe(C, H, W, dtype):
    """Compile the WHOLE run_dag_flat cell (real genotype, real fallback
    selection) at the given shape."""
    geno = as_genotype_rows(AUTODEEPLAB_GENOTYPE)
    assignment = edge_op_assignment(geno)
    spec = K.FlatSpec(H=H, W=W, chunk=K.pick_chunk(C))
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32)).astype(dtype)
    x1 = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32)).astype(dtype)
    op_vars = []
    for i, (_, opi) in enumerate(assignment):
        op = OPS[PRIMITIVES[opi]](C, 1)
        op_vars.append(
            op.init(jax.random.PRNGKey(i), x0.astype(jnp.float32), False)
        )

    def fn(s0, s1):
        blocks = K.run_dag_flat(
            K.to_flat(s0, spec), K.to_flat(s1, spec), assignment, 5,
            op_vars, PRIMITIVES, spec, interpret=False,
        )
        return K.concat_from_flat(blocks, C, spec)

    return probe(fn, x0, x1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--full-cell", action="store_true")
    args = ap.parse_args()

    if args.full_cell:
        for C, H, W in [(40, 129, 257), (80, 65, 129), (160, 33, 65),
                        (32, 5, 9), (40, 257, 513)]:
            for dtype in (jnp.bfloat16, jnp.float32):
                r = full_cell_probe(C, H, W, dtype)
                print(f"cell C={C:4d} {H}x{W} {dtype.__name__}: {r}", flush=True)
        return

    geno = as_genotype_rows(AUTODEEPLAB_GENOTYPE)
    assignment = edge_op_assignment(geno)
    # the real per-block edge primitive pairs of the shipped genotype
    blocks, states_n, offset = [], 2, 0
    sel = dict(assignment)
    for _ in range(5):
        names = [
            PRIMITIVES[sel[offset + j]]
            for j in range(states_n)
            if (offset + j) in sel
        ]
        blocks.append(tuple(n for n in names if n != "none"))
        offset += states_n
        states_n += 1
    print("genotype blocks:", blocks)

    # flagship cell shapes at 1025x2049 eval (C = F*fm, F=20)
    shapes = [
        (40, 129, 257),   # level 1
        (80, 65, 129),    # level 2
        (160, 33, 65),    # level 3
    ]
    if not args.quick:
        shapes.append((32, 5, 9))  # the tiny-crop level-3 case from the CLI

    worst = set(tuple(sorted(b)) for b in blocks)
    for C, H, W in shapes:
        for chunk in (4096, 2048, 1024, 512):
            if chunk > K.pick_chunk(C):
                continue
            for names in sorted(worst):
                for dtype in (jnp.bfloat16,):
                    r = block_probe(C, H, W, chunk, list(names), dtype)
                    print(
                        f"C={C:4d} {H}x{W} chunk={chunk:5d} {names}: {r}",
                        flush=True,
                    )


if __name__ == "__main__":
    main()
