"""Micro-probe: which accumulation style keeps Mosaic's scoped-VMEM stack
bounded for a 25-tap depthwise FMA chain at (CS, M) f32?

Styles:
  ssa        acc = acc + seg.astype(f32) * w   (current kernels)
  ref        acc_ref[:] = acc_ref[:] + ...     (VMEM scratch accumulator)
  ref_sub    ref accumulator + lane sub-tiles of TS
  ssa_sub    SSA accumulator per lane sub-tile of TS

Chipless AOT compile via the axon relay; prints OK / VMEM_OOM <size>.
"""
import functools
import os
import re
import sys

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/add_tpu_jax_cache"),
)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CS, M, NT = 160, 1536, 25  # the worst observed case (C=160 sep5 windows)


def kernel(style, ts, x_ref, w_ref, o_ref, acc_ref):
    src = x_ref[:]
    if style == "ssa":
        acc = jnp.zeros((CS, M), jnp.float32)
        for t in range(NT):
            acc = acc + src[:, t : t + M].astype(jnp.float32) * w_ref[:, t : t + 1]
        o_ref[:] = acc.astype(o_ref.dtype)
    elif style == "ref":
        acc_ref[:] = jnp.zeros((CS, M), jnp.float32)
        for t in range(NT):
            acc_ref[:] = acc_ref[:] + (
                src[:, t : t + M].astype(jnp.float32) * w_ref[:, t : t + 1]
            )
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)
    elif style == "ref_sub":
        for j in range(M // ts):
            a = jnp.zeros((CS, ts), jnp.float32)
            for t in range(NT):
                a = a + (
                    src[:, t + j * ts : t + j * ts + ts].astype(jnp.float32)
                    * w_ref[:, t : t + 1]
                )
            acc_ref[:, j * ts : (j + 1) * ts] = a
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)
    elif style == "ssa_sub":
        outs = []
        for j in range(M // ts):
            a = jnp.zeros((CS, ts), jnp.float32)
            for t in range(NT):
                a = a + (
                    src[:, t + j * ts : t + j * ts + ts].astype(jnp.float32)
                    * w_ref[:, t : t + 1]
                )
            outs.append(a)
        o_ref[:] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def run(style, ts):
    x = jnp.zeros((CS, M + NT), jnp.bfloat16)
    w = jnp.zeros((CS, NT), jnp.float32)
    f = pl.pallas_call(
        functools.partial(kernel, style, ts),
        out_shape=jax.ShapeDtypeStruct((CS, M), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((CS, M), jnp.float32)],
        interpret=False,
    )
    try:
        jax.jit(lambda x, w: f(x, w)).lower(x, w).compile()
        return "OK"
    except Exception as e:  # noqa: BLE001
        m = re.search(r"size ([\d.]+)M", str(e))
        return f"VMEM_OOM {m.group(1)}M" if m else "FAIL " + str(e).splitlines()[0][:100]


for style, ts in [
    ("ssa", 0),
    ("ref", 0),
    ("ref_sub", 512),
    ("ref_sub", 256),
    ("ssa_sub", 512),
    ("ssa_sub", 256),
]:
    print(f"{style:8s} ts={ts:4d}: {run(style, ts)}", flush=True)
