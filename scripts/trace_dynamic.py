"""Capture a jax.profiler trace of the early-exit program and print the
top HLO ops by self time (parsed from the xplane with
tensorboard_plugin_profile).
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

TRACE_DIR = "/tmp/add_trace"


def main():
    from auto_dynamic_deeplab_tpu.models import ADD
    from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE, NETWORK_ARCH
    from auto_dynamic_deeplab_tpu.train.dynamic import DynamicInferenceEngine

    cfg = NETWORK_ARCH[2]
    model = ADD(
        cfg["path"], cfg["C_index"], AUTODEEPLAB_GENOTYPE, 19,
        F=20, B=5, low_level_layer=cfg["low_level_layer"], dtype=jnp.bfloat16,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 65, 65, 3), jnp.float32), train=False
    )
    x = jnp.asarray(np.random.RandomState(0).randn(1, 1025, 2049, 3).astype(np.float32))

    engine = DynamicInferenceEngine(model, variables)
    program = engine.fused_program((1025, 2049), confidence="entropy")

    def early(x):
        return program(x, jnp.float32(2.0))[0]

    jax.block_until_ready(early(x))  # compile outside trace

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(5):
            out = early(x)
        jax.block_until_ready(out)

    xplanes = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes)
    if not xplanes:
        return

    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    # framework op stats: per-op totals
    for tool in ("framework_op_stats", "op_profile"):
        try:
            data, _ = rtd.xspace_to_tool_data(xplanes, tool, {})
            out_path = f"/tmp/add_trace_{tool}.out"
            with open(out_path, "wb") as f:
                f.write(data if isinstance(data, bytes) else data.encode())
            print(f"wrote {out_path} ({tool})")
        except Exception as e:
            print(tool, "failed:", type(e).__name__, e)


if __name__ == "__main__":
    main()
