"""Pipeline-parallel early-exit inference across devices.

The reference names its two genotype halves "device" and "cloud"
(Decoding/decode_autodeeplab.py:106-107) — the early-exit backbone is
conceptually an edge/cloud split — but no pipeline runtime exists there
(SURVEY.md §2.2). This is that runtime, TPU-native: the engine's exit-segment
programs (train/dynamic.py: decide_k / head_k / final) are assigned
contiguously to pipeline stages, each stage's device holds ONLY the weights
its segments read (real memory partitioning, filtered by top-level module
key), and the inter-stage state handoff is one explicit `jax.device_put` —
the "upload to the cloud" boundary.

Early exit composes with the pipeline: an image confident at stage s never
reaches stages > s, so the deep stages' devices stay free. Because JAX
dispatch is asynchronous per device, a caller that does not immediately
block on the returned logits gets stage overlap across a stream of images
for free: image i+1's stage-0 decision runs on device 0 while image i's
final segment is still executing on device 1.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _filter_variables(variables, keys):
    """Per-collection top-level module filter ({'params': {...}, ...})."""
    return {
        col: {k: v for k, v in tree.items() if k in keys}
        for col, tree in variables.items()
    }


class PipelinedDynamicInference:
    """Early-exit dynamic inference split across ``devices`` as a pipeline.

    Wraps a DynamicInferenceEngine's segment programs; stage s runs its
    segments with a device-resident filtered weight subtree. Returns the
    same (logits, exit_index, confidence) surface as ``engine.infer``.
    """

    def __init__(
        self,
        model,
        variables,
        size: Tuple[int, int],
        devices: Optional[Sequence[jax.Device]] = None,
        confidence: str = "entropy",
        threshold: float = 0.0,
        edm=None,
        edm_variables=None,
        num_classes: int = 19,
    ):
        from ..train.dynamic import DynamicInferenceEngine  # avoid cycle

        self.engine = DynamicInferenceEngine(
            model, variables, edm, edm_variables, num_classes
        )
        self.size = tuple(size)
        self.confidence = confidence
        self.threshold = float(threshold)

        devices = list(devices if devices is not None else jax.devices())
        exits = self.engine.exits
        programs = [("decide", k) for k in range(len(exits) - 1)]
        programs.append(("final", len(exits) - 1))
        n_stages = min(len(devices), len(programs))
        # contiguous split; earlier stages get the extra program when ragged
        per, extra = divmod(len(programs), n_stages)
        self.stages = []
        pos = 0
        for s in range(n_stages):
            take = per + (1 if s < extra else 0)
            progs = programs[pos : pos + take]
            pos += take
            keys = set()
            for prog in progs:
                keys |= self._program_keys(prog)
            svars = jax.device_put(
                _filter_variables(variables, keys), devices[s]
            )
            sedm = (
                jax.device_put(edm_variables, devices[s])
                if edm_variables is not None and confidence == "edm"
                else None
            )
            self.stages.append(
                {
                    "device": devices[s],
                    "programs": progs,
                    "variables": svars,
                    "edm_variables": sedm,
                }
            )

    # ------------------------------------------------------------- weights
    def _head_keys(self, e: int) -> set:
        keys = {"aspp", "decoder"}
        if f"conv_aspp_{e}" in self.engine.variables["params"]:
            keys.add(f"conv_aspp_{e}")
        return keys

    def _program_keys(self, prog) -> set:
        kind, k = prog
        exits = self.engine.exits
        model = self.engine.model
        e = exits[k]
        start = 0 if k == 0 else exits[k - 1] + 1
        keys = {f"cell_{i}" for i in range(start, e + 1)}
        if start == 0:
            keys.add("stems")
        if start <= model.low_level_layer <= e:
            keys.add("low_level_conv")
        # every exit-hosting segment may decode its head (entropy/max decide
        # programs fuse it; the edm path launches head_k on the same stage)
        keys |= self._head_keys(e)
        return keys

    # ------------------------------------------------------------- running
    def warmup(self):
        """Compile + execute every stage program once on a zeros input so
        per-image timings never fold in lazy compilation: without this, deep
        stages JIT only when the first non-exiting image reaches them and the
        compile lands inside that image's measured latency."""
        x = jnp.zeros((1, *self.size, 3), jnp.float32)
        carry = jax.device_put(x, self.stages[0]["device"])
        for s, stage in enumerate(self.stages):
            if s > 0:
                carry = jax.device_put(carry, stage["device"])
            for kind, k in stage["programs"]:
                if kind == "decide":
                    out = self.engine._decide(
                        k, self.size, self.confidence, self.threshold
                    ).raw(stage["variables"], stage["edm_variables"], carry)
                    carry = out[0]
                    if len(out) <= 2:
                        # edm path: the exit branch decodes the head as a
                        # separate program on the same stage — compile it too
                        jax.block_until_ready(
                            self.engine._head(
                                self.engine.exits[k], self.size
                            ).raw(stage["variables"], None, carry)
                        )
                else:
                    jax.block_until_ready(
                        self.engine._final(self.size).raw(
                            stage["variables"], None, carry
                        )
                    )
        jax.block_until_ready(carry)

    def infer(self, x):
        """Batch-1 early-exit inference through the pipeline.

        Returns (logits (N, C, H, W), exit_index, confidence_value); logits
        stay on the exiting stage's device (don't block to keep the stream
        overlapped). Confidence readback is the only sync per decision.
        """
        from ..train.dynamic import DynamicInferenceEngine

        x = jnp.asarray(x)
        assert tuple(x.shape[1:3]) == self.size, (x.shape, self.size)
        carry = jax.device_put(x, self.stages[0]["device"])
        conf_value = float("nan")
        for s, stage in enumerate(self.stages):
            if s > 0:
                carry = jax.device_put(carry, stage["device"])  # handoff
            for kind, k in stage["programs"]:
                if kind == "decide":
                    out = self.engine._decide(
                        k, self.size, self.confidence, self.threshold
                    ).raw(stage["variables"], stage["edm_variables"], carry)
                    carry, conf = out[0], out[1]
                    conf_value = float(conf[0])
                    if DynamicInferenceEngine._exits_now(
                        conf_value, self.confidence, self.threshold
                    ):
                        logits = (
                            out[2]
                            if len(out) > 2
                            else self.engine._head(
                                self.engine.exits[k], self.size
                            ).raw(stage["variables"], None, carry)
                        )
                        return logits, k, conf_value
                else:
                    logits = self.engine._final(self.size).raw(
                        stage["variables"], None, carry
                    )
                    return logits, k, conf_value
        raise AssertionError("pipeline ended without a final program")
