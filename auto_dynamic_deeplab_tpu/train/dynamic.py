"""Early-exit dynamic inference engine.

TPU-native re-expression of ADD.dynamic_inference (modeling/ADD.py:379-488),
which is data-dependent Python control flow over CUDA kernels. The backbone
is cut at every exit into *decision programs*, each a single fused XLA
program, so one exit decision costs exactly one launch + one scalar readback:

    decide_0 = stem + cells[0..e0] + confidence_0      -> (state, conf)
    decide_k =        cells[e_{k-1}+1..e_k] + conf_k   -> (state, conf)
    final    =        cells[e_{K-1}+1..end] + head     -> logits
    head_k   = exit head at e_k (launched only when exiting there)

Stopping early means later programs never launch — early exit genuinely
skips FLOPs (the BASELINE.md requirement), not masked-out math. For the
entropy/max confidences the decision program also emits the exit logits
(the reference decodes the head before judging, ADD.py:465-476); for EDM the
head is skipped while continuing (ADD.py:421-423).

Two modes:
  * per-image (batch 1) with wall-clock timing — benchmark parity with the
    reference's synchronize+perf_counter loop;
  * bucketed batch mode: evaluate confidences for the whole batch at exit k,
    then re-launch only the continuing images (compacted to padded buckets).
"""
from __future__ import annotations

import time
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.confidence import confidence_max, normalized_shannon_entropy


class DynamicInferenceEngine:
    def __init__(
        self,
        model,
        variables,
        edm=None,
        edm_variables=None,
        num_classes: int = 19,
        use_pallas_stems: str = "auto",
    ):
        self.model = model
        self.variables = variables
        self.edm = edm
        self.edm_variables = edm_variables
        self.num_classes = num_classes
        self.exits: Tuple[int, ...] = model.exit_layers
        self._programs = {}
        # Fused Pallas stems (kernels/stems.py): ~2.4 ms vs ~4.8 ms for the
        # XLA stems at 1025x2049 on v5e. TPU + bf16 eval path only.
        if use_pallas_stems == "auto":
            # The Mosaic kernel uses TPU-only primitives (pltpu bitcast
            # sublane packing, DMA): never auto-enable on GPU/CPU backends.
            # 'axon' is the remote-relay TPU plugin — same Mosaic target.
            self._pallas_stems = (
                getattr(model, "dtype", None) == jnp.bfloat16
                and jax.default_backend() in ("tpu", "axon")
            )
        else:
            self._pallas_stems = bool(use_pallas_stems)

    def _stem_state(self, variables, x):
        """Backbone stem state; routes to the fused Pallas kernel on TPU."""
        # fused_stems is a batch-1 program (it reads x[0]); batched inference
        # unrolls it per image (static batch under jit): ~2x the XLA stems
        # at bs4 full-res (4 x 1.9 ms vs 15.4 ms, bucketed-infer trace).
        if self._pallas_stems:
            from ..kernels.stems import fold_stem_bns, fused_stems

            args = fold_stem_bns(
                variables["params"]["stems"], variables["batch_stats"]["stems"]
            )
            if x.shape[0] == 1:
                s0, s1 = fused_stems(x, *args)
            else:
                parts = [
                    fused_stems(x[i : i + 1], *args) for i in range(x.shape[0])
                ]
                s0 = jnp.concatenate([p[0] for p in parts], axis=0)
                s1 = jnp.concatenate([p[1] for p in parts], axis=0)
            return {
                "prev_prev": s0,
                "prev": s1,
                "x": None,
                "dense": (),
                "low_level": None,
            }
        return self.model.apply(variables, x, False, method="stem_state")

    # ------------------------------------------------------------ programs
    #
    # Every jitted program takes ``(variables, edm_variables)`` as explicit
    # arguments rather than closing over them: closed-over weight pytrees
    # become HLO constants, and constants are re-uploaded on every execution
    # by remote-relay runtimes (~46 MB/launch for the flagship ADD — measured
    # 41.6 ms/launch as constants vs 2.35 ms as arguments on v5e).

    def _confidence(
        self, variables, edm_variables, state, exit_layer, size, confidence, threshold
    ):
        """Confidence (and logits, for head-based signals) inside a program."""
        if confidence == "edm":
            feature = self.model.apply(
                variables, state, exit_layer, method="exit_feature"
            )
            return self.edm.apply(edm_variables, feature)[:, 0], None
        logits = self.model.apply(
            variables, state, exit_layer, size, False, True,
            method="exit_logits",
        )  # (N, C, H, W) — reference torch layout, lane-efficient
        if confidence == "entropy":
            return (
                normalized_shannon_entropy(logits, self.num_classes, class_axis=1),
                logits,
            )
        return confidence_max(logits, threshold, class_axis=1), logits

    def _bind(self, fn) -> Callable:
        """Partially apply the weight pytrees at call time (NOT trace time)."""
        def call(*args):
            return fn(self.variables, self.edm_variables, *args)

        call.raw = fn  # the unbound jit fn, for introspection/tests
        return call

    def _decide(self, k: int, size, confidence: str, threshold: float) -> Callable:
        """Fused program for exit station k (not the last): run the cells up
        to e_k (plus stem when k == 0) and the confidence — one launch."""
        key = ("decide", k, size, confidence, threshold)
        if key not in self._programs:
            e = self.exits[k]
            start = 0 if k == 0 else self.exits[k - 1] + 1

            @jax.jit
            def decide(variables, edm_variables, x_or_state):
                state = x_or_state
                if k == 0:
                    state = self._stem_state(variables, state)
                state = self.model.apply(
                    variables, state, start, e, False, method="run_cells"
                )
                conf, logits = self._confidence(
                    variables, edm_variables, state, e, size, confidence, threshold
                )
                if logits is None:
                    return state, conf
                return state, conf, logits

            self._programs[key] = self._bind(decide)
        return self._programs[key]

    def _final(self, size) -> Callable:
        """Last segment fused with the final shared head — one launch."""
        key = ("final", size)
        if key not in self._programs:
            e = self.exits[-1]
            start = self.exits[-2] + 1 if len(self.exits) > 1 else 0

            @jax.jit
            def final(variables, edm_variables, state):
                del edm_variables
                if len(self.exits) == 1:
                    state = self._stem_state(variables, state)
                state = self.model.apply(
                    variables, state, start, e, False, method="run_cells"
                )
                return self.model.apply(
                    variables, state, e, size, False, True,
                    method="exit_logits",
                )

            self._programs[key] = self._bind(final)
        return self._programs[key]

    def _head(self, exit_layer: int, size) -> Callable:
        key = ("head", exit_layer, size)
        if key not in self._programs:

            @jax.jit
            def head(variables, edm_variables, state):
                del edm_variables
                return self.model.apply(
                    variables, state, exit_layer, size, False, True,
                    method="exit_logits",
                )

            self._programs[key] = self._bind(head)
        return self._programs[key]

    def warmup(self, input_shape, confidence: str = "edm", threshold: float = 0.0):
        """Compile every program for a given input shape."""
        x = jnp.zeros(input_shape, jnp.float32)
        size = tuple(input_shape[1:3])
        carry = x
        for k in range(len(self.exits) - 1):
            out = self._decide(k, size, confidence, threshold)(carry)
            carry = out[0]
            jax.block_until_ready(out[1])
            if confidence == "edm":
                jax.block_until_ready(self._head(self.exits[k], size)(carry))
        jax.block_until_ready(self._final(size)(carry))

    @staticmethod
    def _exits_now(conf, confidence: str, threshold: float):
        if confidence == "edm":
            return conf <= threshold  # confident → exit (ADD.py:421-432)
        if confidence == "entropy":
            return conf < threshold  # low entropy → exit (ADD.py:478)
        return conf > threshold  # high max-prob coverage → exit (ADD.py:481)

    # ------------------------------------------------------- per-image mode

    def infer(
        self,
        x: jnp.ndarray,
        threshold: float = 0.0,
        confidence: str = "edm",
    ):
        """Single input (batch 1). Returns (logits (N, C, H, W) — the
        reference's torch layout — exit_index, latency_s, confidence_value).
        Timing brackets device work via block_until_ready (reference:
        cuda.synchronize + perf_counter, ADD.py:380-437)."""
        x = jnp.asarray(x)
        size = tuple(x.shape[1:3])
        jax.block_until_ready(x)
        t0 = time.perf_counter()

        carry = x
        logits = None
        conf_value = float("nan")
        exit_index = len(self.exits) - 1
        for k in range(len(self.exits) - 1):
            out = self._decide(k, size, confidence, threshold)(carry)
            carry, conf = out[0], out[1]
            conf_value = float(conf[0])  # the one scalar readback per decision
            if self._exits_now(conf_value, confidence, threshold):
                exit_index = k
                logits = (
                    self._head(self.exits[k], size)(carry)
                    if confidence == "edm"
                    else out[2]
                )
                break
        if logits is None:
            logits = self._final(size)(carry)

        jax.block_until_ready(logits)
        latency = time.perf_counter() - t0
        return logits, exit_index, latency, conf_value

    # -------------------------------------------------------- batched mode

    def infer_batch(
        self,
        x: jnp.ndarray,
        threshold: float = 0.0,
        confidence: str = "edm",
        bucket_sizes: Optional[List[int]] = None,
    ):
        """Batched early exit with real FLOPs savings: at each exit, images
        that exit are finalized; the continuing subset is gathered into the
        smallest padded bucket (static shapes) before later segments run.

        Returns (logits (N, C, H, W) fp32, exit_index (N,) int).

        A/B VERDICT (r4, v5e, 1025x2049): at full eval resolution this path
        LOSES to the serial batch-1 segment loop on device time — b4 with a
        2/4 exit mix measured 65.3 ms/batch = 16.3 ms/img vs ~11.1 ms/img
        serial at the same mix. A single full-res image already saturates
        the chip (batching amortizes nothing), so the bucketed path can at
        best match the serial device time and pays extra for the carry-state
        compaction gather; its per-exit confidence batch ALSO re-launches
        the stems per image. It remains the right shape when per-launch
        overhead dominates (small images, dispatch-bound serving) and is
        what bench.py reports honestly via `serial_batch1_ms_at_same_mix` /
        `pays_off`."""
        n = x.shape[0]
        size = tuple(x.shape[1:3])
        if bucket_sizes is None:
            bucket_sizes = sorted({2 ** i for i in range(0, 16) if 2 ** i < n} | {n})
        carry = jnp.asarray(x)
        alive = np.arange(n)
        out: List[Optional[np.ndarray]] = [None] * n
        exit_idx = np.full(n, len(self.exits) - 1, np.int64)

        for k in range(len(self.exits) - 1):
            res = self._decide(k, size, confidence, threshold)(carry)
            carry, conf = res[0], np.asarray(res[1])
            exits_now = self._exits_now(conf, confidence, threshold)

            if exits_now.any():
                head_logits = (
                    self._head(self.exits[k], size)(carry)
                    if confidence == "edm"
                    else res[2]
                )
                for j in np.nonzero(exits_now)[0]:
                    out[alive[j]] = np.asarray(head_logits[j], np.float32)
                    exit_idx[alive[j]] = k

            keep = np.nonzero(~exits_now)[0]
            if keep.size == 0:
                return np.stack(out), exit_idx
            if keep.size < len(alive):
                bucket = min(b for b in bucket_sizes if b >= keep.size)
                pad = np.concatenate([keep, np.repeat(keep[-1], bucket - keep.size)])
                idx = jnp.asarray(pad)
                carry = jax.tree.map(lambda a: a[idx], carry)
                alive = alive[keep]

        logits = self._final(size)(carry)
        for j, img in enumerate(alive):
            out[img] = np.asarray(logits[j], np.float32)
        return np.stack(out), exit_idx

    # ---------------------------------------------- single-program cond mode

    def fused_program(self, size, confidence: str = "edm") -> Callable:
        """ONE compiled program for the whole dynamic inference: the exit
        decision is a `lax.cond` chain, so the untaken branches' FLOPs are
        skipped ON DEVICE (HLO Conditional executes a single branch) with no
        host round trip per exit — the TPU-native answer to the reference's
        Python control flow. The threshold is a runtime scalar (no recompile
        per threshold).

        Returns jit fn(x, threshold) -> (logits, exit_index, confidence).
        """
        key = ("fused", size, confidence)
        if key in self._programs:
            return self._programs[key]

        exits = self.exits
        model, edm = self.model, self.edm

        def exit_pred(conf, threshold):
            if confidence == "edm":
                return conf <= threshold
            if confidence == "entropy":
                return conf < threshold
            return conf > threshold

        @jax.jit
        def program(variables, edm_variables, x, threshold):
            def run_cells(state, start, end):
                return model.apply(
                    variables, state, start, end, False, method="run_cells"
                )

            def head(state, e):
                return model.apply(
                    variables, state, e, size, False, True,
                    method="exit_logits",
                )  # (N, C, H, W)

            def conf_of(state, e, threshold):
                if confidence == "edm":
                    feature = model.apply(variables, state, e, method="exit_feature")
                    return edm.apply(edm_variables, feature)[0, 0], None
                logits = head(state, e)
                if confidence == "entropy":
                    return (
                        normalized_shannon_entropy(
                            logits, self.num_classes, class_axis=1
                        )[0],
                        logits,
                    )
                return confidence_max(logits, threshold, class_axis=1)[0], logits

            def stage(k, state, threshold):
                """Cells up to exit k, then cond(exit here, descend deeper)."""
                e = exits[k]
                start = 0 if k == 0 else exits[k - 1] + 1
                state = run_cells(state, start, e)
                if k == len(exits) - 1:
                    return head(state, e), jnp.int32(k), jnp.float32(jnp.nan)

                conf, maybe_logits = conf_of(state, e, threshold)

                # Branches carry logits in the head's native dtype (bf16 under
                # a bf16 policy): casting to fp32 here would add a ~320 MB copy
                # at the HLO Conditional boundary per level at 1025x2049.
                def take_exit(s):
                    logits = maybe_logits if maybe_logits is not None else head(s, e)
                    return logits, jnp.int32(k), conf

                def descend(s):
                    logits, idx, _ = stage(k + 1, s, threshold)
                    return logits, idx, conf

                return jax.lax.cond(
                    exit_pred(conf, threshold), take_exit, descend, state
                )

            state = self._stem_state(variables, x)
            return stage(0, state, threshold)

        self._programs[key] = self._bind(program)
        return self._programs[key]

    def infer_fused(self, x, threshold: float = 0.0, confidence: str = "edm"):
        """Single-launch dynamic inference. Same return contract as infer()."""
        x = jnp.asarray(x)
        size = tuple(x.shape[1:3])
        program = self.fused_program(size, confidence)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        logits, idx, conf = program(x, jnp.float32(threshold))
        jax.block_until_ready(logits)
        latency = time.perf_counter() - t0
        return logits, int(idx), latency, float(conf)
