"""Early-exit dynamic inference engine.

TPU-native re-expression of ADD.dynamic_inference (modeling/ADD.py:379-488),
which is data-dependent Python control flow over CUDA kernels. Here the
backbone is cut at every exit into separately-compiled XLA programs:

    stem+cells[0..e0] -> conf_0 -> (head_0 | cells[e0+1..e1]) -> ...

The host reads ONE scalar confidence per exit decision; stopping early means
later segments are never launched, so early exit genuinely skips FLOPs (the
BASELINE.md requirement) — not masked-out math.

Two modes:
  * per-image (batch 1) with wall-clock timing — benchmark parity with the
    reference's synchronize+perf_counter loop;
  * bucketed batch mode: evaluate confidences for the whole batch at exit k,
    then re-launch only the continuing images (compacted to padded buckets).
"""
from __future__ import annotations

import time
from functools import partial
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
    ):
        self.model = model
        self.variables = variables
        self.edm = edm
        self.edm_variables = edm_variables
        self.num_classes = num_classes
        self.exits: Tuple[int, ...] = model.exit_layers
        self._programs = {}

    # ------------------------------------------------------------ programs

    def _segment(self, start: int, end: int) -> Callable:
        key = ("seg", start, end)
        if key not in self._programs:

            @jax.jit
            def seg(state):
                return self.model.apply(
                    self.variables, state, start, end, False, method="run_cells"
                )

            self._programs[key] = seg
        return self._programs[key]

    def _stem(self) -> Callable:
        if ("stem",) not in self._programs:

            @jax.jit
            def stem(x):
                return self.model.apply(
                    self.variables, x, False, method="stem_state"
                )

            self._programs[("stem",)] = stem
        return self._programs[("stem",)]

    def _head(self, exit_layer: int, size) -> Callable:
        key = ("head", exit_layer, size)
        if key not in self._programs:

            @jax.jit
            def head(state):
                return self.model.apply(
                    self.variables, state, exit_layer, size, False,
                    method="exit_logits",
                )

            self._programs[key] = head
        return self._programs[key]

    def _edm_conf(self, exit_layer: int) -> Callable:
        key = ("edm", exit_layer)
        if key not in self._programs:
            assert self.edm is not None and self.edm_variables is not None

            @jax.jit
            def conf(state):
                feature = self.model.apply(
                    self.variables, state, exit_layer, method="exit_feature"
                )
                return self.edm.apply(self.edm_variables, feature)[:, 0]

            self._programs[key] = conf
        return self._programs[key]

    def _head_conf(
        self, exit_layer: int, size, confidence: str, threshold: float
    ) -> Callable:
        key = ("headconf", exit_layer, size, confidence, threshold)
        if key not in self._programs:

            @jax.jit
            def head_conf(state):
                logits = self.model.apply(
                    self.variables, state, exit_layer, size, False,
                    method="exit_logits",
                )
                if confidence == "entropy":
                    c = normalized_shannon_entropy(logits, self.num_classes)
                else:
                    c = confidence_max(logits, threshold)
                return logits, c

            self._programs[key] = head_conf
        return self._programs[key]

    def warmup(self, input_shape, confidence: str = "edm", threshold: float = 0.0):
        """Compile every program for a given input shape."""
        x = jnp.zeros(input_shape, jnp.float32)
        size = tuple(input_shape[1:3])
        state = self._stem()(x)
        start = 0
        for k, e in enumerate(self.exits):
            state = self._segment(start, e)(state)
            if k < len(self.exits) - 1:
                if confidence == "edm":
                    jax.block_until_ready(self._edm_conf(e)(state))
                else:
                    jax.block_until_ready(
                        self._head_conf(e, size, confidence, threshold)(state)
                    )
            jax.block_until_ready(self._head(e, size)(state))
            start = e + 1

    # ------------------------------------------------------- per-image mode

    def infer(
        self,
        x: jnp.ndarray,
        threshold: float = 0.0,
        confidence: str = "edm",
    ):
        """Single input (batch 1). Returns (logits, exit_index, latency_s,
        confidence_value). Timing brackets device work via block_until_ready
        (reference: cuda.synchronize + perf_counter, ADD.py:380-437)."""
        x = jnp.asarray(x)
        size = tuple(x.shape[1:3])
        jax.block_until_ready(x)
        t0 = time.perf_counter()

        state = self._stem()(x)
        start = 0
        logits = None
        conf_value = float("nan")
        exit_index = len(self.exits) - 1
        for k, e in enumerate(self.exits):
            state = self._segment(start, e)(state)
            start = e + 1
            is_last = k == len(self.exits) - 1
            if is_last:
                logits = self._head(e, size)(state)
                break
            if confidence == "edm":
                conf_value = float(self._edm_conf(e)(state)[0])
                if conf_value <= threshold:  # confident → exit (ADD.py:421-432)
                    logits = self._head(e, size)(state)
                    exit_index = k
                    break
            else:
                logits, c = self._head_conf(e, size, confidence, threshold)(state)
                conf_value = float(c[0])
                exit_now = (
                    conf_value < threshold
                    if confidence == "entropy"
                    else conf_value > threshold
                )
                if exit_now:
                    exit_index = k
                    break

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

        Returns (logits (N,H,W,C) fp32, exit_index (N,) int).
        """
        n = x.shape[0]
        size = tuple(x.shape[1:3])
        if bucket_sizes is None:
            bucket_sizes = sorted({2 ** i for i in range(0, 16) if 2 ** i < n} | {n})
        state = self._stem()(jnp.asarray(x))
        alive = np.arange(n)
        out = [None] * n
        exit_idx = np.full(n, len(self.exits) - 1, np.int64)
        start = 0

        for k, e in enumerate(self.exits):
            state = self._segment(start, e)(state)
            start = e + 1
            is_last = k == len(self.exits) - 1
            if is_last:
                logits = self._head(e, size)(state)
                for j, img in enumerate(alive):
                    out[img] = np.asarray(logits[j], np.float32)
                break

            if confidence == "edm":
                conf = np.asarray(self._edm_conf(e)(state))
                exits_now = conf <= threshold
            else:
                logits, conf = self._head_conf(e, size, confidence, threshold)(state)
                conf = np.asarray(conf)
                exits_now = (
                    conf < threshold if confidence == "entropy" else conf > threshold
                )

            if exits_now.any():
                head_logits = (
                    logits if confidence != "edm" else self._head(e, size)(state)
                )
                for j in np.nonzero(exits_now)[0]:
                    out[alive[j]] = np.asarray(head_logits[j], np.float32)
                    exit_idx[alive[j]] = k

            keep = np.nonzero(~exits_now)[0]
            if keep.size == 0:
                break
            if keep.size < len(alive):
                bucket = min(b for b in bucket_sizes if b >= keep.size)
                pad = np.concatenate([keep, np.repeat(keep[-1], bucket - keep.size)])
                idx = jnp.asarray(pad)
                state = jax.tree.map(lambda a: a[idx], state)
                alive = alive[keep]

        logits = np.stack([o for o in out])
        return logits, exit_idx
