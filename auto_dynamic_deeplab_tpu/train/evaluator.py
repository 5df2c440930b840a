"""Evaluation drivers — equivalent of eval.py Evaluation (:29-230).

Static mode: per-exit mIoU over the val set (eval.py:165-193).
Dynamic mode: per-image early-exit inference reporting mIoU, mean latency,
fps, early-exit rate and average confidence (eval.py:195-230) — with the
early exit genuinely skipping FLOPs (per-segment compiled programs).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.confidence import entropy_argmax
from ..utils.meters import AverageMeter
from ..utils.metrics import Evaluator
from .dynamic import DynamicInferenceEngine


class Evaluation:
    def __init__(
        self,
        model,
        variables,
        num_classes: int,
        edm=None,
        edm_variables=None,
    ):
        self.model = model
        self.variables = variables
        self.num_classes = num_classes
        self.edm = edm
        self.edm_variables = edm_variables

        # Weights are jit arguments, not closed-over constants (constants are
        # re-uploaded per execution by remote-relay runtimes).
        @jax.jit
        def _forward(variables, x):
            outs = model.apply(variables, x, train=False)
            # Fused entropy+argmax (kernels/confidence.py): ONE pass over
            # each full-res logits map on TPU batch-1 instead of separate
            # softmax/log/reduce + argmax reads (~160 MB fp32 each at
            # 1025x2049); jnp reference elsewhere.
            preds, confs = [], []
            for o in outs:
                ent, arg = entropy_argmax(o, num_classes)
                preds.append(arg)
                confs.append(ent)
            return preds, confs

        self._forward = lambda x: _forward(self.variables, x)
        self.engine = DynamicInferenceEngine(
            model, variables, edm=edm, edm_variables=edm_variables,
            num_classes=num_classes,
        )

    def update_variables(self, variables, edm_variables=None):
        """Swap in fresh weights WITHOUT rebuilding (all programs take the
        weight pytrees as call-time arguments, so compiled XLA programs are
        reused across validation epochs instead of being recompiled)."""
        self.variables = variables
        self.engine.variables = variables
        if edm_variables is not None:
            self.edm_variables = edm_variables
            self.engine.edm_variables = edm_variables

    # ------------------------------------------------------------- static

    def validate(self, loader) -> Dict:
        """Per-exit mIoU + mean entropy confidence (train.py:278-297)."""
        n_exits = len(self.model.exit_layers)
        evaluators = [Evaluator(self.num_classes) for _ in range(n_exits)]
        conf_meters = [AverageMeter() for _ in range(n_exits)]
        for batch in loader:
            preds, confs = self._forward(jnp.asarray(batch["image"]))
            for k in range(n_exits):
                evaluators[k].add_batch(batch["label"], np.asarray(preds[k]))
                for c in np.asarray(confs[k]):
                    conf_meters[k].update(float(c))
        return {
            "miou": [e.Mean_Intersection_over_Union() for e in evaluators],
            "pixel_acc": [e.Pixel_Accuracy() for e in evaluators],
            "confidence": [m.avg for m in conf_meters],
        }

    # ------------------------------------------------------------ dynamic

    def dynamic_inference(
        self,
        loader,
        threshold: float = 0.0,
        confidence: str = "edm",
        warmup_shape=None,
        fused: bool = True,
        pipeline_devices: int = 0,
    ) -> Dict:
        """``pipeline_devices >= 2`` runs the early-exit segments pipelined
        across that many devices (parallel/pipeline.py: per-stage weight
        partitioning, explicit handoff) instead of single-device programs."""
        evaluator = Evaluator(self.num_classes)
        latency = AverageMeter()
        conf_meter = AverageMeter()
        n_images = 0
        early_exits = 0
        exit_histogram = [0] * len(self.model.exit_layers)

        if pipeline_devices >= 2:
            import time

            from ..parallel.pipeline import PipelinedDynamicInference

            if len(jax.devices()) < pipeline_devices:
                # min(len(devices), len(programs)) inside the pipeline would
                # otherwise silently collapse to fewer (possibly 1) stages and
                # report single-device numbers labeled as pipelined.
                raise RuntimeError(
                    f"pipeline_devices={pipeline_devices} requested but only "
                    f"{len(jax.devices())} devices are available"
                )

            fused = False
            holder = {}  # keyed by spatial size: programs are per-shape

            def infer(x, threshold=threshold, confidence=confidence):
                key = tuple(x.shape[1:3])
                if key not in holder:
                    holder[key] = PipelinedDynamicInference(
                        self.model, self.variables, key,
                        devices=jax.devices()[:pipeline_devices],
                        confidence=confidence, threshold=threshold,
                        edm=self.edm, edm_variables=self.edm_variables,
                        num_classes=self.num_classes,
                    )
                    holder[key].warmup()  # keep compiles out of timings
                t0 = time.perf_counter()
                logits, exit_idx, conf = holder[key].infer(x)
                jax.block_until_ready(logits)
                return logits, exit_idx, time.perf_counter() - t0, conf

        else:
            infer = self.engine.infer_fused if fused else self.engine.infer
            if warmup_shape is not None and not fused:
                self.engine.warmup(warmup_shape, confidence, threshold)

        warmed = fused or warmup_shape is not None or pipeline_devices >= 2
        first = True
        for batch in loader:
            images, labels = batch["image"], batch["label"]
            for i in range(images.shape[0]):
                x = images[i : i + 1]
                if not warmed:
                    self.engine.warmup(x.shape, confidence, threshold)
                    warmed = True
                logits, exit_idx, dt, conf = infer(
                    x, threshold=threshold, confidence=confidence
                )
                if first and fused:
                    # discard the compile-inclusive first timing
                    logits, exit_idx, dt, conf = infer(
                        x, threshold=threshold, confidence=confidence
                    )
                    first = False
                pred = np.asarray(jnp.argmax(logits, axis=1))[0]  # NCHW logits
                evaluator.add_batch(labels[i], pred)
                latency.update(dt)
                if not np.isnan(conf):
                    conf_meter.update(conf)
                exit_histogram[exit_idx] += 1
                early_exits += int(exit_idx < len(self.model.exit_layers) - 1)
                n_images += 1

        return {
            "miou": evaluator.Mean_Intersection_over_Union(),
            "mean_latency_s": latency.avg,
            "fps": 1.0 / max(latency.avg, 1e-12),
            "early_exit_rate": early_exits / max(n_images, 1),
            "avg_confidence": conf_meter.avg,
            "exit_histogram": exit_histogram,
            "n_images": n_images,
        }
