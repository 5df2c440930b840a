"""Eval driver (eval.py parity): static per-exit mIoU or --dynamic early-exit
inference with mIoU / latency / fps / exit-rate / avg-confidence, plus FLOPs
and parameter counts via XLA cost analysis."""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data import make_data_loader
from ..models import ADD, EDM, BaselineModel
from ..train.evaluator import Evaluation
from ..utils.flops import model_complexity
from .common import add_common_args, resolve_arch


def build_parser():
    p = argparse.ArgumentParser(description="Evaluate decoded network")
    add_common_args(p)
    p.add_argument("--network", default="ADD", choices=["ADD", "baseline"])
    p.add_argument("--dynamic", action="store_true")
    p.add_argument("--confidence", default="edm", choices=["edm", "entropy", "max"])
    p.add_argument("--threshold", type=float, default=0.0)
    p.add_argument("--resume", default=None, help="stage-2 experiment dir")
    p.add_argument("--edm-resume", default=None, help="stage-3 experiment dir")
    p.add_argument("--genotype", default=None)
    p.add_argument("--flops", action="store_true")
    p.add_argument(
        "--pipeline-devices", type=int, default=0,
        help=">=2: pipeline the dynamic-inference segments across this many "
        "devices (per-stage weight partitioning, parallel/pipeline.py)",
    )
    p.add_argument(
        "--cell-exec",
        default="xla",
        choices=["xla", "packed", "flat", "flat-packed", "dense-sep"],
        help="eval-path cell execution: plain XLA ops, wave-packed "
        "block-diag matmuls (ops/packed.py), fused flat-layout Pallas "
        "block kernels (kernels/cell_ops.py; TPU, batch-1), both "
        "(flat DAG + packed dense-tap 1x1s), or XLA with the exact "
        "SepConv dense-form rewrite (ops/primitives.py)",
    )
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    path, C_index, low_level_layer, genotype = resolve_arch(args, args.genotype)

    _, val_loader, nclass = make_data_loader(
        args.dataset,
        args.batch_size,
        args.test_batch_size,
        root=args.data_root,
        num_workers=args.workers,
        seed=args.seed,
        synthetic_length=args.synthetic_length,
        synthetic_crop=tuple(args.synthetic_crop),
    )

    model_cls = ADD if args.network == "ADD" else BaselineModel
    exec_kw = {
        "packed": {"packed_eval": True},
        "flat": {"flat_eval": True},
        "flat-packed": {"flat_eval": True, "packed_eval": True},
        "dense-sep": {"dense_sep_eval": True},
    }.get(args.cell_exec, {})
    model = model_cls(path, C_index, genotype, nclass, F=args.F, B=args.B,
                      low_level_layer=low_level_layer, **exec_kw)
    from ..data.loader import peek_batch

    sample = peek_batch(val_loader)["image"][:1]
    from ..utils.initialize import jit_init

    variables = jit_init(model, jax.random.PRNGKey(args.seed), sample, train=False)

    import orbax.checkpoint as ocp

    if args.resume:
        ckpt = ocp.StandardCheckpointer()
        variables = ckpt.restore(
            os.path.abspath(os.path.join(args.resume, "checkpoint")),
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        )

    edm = edm_vars = None
    if args.confidence == "edm" and args.dynamic:
        edm = EDM()
        # Only the feature SHAPE is needed to init the EDM: eval_shape traces
        # without executing (an eager get_feature here ran the whole backbone
        # op-by-op — minutes of dispatch RTT on a remote-relay TPU).
        feat = jax.eval_shape(
            lambda v, x: model.apply(v, x, train=False, method="get_feature"),
            variables, sample,
        )[1]
        edm_vars = edm.init(
            jax.random.PRNGKey(0), jnp.zeros(feat.shape, feat.dtype)
        )
        if args.edm_resume:
            ckpt = ocp.StandardCheckpointer()
            edm_vars = ckpt.restore(
                os.path.abspath(os.path.join(args.edm_resume, "edm")), edm_vars
            )

    evaluation = Evaluation(model, variables, nclass, edm=edm, edm_variables=edm_vars)

    if args.dynamic:
        stats = evaluation.dynamic_inference(
            val_loader, threshold=args.threshold, confidence=args.confidence,
            pipeline_devices=args.pipeline_devices,
        )
    else:
        stats = evaluation.validate(val_loader)

    if args.flops:
        stats["complexity"] = model_complexity(model, variables, sample.shape)

    print(json.dumps(stats, default=float))
    return stats


if __name__ == "__main__":
    main()
