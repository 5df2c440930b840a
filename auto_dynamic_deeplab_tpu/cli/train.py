"""Stage-2 driver: train the decoded multi-exit network (train.py parity).

Example (synthetic smoke):
  python -m auto_dynamic_deeplab_tpu.cli.train --dataset synthetic \
      --epochs 3 --F 4 --batch-size 8
"""
from __future__ import annotations

import argparse

import numpy as np

from ..data import calculate_class_weights, make_data_loader
from ..models import ADD, BaselineModel
from ..parallel.mesh import DATA_AXIS
from ..train.trainer import TrainConfig, Trainer
from .common import add_common_args, resolve_arch


def build_parser():
    p = argparse.ArgumentParser(description="Train decoded ADD network")
    add_common_args(p)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--lr-scheduler", default="poly", choices=["poly", "cos", "step"])
    p.add_argument("--min-lr", type=float, default=None)
    p.add_argument("--weight-decay", type=float, default=4e-5)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--no-nesterov", action="store_true")
    p.add_argument("--eval-interval", type=int, default=10)
    p.add_argument("--use-balanced-weights", action="store_true")
    p.add_argument("--network", default="ADD", choices=["ADD", "baseline"])
    p.add_argument("--genotype", default=None, help="path to genotype .npy")
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    p.add_argument("--remat", action="store_true",
                   help="checkpoint cells (memory for FLOPs)")
    p.add_argument("--resume", default=None,
                   help="'auto' (newest committed checkpoint for this "
                        "checkname; preemption recovery) or a checkpoint dir")
    p.add_argument("--ft", action="store_true",
                   help="fine-tune: load weights only, restart the schedule")
    p.add_argument("--device-augment", action="store_true",
                   help="on-device input pipeline: loader ships decode-only "
                        "uint8; flip/scale/crop/normalize run as one jitted "
                        "XLA program on the TPU (data/device_transforms.py)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    path, C_index, low_level_layer, genotype = resolve_arch(args, args.genotype)

    train_loader, val_loader, nclass = make_data_loader(
        args.dataset,
        args.batch_size,
        args.test_batch_size,
        root=args.data_root,
        num_workers=args.workers,
        seed=args.seed,
        crop_size=tuple(args.crop_size),
        synthetic_length=args.synthetic_length,
        synthetic_crop=tuple(args.synthetic_crop),
        raw_train=args.device_augment,
    )

    import jax.numpy as jnp

    model_cls = ADD if args.network == "ADD" else BaselineModel
    model = model_cls(
        path, C_index, genotype, nclass,
        F=args.F, B=args.B, low_level_layer=low_level_layer,
        axis_name=DATA_AXIS if args.sync_bn else None,
        dtype=jnp.bfloat16 if args.bf16 else None,
        remat=args.remat,
    )

    weight = None
    if args.use_balanced_weights:
        weight = calculate_class_weights(train_loader.dataset, nclass, max_items=64)

    cfg = TrainConfig(
        epochs=args.epochs,
        lr=args.lr,
        lr_scheduler=args.lr_scheduler,
        min_lr=args.min_lr,
        momentum=args.momentum,
        nesterov=not args.no_nesterov,
        weight_decay=args.weight_decay,
        eval_interval=args.eval_interval,
        run_dir=args.run_dir,
        dataset=args.dataset,
        checkname=args.checkname or f"{args.network}_C{args.C}_F{args.F}",
        data_parallel=not args.no_data_parallel,
        resume=args.resume,
        ft=args.ft,
        device_augment=args.device_augment,
        crop_size=tuple(args.crop_size) if args.device_augment else None,
    )
    trainer = Trainer(model, train_loader, val_loader, cfg, class_weight=weight,
                      seed=args.seed)
    result = trainer.fit()
    print("final:", {k: v for k, v in result.items() if k != "exit_histogram"})
    return result


if __name__ == "__main__":
    main()
