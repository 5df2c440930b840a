"""Stage-3 driver: train the EDM on cached backbone features
(train_edm.py parity)."""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..data import make_data_loader
from ..models import ADD
from ..train.edm_trainer import make_edm_dataset, train_edm
from ..utils.saver import Saver
from .common import add_common_args, resolve_arch


def build_parser():
    p = argparse.ArgumentParser(description="Train the EDM regressor")
    add_common_args(p)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--edm-batch-size", type=int, default=16)
    p.add_argument("--resume", default=None,
                   help="experiment dir containing the stage-2 checkpoint")
    p.add_argument("--genotype", default=None)
    p.add_argument("--max-items", type=int, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    path, C_index, low_level_layer, genotype = resolve_arch(args, args.genotype)

    loaders = make_data_loader(
        args.dataset,
        1,  # feature generation at batch 1 over full-size images
        root=args.data_root,
        edm=args.dataset.startswith("cityscapes"),
        num_workers=args.workers,
        seed=args.seed,
        synthetic_length=args.synthetic_length,
        synthetic_crop=tuple(args.synthetic_crop),
    )
    train_loader, nclass = loaders[0], loaders[-1]

    model = ADD(path, C_index, genotype, nclass, F=args.F, B=args.B,
                low_level_layer=low_level_layer)
    from ..data.loader import peek_batch

    sample = peek_batch(train_loader)["image"][:1]
    from ..utils.initialize import jit_init

    variables = jit_init(model, jax.random.PRNGKey(args.seed), sample, train=False)
    if args.resume:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        restored = ckpt.restore(
            os.path.abspath(os.path.join(args.resume, "checkpoint")),
            {
                "params": variables["params"],
                "batch_stats": variables["batch_stats"],
            },
        )
        variables = restored

    saver = Saver(args.run_dir, args.dataset, args.checkname or f"edm_C{args.C}")
    features, entropies = make_edm_dataset(
        model, variables, train_loader,
        num_classes=nclass, cache_dir=saver.experiment_dir,
        max_items=args.max_items,
    )
    edm, edm_vars, loss = train_edm(
        features, entropies,
        epochs=args.epochs, batch_size=args.edm_batch_size, lr=args.lr,
        seed=args.seed,
    )
    saver.save_checkpoint(edm_vars, is_best=True, epoch=args.epochs,
                          best_pred=-loss, filename="edm")
    print(f"edm trained: L1={loss:.4f}, saved to {saver.experiment_dir}")
    return loss


if __name__ == "__main__":
    main()
