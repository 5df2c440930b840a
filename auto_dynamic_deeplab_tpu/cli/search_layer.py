"""Stage-1 driver, fixed-2-exit variant: search_layer.py parity.

The reference's driver (search_layer.py — import-broken and bit-rotted in
the upstream repo) trains the 2-exit supernets with a *summed* per-exit CE
(loss_1 + loss_2, search_layer.py:187-196) instead of search.py's mean:

  --network supernet       → cell+path search, exit at --exit-layer + final
                             (Model_search, search_layer.py:82-90)
  --network baseline_path  → fixed-cell, non-dense trellis, single fixed
                             exit station (Model_layer_search_baseline,
                             model_baseline_path_search.py:135-150)
"""
from __future__ import annotations

import argparse

import numpy as np

from ..data import make_data_loader
from ..models import ModelBaselinePathSearch, ModelSearch
from ..nas.genotypes import AUTODEEPLAB_GENOTYPE
from ..train.search_trainer import SearchConfig, SearchTrainer
from .common import add_common_args


def build_parser():
    p = argparse.ArgumentParser(description="NAS 2-exit supernet search")
    add_common_args(p)
    p.add_argument("--network", default="baseline_path",
                   choices=["supernet", "baseline_path"])
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--alpha-epoch", type=int, default=150)
    p.add_argument("--lr", type=float, default=0.025)
    p.add_argument("--min-lr", type=float, default=0.003)
    p.add_argument("--arch-lr", type=float, default=3e-3)
    p.add_argument("--weight-decay", type=float, default=3e-4)
    p.add_argument("--arch-weight-decay", type=float, default=1e-3)
    p.add_argument("--eval-interval", type=int, default=5)
    p.add_argument("--num-layers", type=int, default=12)
    p.add_argument("--genotype", default=None)
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--exit-layer", type=int, default=5,
                   help="the fixed early-exit station (reference default 5)")
    p.add_argument("--no-dp", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    loader_a, loader_b, val_loader, nclass = make_data_loader(
        args.dataset,
        args.batch_size,
        args.test_batch_size,
        root=args.data_root,
        supernet=True,
        num_workers=args.workers,
        seed=args.seed,
        synthetic_length=args.synthetic_length,
        synthetic_crop=tuple(args.synthetic_crop),
    )

    import jax

    from ..parallel.mesh import DATA_AXIS, make_data_mesh

    mesh = None
    axis_name = None
    if not args.no_dp and jax.device_count() > 1:
        mesh = make_data_mesh(args.batch_size)
        axis_name = DATA_AXIS if mesh is not None else None

    if args.network == "supernet":
        model = ModelSearch(
            nclass, num_layers=args.num_layers, F=args.F, B=args.B,
            exit_layer=args.exit_layer, remat=not args.no_remat,
            axis_name=axis_name,
        )
    else:
        genotype = np.load(args.genotype) if args.genotype else AUTODEEPLAB_GENOTYPE
        model = ModelBaselinePathSearch(
            nclass, genotype, num_layers=args.num_layers, F=args.F, B=args.B,
            exit_layer=args.exit_layer, remat=not args.no_remat,
            axis_name=axis_name,
        )

    cfg = SearchConfig(
        epochs=args.epochs,
        alpha_epoch=args.alpha_epoch,
        lr=args.lr,
        min_lr=args.min_lr,
        arch_lr=args.arch_lr,
        weight_decay=args.weight_decay,
        arch_weight_decay=args.arch_weight_decay,
        eval_interval=args.eval_interval,
        loss_reduce="sum",  # search_layer.py:190 — loss_1 + loss_2
        run_dir=args.run_dir,
        dataset=args.dataset,
        checkname=args.checkname or f"search_layer_{args.network}_F{args.F}",
    )
    trainer = SearchTrainer(
        model, loader_a, loader_b, val_loader, cfg, seed=args.seed, mesh=mesh
    )
    result = trainer.fit()
    decoded = trainer.decode_and_save(cfg.epochs)
    print("decoded path:", decoded["path"].tolist())
    if decoded["genotype"] is not None:
        print("genotype:", decoded["genotype"].tolist())
    return result


if __name__ == "__main__":
    main()
