"""Stage-1 driver: NAS search (search.py parity).

--network supernet      → cell+path search (Model_search equivalent)
--network net_supernet  → path-only search with fixed cells (Model_net_search)
"""
from __future__ import annotations

import argparse

import numpy as np

from ..data import make_data_loader
from ..models import ModelBaselinePathSearch, ModelNetSearch, ModelSearch
from ..nas.genotypes import AUTODEEPLAB_GENOTYPE
from ..train.search_trainer import SearchConfig, SearchTrainer
from .common import add_common_args, search_c_index


def build_parser():
    p = argparse.ArgumentParser(description="NAS supernet search")
    add_common_args(p)
    p.add_argument("--network", default="net_supernet",
                   choices=["supernet", "net_supernet", "baseline_path"])
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--alpha-epoch", type=int, default=150)
    # argparse defaults mirror the reference's argparse (search.py:360-362);
    # the PUBLISHED recipe (lr 0.05 / wd 8e-4 / arch-lr 1e-3) is what
    # scripts/search_cityscapes.sh passes and what SearchConfig defaults to.
    p.add_argument("--lr", type=float, default=0.025)
    p.add_argument("--min-lr", type=float, default=0.003)
    p.add_argument("--arch-lr", type=float, default=3e-3)
    p.add_argument("--weight-decay", type=float, default=3e-4)
    p.add_argument("--arch-weight-decay", type=float, default=1e-3)
    p.add_argument("--eval-interval", type=int, default=5)
    p.add_argument("--num-layers", type=int, default=12)
    p.add_argument("--genotype", default=None)
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--resume", default=None,
                   help="'auto' (newest committed checkpoint) or a checkpoint "
                        "dir — restores weights/arch/optimizers/epoch "
                        "(reference search.py:104-116)")
    p.add_argument("--mixed-exec", default="edges",
                   choices=["edges", "banked", "scan"],
                   help="mixed-cell execution: 'edges' per-edge ops "
                        "(reference-shaped), 'banked' vmapped per block, "
                        "'scan' whole-DAG lax.scan (~20x smaller compiled "
                        "graph; required at the 12L F=20 scale). Same "
                        "numerics; checkpoint param layouts differ")
    p.add_argument("--exit-layers", type=int, nargs="+", default=None,
                   help="override exit stations (default: C-derived)")
    p.add_argument("--no-dp", action="store_true",
                   help="disable data-parallel search even with >1 device "
                        "(default: shard over all devices, mirroring "
                        "search.py:144-149 DataParallel+SyncBN)")
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

    # Data-parallel search over all local devices (search.py:144-149 runs
    # search under DataParallel+SyncBN): shard_map bilevel steps + BN psum.
    import jax

    from ..parallel.mesh import DATA_AXIS, make_data_mesh

    mesh = None
    axis_name = None
    if not args.no_dp and jax.device_count() > 1:
        mesh = make_data_mesh(args.batch_size)
        axis_name = DATA_AXIS if mesh is not None else None

    exits = tuple(args.exit_layers or search_c_index(args.C))
    if args.network == "supernet":
        model = ModelSearch(
            nclass, num_layers=args.num_layers, F=args.F, B=args.B,
            exit_layer=exits[0], remat=not args.no_remat, axis_name=axis_name,
            mixed_exec=args.mixed_exec,
        )
    elif args.network == "baseline_path":
        # 2-exit fixed-station variant (search_layer.py, broken in the ref)
        genotype = np.load(args.genotype) if args.genotype else AUTODEEPLAB_GENOTYPE
        model = ModelBaselinePathSearch(
            nclass, genotype, num_layers=args.num_layers, F=args.F, B=args.B,
            exit_layer=exits[0], remat=not args.no_remat, axis_name=axis_name,
        )
    else:
        genotype = np.load(args.genotype) if args.genotype else AUTODEEPLAB_GENOTYPE
        model = ModelNetSearch(
            nclass, genotype, num_layers=args.num_layers, F=args.F, B=args.B,
            C_index=exits, remat=not args.no_remat, axis_name=axis_name,
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
        run_dir=args.run_dir,
        dataset=args.dataset,
        checkname=args.checkname or f"search_{args.network}_F{args.F}",
        resume=args.resume,
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
