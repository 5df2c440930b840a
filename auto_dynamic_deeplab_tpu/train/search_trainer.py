"""Stage-1 NAS search trainer — equivalent of search.py Trainer (:43-327).

Bilevel alternating optimization on two disjoint train halves:
  * weight step (loader A): SGD+momentum on 'params' with per-exit CE mean;
  * arch step (loader B, after ``alpha_epoch``): Adam on the 'arch'
    collection (alphas/betas) with the same loss (search.py:203-224).
Both steps run train-mode BN (stats update in either step, as in the
reference). Each validation decodes the architecture (Viterbi + genotype)
and persists network_path/betas/genotype .npy (search.py:296-327).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..nas.decode import genotype_decode, viterbi_decode
from ..utils.metrics import Evaluator
from ..utils.saver import Saver, find_latest_checkpoint, restore_checkpoint
from ..utils.summaries import TrainingSummary
from .schedules import lr_schedule


@dataclasses.dataclass
class SearchConfig:
    """Defaults are the PUBLISHED recipe (scripts/search_cityscapes.sh in the
    reference: lr 0.05 / min 0.003 cos, weight-decay 8e-4, arch-lr 1e-3) —
    NOT the reference's argparse defaults (search.py:360-362: lr 0.025,
    wd 3e-4, arch-lr 3e-3), which its shipped scripts always override. The
    CLI (cli/search.py) keeps argparse-default parity; constructing a
    SearchConfig directly gets the recipe that was actually published."""
    epochs: int = 300
    alpha_epoch: int = 150        # arch updates start here (search.py:203)
    lr: float = 0.05
    min_lr: float = 0.003
    lr_scheduler: str = "cos"
    momentum: float = 0.9
    weight_decay: float = 8e-4
    arch_lr: float = 1e-3
    arch_weight_decay: float = 1e-3
    eval_interval: int = 5
    # per-exit CE reduction: 'mean' (search.py:190-194) or 'sum'
    # (search_layer.py:187-196 — the dedicated 2-exit driver)
    loss_reduce: str = "mean"
    run_dir: str = "run"
    dataset: str = "synthetic"
    checkname: str = "search"
    # 'auto' = newest committed checkpoint for this run_dir/dataset/checkname
    # (preemption recovery), or an explicit checkpoint dir — the reference's
    # search --resume (search.py:104-116) restores epoch/weights/optimizer
    resume: Optional[str] = None


class SearchTrainer:
    def __init__(
        self,
        model,
        loader_a,
        loader_b,
        val_loader,
        config: SearchConfig,
        class_weight: Optional[np.ndarray] = None,
        sample_input: Optional[np.ndarray] = None,
        seed: int = 0,
        mesh=None,
    ):
        self.model = model
        self.loader_a = loader_a
        self.loader_b = loader_b
        self.val_loader = val_loader
        self.config = config
        self.best_pred = 0.0
        weight = None if class_weight is None else jnp.asarray(class_weight)

        if sample_input is None:
            from ..data.loader import peek_batch

            sample_input = peek_batch(loader_a)["image"][:1]
        from ..utils.initialize import jit_init

        variables = jit_init(
            model, jax.random.PRNGKey(seed), sample_input, train=True
        )
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.arch = variables["arch"]

        iters = max(len(loader_a), 1)
        schedule = lr_schedule(
            config.lr_scheduler, config.lr, config.epochs, iters, min_lr=config.min_lr
        )
        self.w_tx = optax.chain(
            optax.add_decayed_weights(config.weight_decay),
            optax.sgd(learning_rate=schedule, momentum=config.momentum),
        )
        self.w_opt = self.w_tx.init(self.params)
        # torch.optim.Adam semantics (search.py:99-102): L2-in-gradient, NOT
        # AdamW's decoupled decay — see make_arch_optimizer.
        from .step import make_arch_optimizer

        self.a_tx = make_arch_optimizer(config.arch_lr, config.arch_weight_decay)
        self.a_opt = self.a_tx.init(self.arch)

        # Data-parallel bilevel steps over the mesh (search.py:144-149 runs
        # search under DataParallel+SyncBN; the model must be built with
        # axis_name=DATA_AXIS when a mesh is passed). mesh=None → plain jit.
        from .step import make_search_steps

        self._weight_step, self._arch_step = make_search_steps(
            model, self.w_tx, self.a_tx, mesh=mesh, class_weight=weight,
            loss_reduce=config.loss_reduce,
        )
        from ..parallel.mesh import DATA_AXIS

        self.n_shards = mesh.shape[DATA_AXIS] if mesh is not None else 1

        # Built ONCE so validation epochs reuse the compiled program instead
        # of rebuilding a fresh @jax.jit closure (and recompiling) each call.
        @jax.jit
        def predict(variables, x):
            outs = model.apply(variables, x, train=False)
            return [jnp.argmax(o, axis=-1) for o in outs]

        self._predict = predict

        self.start_epoch = 0
        if config.resume:
            self._resume(config.resume)

        self.saver = Saver(config.run_dir, config.dataset, config.checkname)
        self.saver.save_experiment_config(dataclasses.asdict(config))
        self.summary = TrainingSummary(self.saver.experiment_dir)

    # ---------------------------------------------------------------- train

    def _resume(self, resume: str):
        """Restore params/BN-stats/arch/optimizers/epoch from a committed
        checkpoint — the reference's search --resume (search.py:104-116);
        'auto' discovers the newest one (preemption recovery)."""
        path = resume
        if resume == "auto":
            path = find_latest_checkpoint(
                self.config.run_dir, self.config.dataset, self.config.checkname
            )
            if path is None:
                return  # cold start: nothing committed yet
        target = {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "arch": self.arch,
            "w_opt": self.w_opt,
            "a_opt": self.a_opt,
        }
        try:
            restored, meta = restore_checkpoint(path, target)
        except Exception as exc:
            # pre-round-3 checkpoints carry no optimizer states; warn loudly —
            # this path also swallows genuine restore failures, and resuming
            # with fresh optimizers silently loses momentum + restarts the LR
            # schedule, so the operator must be able to see it happened.
            import warnings

            warnings.warn(
                f"full search-checkpoint restore from {path} failed "
                f"({type(exc).__name__}: {exc}); retrying without optimizer "
                "states — if this succeeds, momentum and Adam moments resume "
                "FRESH (expected only for pre-round-3 checkpoints)",
                stacklevel=2,
            )
            slim = {k: target[k] for k in ("params", "batch_stats", "arch")}
            restored, meta = restore_checkpoint(path, slim)
        self.params = restored["params"]
        self.batch_stats = restored["batch_stats"]
        self.arch = restored["arch"]
        self.w_opt = restored.get("w_opt", self.w_opt)
        self.a_opt = restored.get("a_opt", self.a_opt)
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        self.best_pred = float(meta.get("best_pred", 0.0))

    def training(self, epoch: int) -> float:
        self.loader_a.set_epoch(epoch)
        self.loader_b.set_epoch(epoch)
        iter_b = iter(self.loader_b)
        losses = []
        for batch in self.loader_a:
            if batch["image"].shape[0] % self.n_shards:
                continue  # ragged tail smaller than the mesh
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            self.params, self.batch_stats, self.w_opt, loss = self._weight_step(
                self.params, self.batch_stats, self.arch, self.w_opt, batch
            )
            losses.append(float(loss))

            if epoch >= self.config.alpha_epoch:
                batch_b = None
                for _ in range(len(self.loader_b) + 1):  # bounded: all-ragged B set
                    try:
                        batch_b = next(iter_b)
                    except StopIteration:
                        iter_b = iter(self.loader_b)
                        try:
                            batch_b = next(iter_b)
                        except StopIteration:
                            raise RuntimeError(
                                "loader_b yields no batches: the arch half "
                                f"of the 50/50 search split ({len(self.loader_b.dataset)} "
                                f"samples) is smaller than one batch "
                                f"({self.loader_b.batch_size}) — shrink the "
                                "batch or grow the dataset"
                            ) from None
                    if batch_b["image"].shape[0] % self.n_shards == 0:
                        break
                else:
                    raise RuntimeError(
                        f"no loader_b batch divides the {self.n_shards}-shard mesh"
                    )
                batch_b = {k: jnp.asarray(v) for k, v in batch_b.items()}
                self.arch, self.batch_stats, self.a_opt, _ = self._arch_step(
                    self.params, self.batch_stats, self.arch, self.a_opt, batch_b
                )

        if not losses:
            raise RuntimeError(
                f"epoch {epoch}: every batch was dropped as a ragged tail — "
                f"batch size must be a multiple of the {self.n_shards}-shard "
                "mesh (build it with parallel.mesh.make_data_mesh)"
            )
        train_loss = float(np.mean(losses))
        self.summary.add_scalar("search/train_loss", train_loss, epoch)
        return train_loss

    # ----------------------------------------------------------------- val

    def validation(self, epoch: int) -> dict:
        n_exits = len(self.model.exit_stations)
        evaluators = [Evaluator(self.model.num_classes) for _ in range(n_exits)]
        variables = {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "arch": self.arch,
        }

        for batch in self.val_loader:
            preds = self._predict(variables, jnp.asarray(batch["image"]))
            for k in range(n_exits):
                evaluators[k].add_batch(batch["label"], np.asarray(preds[k]))
        mious = [e.Mean_Intersection_over_Union() for e in evaluators]
        for k, m in enumerate(mious):
            self.summary.add_scalar(f"search/mIoU_exit_{k}", m, epoch)

        mean_miou = float(np.mean(mious))
        is_best = mean_miou > self.best_pred
        if is_best:
            self.best_pred = mean_miou
        self.decode_and_save(epoch)
        self.saver.save_checkpoint(
            {
                "params": self.params,
                "batch_stats": self.batch_stats,
                "arch": self.arch,
                "w_opt": self.w_opt,
                "a_opt": self.a_opt,
            },
            is_best,
            epoch,
            self.best_pred,
        )
        return {"miou": mious}

    def decode_and_save(self, epoch: int) -> dict:
        """Viterbi + genotype decode of the current arch (search.py:296-327)."""
        betas = np.asarray(self.arch["betas"], np.float32)
        path, space = viterbi_decode(betas)
        genotype = None
        if "alphas" in self.arch:
            genotype = genotype_decode(
                np.asarray(self.arch["alphas"], np.float32), self.model.B
            )
        self.saver.save_architecture(epoch, path, betas=betas, genotype=genotype)
        return {"path": path, "space": space, "genotype": genotype}

    def fit(self, epochs: Optional[int] = None) -> dict:
        epochs = epochs or self.config.epochs
        result = {}
        for epoch in range(self.start_epoch, epochs):
            loss = self.training(epoch)
            # interval <= 0 disables validation (the reference's --no-val)
            if self.config.eval_interval > 0 and (
                (epoch + 1) % self.config.eval_interval == 0
                or epoch == epochs - 1
            ):
                result = self.validation(epoch)
                result["train_loss"] = loss
        return result
