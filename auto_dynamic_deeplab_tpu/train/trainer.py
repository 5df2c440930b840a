"""Stage-2 trainer — equivalent of train.py trainNew (:34-322).

Glues: data loaders → sharded (or single-device) jitted train step →
per-epoch validation (per-exit mIoU + mean entropy confidence) → checkpoint
with best-mIoU promotion → scalar summaries.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import make_data_mesh
from ..utils.saver import Saver, find_latest_checkpoint, restore_checkpoint
from ..utils.summaries import TrainingSummary
from .evaluator import Evaluation
from .schedules import lr_schedule
from .step import (
    create_train_state,
    make_optimizer,
    make_single_device_train_step,
    make_train_step,
)


@dataclasses.dataclass
class TrainConfig:
    epochs: int = 100
    lr: float = 0.05
    lr_scheduler: str = "poly"
    min_lr: Optional[float] = None
    momentum: float = 0.9
    nesterov: bool = True
    weight_decay: float = 4e-5
    eval_interval: int = 10
    use_balanced_weights: bool = False
    run_dir: str = "run"
    dataset: str = "synthetic"
    checkname: str = "add"
    data_parallel: bool = True
    # 'auto' = newest committed checkpoint for this run_dir/dataset/checkname
    # (preemption recovery); or an explicit checkpoint directory path
    # (reference --resume, train.py:184-210)
    resume: Optional[str] = None
    # load weights only, restart schedule from epoch 0 (reference --ft,
    # train.py:212-214)
    ft: bool = False
    # ON-DEVICE augmentation (data/device_transforms.py): the loader yields
    # decode-only uint8 batches ({"image_u8", "label_u8"}); one jitted XLA
    # program does flip/scale/crop/normalize on the TPU. Requires crop_size
    # (the augmented shape — the raw batch shape is the source canvas).
    device_augment: bool = False
    crop_size: Optional[tuple] = None


class Trainer:
    def __init__(
        self,
        model,
        train_loader,
        val_loader,
        config: TrainConfig,
        class_weight: Optional[np.ndarray] = None,
        sample_input: Optional[np.ndarray] = None,
        seed: int = 0,
    ):
        self.model = model
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.config = config
        self.best_pred = 0.0

        iters_per_epoch = max(len(train_loader), 1)
        schedule = lr_schedule(
            config.lr_scheduler,
            config.lr,
            config.epochs,
            iters_per_epoch,
            min_lr=config.min_lr,
        )
        self.tx = make_optimizer(
            schedule,
            momentum=config.momentum,
            nesterov=config.nesterov,
            weight_decay=config.weight_decay,
        )

        self._augment = None  # built lazily from the first raw batch
        self._seed = seed
        if config.device_augment and config.crop_size is None:
            raise ValueError(
                "device_augment=True requires crop_size (the augmented "
                "shape; raw uint8 batches carry the source canvas shape)"
            )
        if sample_input is None:
            if config.device_augment:
                sample_input = np.zeros(
                    (1, *config.crop_size, 3), np.float32
                )
            else:
                from ..data.loader import peek_batch

                first = peek_batch(train_loader)
                sample_input = first["image"][:1]
        self.state = create_train_state(
            model, jax.random.PRNGKey(seed), jnp.asarray(sample_input), self.tx
        )

        weight = None if class_weight is None else jnp.asarray(class_weight)
        # Mesh width divides the batch size: a wider mesh would drop every
        # batch as a ragged tail (silent no-op run).
        mesh = (
            make_data_mesh(train_loader.batch_size)
            if config.data_parallel and jax.device_count() > 1
            else None
        )
        if mesh is not None:
            self.mesh = mesh
            self.train_step = make_train_step(model, self.tx, self.mesh, weight)
            self.n_shards = self.mesh.shape["data"]
        else:
            self.mesh = None
            self.train_step = make_single_device_train_step(model, self.tx, weight)
            self.n_shards = 1

        self.start_epoch = 0
        self._evaluation = None  # built lazily, reused across validations
        if config.resume:
            self._resume(config.resume, ft=config.ft)

        self.saver = Saver(config.run_dir, config.dataset, config.checkname)
        self.saver.save_experiment_config(dataclasses.asdict(config))
        self.summary = TrainingSummary(self.saver.experiment_dir)

    def _resume(self, resume: str, ft: bool = False):
        """Restore params/BN-stats/optimizer/step from a committed checkpoint
        ('auto' discovers the newest one — preemption-safe recovery). With
        ``ft`` only the weights are kept and the schedule restarts."""
        path = resume
        if resume == "auto":
            path = find_latest_checkpoint(
                self.config.run_dir, self.config.dataset, self.config.checkname
            )
            if path is None:
                return  # cold start: nothing committed yet
        target = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        restored, meta = restore_checkpoint(path, target)
        if ft:
            self.state = self.state.replace(
                params=restored["params"], batch_stats=restored["batch_stats"]
            )
        else:
            self.state = self.state.replace(**restored)
            self.start_epoch = int(meta.get("epoch", -1)) + 1
            self.best_pred = float(meta.get("best_pred", 0.0))

    def _device_augment(self, batch, epoch: int, b: int):
        """Raw uint8 batch → augmented device batch via ONE jitted program.
        Per-sample rngs are seeded like the host loader's fetch streams, so
        augmentation draws are deterministic per (seed, epoch, batch)."""
        from ..data.device_transforms import augment_batch, make_train_augment

        src_hw = batch["image_u8"].shape[1:3]
        if self._augment is None:
            self._augment = make_train_augment(src_hw, self.config.crop_size)
        base = self._seed * 7919 + epoch * 613
        rngs = [
            np.random.RandomState(base + b * 127 + k)
            for k in range(batch["image_u8"].shape[0])
        ]
        image, label = augment_batch(
            self._augment, batch["image_u8"], batch["label_u8"],
            src_hw, self.config.crop_size, rngs=rngs,
        )
        return {"image": image, "label": label}

    def training(self, epoch: int) -> float:
        self.train_loader.set_epoch(epoch)
        losses = []
        for b, batch in enumerate(self.train_loader):
            key = "image_u8" if "image_u8" in batch else "image"
            if batch[key].shape[0] % self.n_shards:
                continue  # drop ragged tail under sharding
            if self.config.device_augment and "image_u8" in batch:
                fed = self._device_augment(batch, epoch, b)
            else:
                fed = {
                    "image": jnp.asarray(batch["image"]),
                    "label": jnp.asarray(batch["label"]),
                }
            self.state, metrics = self.train_step(self.state, fed)
            losses.append(metrics["loss"])
        train_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
        self.summary.add_scalar("train/total_loss_epoch", train_loss, epoch)
        return train_loss

    def validation(self, epoch: int) -> dict:
        variables = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
        }
        if self._evaluation is None:
            # Built once; later epochs swap weights in and reuse the compiled
            # programs (compiles are minutes on a relay).
            self._evaluation = Evaluation(
                self.model, variables, num_classes=self.model.num_classes
            )
        else:
            self._evaluation.update_variables(variables)
        result = self._evaluation.validate(self.val_loader)
        for k, miou in enumerate(result["miou"]):
            self.summary.add_scalar(f"val/mIoU_exit_{k}", miou, epoch)
            self.summary.add_scalar(
                f"val/confidence_exit_{k}", result["confidence"][k], epoch
            )
        mean_miou = float(np.mean(result["miou"]))
        is_best = mean_miou > self.best_pred
        if is_best:
            self.best_pred = mean_miou
        self.saver.save_checkpoint(
            {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": self.state.opt_state,
                "step": self.state.step,
            },
            is_best,
            epoch,
            self.best_pred,
        )
        return result

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
