"""Experiment checkpointing — equivalent of utils/saver.py.

Same run-directory contract as the reference (run/{dataset}/{checkname}/
experiment_N auto-increment, cross-experiment best tracking via
best_pred.txt, parameters.txt config dump) with orbax-backed pytree
checkpoints instead of torch .pth.tar, plus the searched-architecture .npy
artifacts (network_path/betas/genotype) kept format-compatible.
"""
from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Optional

import numpy as np
import orbax.checkpoint as ocp


def find_latest_checkpoint(
    directory_root: str,
    dataset: str,
    checkname: str,
    filename: str = "checkpoint",
) -> Optional[str]:
    """Newest experiment dir under run/{dataset}/{checkname} that holds a
    committed ``filename`` checkpoint — the preemption/auto-resume discovery
    path (the reference only supports an explicit --resume file,
    train.py:184-190)."""
    directory = os.path.join(directory_root, dataset, checkname)
    runs = glob.glob(os.path.join(directory, "experiment_*"))
    for run in sorted(runs, key=lambda r: int(r.split("_")[-1]), reverse=True):
        path = os.path.join(run, filename)
        if os.path.isdir(path) and os.path.exists(path + ".meta.json"):
            return os.path.abspath(path)
    return None


def restore_checkpoint(path: str, target: Any):
    """Restore a pytree checkpoint saved by Saver into ``target``'s
    structure; returns (restored, meta)."""
    restored = ocp.StandardCheckpointer().restore(os.path.abspath(path), target)
    meta_path = path + ".meta.json"
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return restored, meta


class Saver:
    def __init__(self, directory_root: str, dataset: str, checkname: str):
        self.directory = os.path.join(directory_root, dataset, checkname)
        runs = sorted(glob.glob(os.path.join(self.directory, "experiment_*")))
        run_id = max((int(r.split("_")[-1]) for r in runs), default=-1) + 1
        self.experiment_dir = os.path.join(self.directory, f"experiment_{run_id}")
        os.makedirs(self.experiment_dir, exist_ok=True)
        self.runs = runs
        self._ckpt = ocp.StandardCheckpointer()

    def _wait(self):
        # block on orbax's async commit — otherwise background futures race
        # interpreter shutdown ("cannot schedule new futures ...")
        if hasattr(self._ckpt, "wait_until_finished"):
            self._ckpt.wait_until_finished()

    # ------------------------------------------------------------- pytrees

    def _ckpt_path(self, filename: str) -> str:
        return os.path.abspath(os.path.join(self.experiment_dir, filename))

    def save_checkpoint(
        self,
        state: Any,
        is_best: bool,
        epoch: int,
        best_pred: float,
        filename: str = "checkpoint",
    ):
        """Persist {epoch, state, best_pred}; promote to best_model when
        is_best, tracking the cross-experiment best in best_pred.txt
        (saver.py:22-45)."""
        path = self._ckpt_path(filename)
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        self._ckpt.save(path, state)
        self._wait()
        meta = {"epoch": epoch, "best_pred": best_pred}
        with open(os.path.join(self.experiment_dir, filename + ".meta.json"), "w") as f:
            json.dump(meta, f)

        if is_best:
            with open(os.path.join(self.experiment_dir, "best_pred.txt"), "w") as f:
                f.write(str(best_pred))
            previous = [0.0]
            for run in self.runs:
                p = os.path.join(run, "best_pred.txt")
                if os.path.exists(p):
                    with open(p) as f:
                        previous.append(float(f.read()))
            if best_pred > max(previous):
                best = self._ckpt_path("best_model")
                if os.path.exists(best):
                    import shutil

                    shutil.rmtree(best)
                self._ckpt.save(best, state)
                self._wait()

    def load_checkpoint(self, target: Any, filename: str = "checkpoint"):
        """Restore a pytree of the same structure as ``target``."""
        restored = self._ckpt.restore(self._ckpt_path(filename), target)
        meta_path = os.path.join(self.experiment_dir, filename + ".meta.json")
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        return restored, meta

    # ---------------------------------------------------------- arch + cfg

    def save_architecture(
        self,
        epoch: int,
        network_path: np.ndarray,
        betas: Optional[np.ndarray] = None,
        genotype: Optional[np.ndarray] = None,
    ):
        """Persist the decoded architecture per epoch (search.py:296-327)."""
        d = os.path.join(self.experiment_dir, f"arch_epoch_{epoch}")
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, "network_path.npy"), np.asarray(network_path))
        if betas is not None:
            np.save(os.path.join(d, "betas.npy"), np.asarray(betas))
        if genotype is not None:
            np.save(os.path.join(d, "genotype.npy"), np.asarray(genotype))
        return d

    def save_experiment_config(self, config: Dict[str, Any]):
        with open(os.path.join(self.experiment_dir, "parameters.txt"), "w") as f:
            for k, v in sorted(config.items()):
                f.write(f"{k}: {v}\n")
