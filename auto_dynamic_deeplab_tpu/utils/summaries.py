"""Training observability — equivalent of utils/summaries.py (tensorboardX).

Falls back to a JSONL scalar log when no TensorBoard writer is available
(tensorboardX is not in this image); the API mirrors the reference's usage
so drivers are writer-agnostic.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np

try:  # torch ships a TB writer; optional
    from torch.utils.tensorboard import SummaryWriter  # type: ignore

    _HAS_TB = True
except Exception:  # pragma: no cover
    SummaryWriter = None
    _HAS_TB = False

from ..data.utils import decode_segmap


class TrainingSummary:
    def __init__(self, directory: str, use_tensorboard: bool = True):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        self.tb = (
            SummaryWriter(log_dir=directory) if (_HAS_TB and use_tensorboard) else None
        )
        self._jsonl = open(os.path.join(directory, "scalars.jsonl"), "a")

    def add_scalar(self, tag: str, value: float, step: int):
        if self.tb is not None:
            self.tb.add_scalar(tag, value, step)
        self._jsonl.write(
            json.dumps(
                {"t": time.time(), "tag": tag, "value": float(value), "step": int(step)}
            )
            + "\n"
        )
        self._jsonl.flush()

    def visualize_image(
        self,
        image: np.ndarray,
        target: np.ndarray,
        pred: np.ndarray,
        step: int,
        dataset: str = "cityscapes",
        max_images: int = 3,
    ):
        """Image / prediction / ground-truth grids (summaries.py:15-23)."""
        if self.tb is None:
            return
        img = np.asarray(image[:max_images])
        img = (img - img.min()) / max(img.max() - img.min(), 1e-6)
        self.tb.add_images("image", np.transpose(img, (0, 3, 1, 2)), step)
        pr = np.stack([decode_segmap(p, dataset) for p in np.asarray(pred[:max_images])])
        gt = np.stack(
            [decode_segmap(t, dataset) for t in np.asarray(target[:max_images])]
        )
        self.tb.add_images("pred", np.transpose(pr, (0, 3, 1, 2)), step)
        self.tb.add_images("gt", np.transpose(gt, (0, 3, 1, 2)), step)

    def close(self):
        if self.tb is not None:
            self.tb.close()
        self._jsonl.close()
