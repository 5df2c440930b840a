"""Segmentation metrics — jitted confusion-matrix accumulation on device.

Equivalent of utils/metrics.py Evaluator (:4-52): a running num_class²
confusion matrix with mIoU / pixel-accuracy / FWIoU reductions (nan-mean over
absent classes). The per-batch update is a single jitted scatter-add that
stays on device; only the final small matrix is fetched.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnums=(2,))
def confusion_matrix_update(
    gt: jnp.ndarray, pred: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """Confusion counts for one batch. gt/pred: int arrays of equal shape;
    pixels with gt outside [0, num_classes) (e.g. ignore=255) are dropped.

    Computed as onehot(gt)^T @ onehot(pred) on the MXU rather than a
    scatter-add: XLA lowers large-index scatters to serialized updates on
    TPU, while the one-hot contraction is one matmul over the pixel axis
    (counts are exact: 0/1 operands, f32 accumulation)."""
    gt = gt.reshape(-1).astype(jnp.int32)
    pred = pred.reshape(-1).astype(jnp.int32)
    valid = (gt >= 0) & (gt < num_classes)
    classes = jnp.arange(num_classes, dtype=jnp.int32)
    gt_oh = ((gt[:, None] == classes) & valid[:, None]).astype(jnp.bfloat16)
    pred_oh = (pred[:, None] == classes).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        gt_oh, pred_oh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _nanmean(x: np.ndarray) -> float:
    return float(np.nanmean(x)) if np.any(~np.isnan(x)) else float("nan")


class Evaluator:
    """Running confusion-matrix evaluator (API parity with utils/metrics.py)."""

    def __init__(self, num_class: int):
        self.num_class = num_class
        self.reset()

    def reset(self):
        self.confusion_matrix = jnp.zeros(
            (self.num_class, self.num_class), jnp.float32
        )

    def add_batch(self, gt_image, pre_image):
        assert gt_image.shape == pre_image.shape
        self.confusion_matrix = self.confusion_matrix + confusion_matrix_update(
            jnp.asarray(gt_image), jnp.asarray(pre_image), self.num_class
        )

    def _cm(self) -> np.ndarray:
        return np.asarray(self.confusion_matrix, np.float64)

    def Pixel_Accuracy(self) -> float:
        cm = self._cm()
        return float(np.diag(cm).sum() / cm.sum())

    def Pixel_Accuracy_Class(self) -> float:
        cm = self._cm()
        with np.errstate(divide="ignore", invalid="ignore"):
            acc = np.diag(cm) / cm.sum(axis=1)
        return _nanmean(acc)

    def Mean_Intersection_over_Union(self) -> float:
        cm = self._cm()
        with np.errstate(divide="ignore", invalid="ignore"):
            iou = np.diag(cm) / (cm.sum(axis=1) + cm.sum(axis=0) - np.diag(cm))
        return _nanmean(iou)

    def Frequency_Weighted_Intersection_over_Union(self) -> float:
        cm = self._cm()
        freq = cm.sum(axis=1) / cm.sum()
        with np.errstate(divide="ignore", invalid="ignore"):
            iou = np.diag(cm) / (cm.sum(axis=1) + cm.sum(axis=0) - np.diag(cm))
        return float((freq[freq > 0] * iou[freq > 0]).sum())
