"""Occ3D mIoU metric (core/evaluation/occ_metrics.py:52-169).

An 18x18 confusion matrix over camera-visible voxels accumulated on device;
per-class IoU = diag / (row + col - diag); headline mIoU averages classes
0..16 (free excluded).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dhd_tpu.config import OCC_CLASS_NAMES


from functools import partial


@partial(jax.jit, static_argnums=(3,))
def confusion_matrix(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray,
                     num_classes: int = 18) -> jnp.ndarray:
    """(num_classes, num_classes) counts of (gt, pred) pairs over the mask."""
    pred = pred.reshape(-1).astype(jnp.int32)
    gt = gt.reshape(-1).astype(jnp.int32)
    m = mask.reshape(-1).astype(jnp.float32)
    idx = gt * num_classes + pred
    cm = jax.ops.segment_sum(m, idx, num_segments=num_classes * num_classes)
    return cm.reshape(num_classes, num_classes)


def miou_from_confusion(cm: np.ndarray, num_eval_classes: int = 17
                        ) -> Tuple[float, Dict[str, float]]:
    cm = np.asarray(cm, np.float64)
    diag = np.diag(cm)
    denom = cm.sum(0) + cm.sum(1) - diag
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = diag / denom
    per_class = {OCC_CLASS_NAMES[i]: float(iou[i]) for i in range(len(diag))}
    valid = iou[:num_eval_classes]
    miou = float(np.nanmean(valid))
    return miou, per_class


class MIoUMetric:
    """Streaming accumulator mirroring Metric_mIoU(use_image_mask=True)."""

    def __init__(self, num_classes: int = 18, num_eval_classes: int = 17):
        self.num_classes = num_classes
        self.num_eval_classes = num_eval_classes
        self.cm = np.zeros((num_classes, num_classes), np.float64)
        self.count = 0

    def add_batch(self, pred, gt, mask) -> None:
        self.cm += np.asarray(
            confusion_matrix(jnp.asarray(pred), jnp.asarray(gt),
                             jnp.asarray(mask), self.num_classes))
        self.count += int(np.asarray(pred).shape[0])

    def compute(self) -> Tuple[float, Dict[str, float]]:
        return miou_from_confusion(self.cm, self.num_eval_classes)

    def summary(self) -> str:
        miou, per_class = self.compute()
        lines = [f"===> per class IoU of {self.count} samples:"]
        for name in OCC_CLASS_NAMES[:self.num_eval_classes]:
            lines.append(f"===> {name:24s} IoU = {per_class[name]*100:.2f}")
        lines.append(f"===> mIoU: {miou*100:.2f}")
        return "\n".join(lines)
