"""Multi-device data-parallel training on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__
from dhd_tpu.eval import MIoUMetric, confusion_matrix, miou_from_confusion


def test_has_8_devices():
    assert jax.device_count() >= 8


@pytest.mark.slow
def test_dryrun_multichip_8():
    __graft_entry__.dryrun_multichip(8)


def test_miou_metric():
    rng = np.random.default_rng(0)
    gt = rng.integers(0, 18, (2, 8, 8, 4))
    pred = gt.copy()
    flip = rng.random(pred.shape) < 0.3
    pred = np.where(flip, rng.integers(0, 18, pred.shape), pred)
    mask = (rng.random(pred.shape) < 0.7).astype(np.int32)

    metric = MIoUMetric()
    metric.add_batch(pred, gt, mask)
    miou, per_class = metric.compute()

    # numpy oracle
    cm = np.zeros((18, 18))
    sel = mask.astype(bool)
    for g, p in zip(gt[sel].ravel(), pred[sel].ravel()):
        cm[g, p] += 1
    diag = np.diag(cm)
    iou = diag / (cm.sum(0) + cm.sum(1) - diag)
    expect = np.nanmean(iou[:17])
    assert np.isclose(miou, expect)
    assert "===> mIoU" in metric.summary()


def test_miou_perfect_prediction():
    gt = np.tile(np.arange(18), 10).reshape(1, -1)
    metric = MIoUMetric()
    metric.add_batch(gt, gt, np.ones_like(gt))
    miou, _ = metric.compute()
    assert np.isclose(miou, 1.0)
