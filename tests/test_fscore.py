"""FScore metric tests."""
import numpy as np

from dhd_tpu.eval.fscore import FScoreMetric, voxel2points


def test_voxel2points_centers():
    occ = np.full((4, 4, 2), 17, np.uint8)
    occ[0, 0, 0] = 4
    pts = voxel2points(occ)
    assert pts.shape == (1, 3)
    np.testing.assert_allclose(pts[0], [-39.8, -39.8, -0.8])


def test_fscore_perfect():
    rng = np.random.default_rng(0)
    occ = np.where(rng.random((50, 50, 8)) < 0.1,
                   rng.integers(0, 17, (50, 50, 8)), 17).astype(np.uint8)
    mask = np.ones_like(occ)
    m = FScoreMetric()
    m.add_batch(occ, occ, mask, mask)
    f1, acc, cmpl = m.compute()
    assert f1 > 0.999 and acc > 0.999 and cmpl > 0.999


def test_fscore_degrades():
    gt = np.full((50, 50, 8), 17, np.uint8)
    gt[10:20, 10:20, :2] = 4
    pred = np.full((50, 50, 8), 17, np.uint8)
    pred[35:45, 35:45, :2] = 4          # far away -> low score
    mask = np.ones_like(gt)
    m = FScoreMetric()
    m.add_batch(pred, gt, mask, mask)
    f1, acc, cmpl = m.compute()
    assert f1 < 0.1
