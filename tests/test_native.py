"""Native C++ data kernels vs numpy fallback / python pipeline oracles."""
import numpy as np
import pytest

from dhd_tpu.native import get_lib, normalize_images, project_cameras
from dhd_tpu.data.pipeline import IMG_MEAN, IMG_STD


def test_native_lib_builds():
    assert get_lib() is not None, "g++ build of dhd_native.so failed"


def test_normalize_matches_numpy():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 8, 12, 3), dtype=np.uint8).astype(np.uint8)
    out = normalize_images(imgs, IMG_MEAN, IMG_STD)
    ref = (imgs[..., ::-1].astype(np.float32) - IMG_MEAN) / IMG_STD
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_project_cameras_matches_python_pipeline():
    rng = np.random.default_rng(1)
    n_pts, n_cams, h, w = 2000, 3, 64, 96
    points = rng.uniform(-30, 30, (n_pts, 3)).astype(np.float32)
    points[:, 2] = rng.uniform(-2, 4, n_pts)

    lidar2ego = np.eye(4, dtype=np.float32)
    lidar2ego[2, 3] = 1.8
    lidar2img = np.zeros((n_cams, 4, 4), np.float32)
    for c in range(n_cams):
        th = 2 * np.pi * c / n_cams
        f = np.array([np.cos(th), np.sin(th), 0.0])
        up = np.array([0, 0, 1.0])
        right = np.cross(f, up)
        down = np.cross(f, right)
        r = np.stack([right, down, f], 0)      # world->cam rows
        k = np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]])
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = k @ r
        lidar2img[c] = m
    post_rot = np.tile(np.eye(3, dtype=np.float32), (n_cams, 1, 1))
    post_rot[:, 0, 0] = 0.9
    post_tran = np.zeros((n_cams, 3), np.float32)
    post_tran[:, 1] = 2.0

    d_nat, h_nat = project_cameras(points, lidar2img, lidar2ego, post_rot,
                                   post_tran, (h, w), (1.0, 45.0))

    # force the numpy fallback path as the oracle
    import dhd_tpu.native as nat
    lib_backup = nat._lib
    nat._lib, nat._tried = None, True
    try:
        d_ref, h_ref = project_cameras(points, lidar2img, lidar2ego,
                                       post_rot, post_tran, (h, w),
                                       (1.0, 45.0))
    finally:
        nat._lib, nat._tried = lib_backup, True

    assert (d_ref > 0).sum() > 50      # the fixture actually projects points
    # identical nonzero sets and values (modulo fp tie-breaks)
    mism = np.abs(d_nat - d_ref) > 1e-3
    assert mism.mean() < 0.002
    mismh = np.abs(h_nat - h_ref) > 1e-3
    assert mismh.mean() < 0.002


def test_native_projection_speed():
    rng = np.random.default_rng(2)
    points = rng.uniform(-40, 40, (35000, 3)).astype(np.float32)
    lidar2img = np.tile(np.eye(4, dtype=np.float32), (6, 1, 1))
    lidar2img[:, 0, 0] = 300.0
    lidar2ego = np.eye(4, dtype=np.float32)
    post_rot = np.tile(np.eye(3, dtype=np.float32), (6, 1, 1))
    post_tran = np.zeros((6, 3), np.float32)
    import time
    t0 = time.perf_counter()
    for _ in range(5):
        project_cameras(points, lidar2img, lidar2ego, post_rot, post_tran,
                        (256, 704), (1.0, 45.0))
    dt = (time.perf_counter() - t0) / 5
    # full 6-cam nuScenes projection should be well under 50 ms natively
    assert dt < 0.25, f"native projection too slow: {dt * 1e3:.1f} ms"
