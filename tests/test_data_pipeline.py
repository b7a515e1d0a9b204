"""Data layer tests over a synthetic on-disk nuScenes-like fixture."""
import os
import pickle

import numpy as np
import pytest

from dhd_tpu.config import get_config
from dhd_tpu.data.nuscenes import (
    CAM_NAMES, NuScenesOccDataset, pose_to_mat, quat_to_rot)
from dhd_tpu.data.pipeline import (
    SamplePipeline, aug_homography, bda_matrix, collate, normalize_img,
    zbuffer_scatter)


def _write_fixture(root, n_samples=4, n_scenes=2, img_wh=(352, 128)):
    from PIL import Image
    rng = np.random.default_rng(0)
    os.makedirs(f"{root}/imgs", exist_ok=True)
    infos = []
    for i in range(n_samples):
        cams = {}
        for cam in CAM_NAMES:
            p = f"{root}/imgs/{i}_{cam}.png"
            Image.fromarray(
                rng.integers(0, 255, (img_wh[1], img_wh[0], 3),
                             dtype=np.uint8).astype(np.uint8)).save(p)
            cams[cam] = {
                "data_path": p,
                "cam_intrinsic": np.array(
                    [[280.0, 0, img_wh[0] / 2], [0, 280.0, img_wh[1] / 2],
                     [0, 0, 1]], np.float64),
                "sensor2ego_rotation": [1.0, 0, 0, 0],
                "sensor2ego_translation": [1.0, 0.0, 1.5],
                "ego2global_rotation": [1.0, 0, 0, 0],
                "ego2global_translation": [i * 0.5, 0.0, 0.0],
            }
        lidar_path = f"{root}/lidar_{i}.bin"
        pts = rng.uniform(-30, 30, (500, 5)).astype(np.float32)
        pts[:, 2] = rng.uniform(-2, 4, 500)
        pts.tofile(lidar_path)
        occ_dir = f"{root}/gts/{i}"
        os.makedirs(occ_dir, exist_ok=True)
        np.savez(
            f"{occ_dir}/labels.npz",
            semantics=rng.integers(0, 18, (64, 64, 16)).astype(np.uint8),
            mask_lidar=rng.integers(0, 2, (64, 64, 16)).astype(np.uint8),
            mask_camera=rng.integers(0, 2, (64, 64, 16)).astype(np.uint8))
        infos.append({
            "token": f"tok{i}",
            "timestamp": 1_000_000 * i,
            "scene_token": f"scene{i * n_scenes // n_samples}",
            "lidar_path": lidar_path,
            "lidar2ego_rotation": [1.0, 0, 0, 0],
            "lidar2ego_translation": [0.0, 0.0, 1.8],
            "ego2global_rotation": [1.0, 0, 0, 0],
            "ego2global_translation": [i * 0.5, 0.0, 0.0],
            "occ_path": occ_dir,
            "cams": cams,
        })
    pkl = f"{root}/infos.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"infos": infos, "metadata": {"version": "test"}}, f)
    return pkl


def test_quat_to_rot():
    np.testing.assert_allclose(quat_to_rot([1, 0, 0, 0]), np.eye(3))
    # 90 deg about z
    q = [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]
    r = quat_to_rot(q)
    np.testing.assert_allclose(r @ [1, 0, 0], [0, 1, 0], atol=1e-9)


def test_zbuffer_keeps_nearest():
    coor = np.array([[3, 2], [3, 2], [1, 0]], np.float32)
    depth = np.array([10.0, 4.0, 7.0], np.float32)
    out = zbuffer_scatter(coor, depth, depth, 4, 5)
    assert out[2, 3] == 4.0      # nearest of the two colliding points
    assert out[0, 1] == 7.0


def test_aug_homography_identity():
    pr, pt = aug_homography(1.0, (0, 0, 10, 10), False, 0.0)
    np.testing.assert_allclose(pr, np.eye(2), atol=1e-6)
    np.testing.assert_allclose(pt, 0.0, atol=1e-6)


def test_bda_matrix_flips():
    m = bda_matrix(0.0, 1.0, True, False)
    np.testing.assert_allclose(m, np.diag([-1.0, 1.0, 1.0]))


def test_dataset_and_pipeline_single_frame(tmp_path):
    pkl = _write_fixture(str(tmp_path))
    ds = NuScenesOccDataset(pkl)
    assert len(ds) == 4
    cfg = get_config("dhd_tiny")
    pipe = SamplePipeline(cfg, is_train=True, seed=0)
    batch = collate([pipe(ds.get_sample(i)) for i in range(2)])
    h, w = cfg.vt.input_size
    assert batch["imgs"].shape == (2, 6, h, w, 3)
    assert batch["sensor2keyego"].shape == (2, 6, 4, 4)
    assert batch["gt_depth"].shape == (2, 6, h, w)
    assert batch["gt_height"].shape == (2, 6, h, w)
    assert batch["voxel_semantics"].shape == (2, 64, 64, 16)
    # some lidar points should actually land in the depth maps
    assert (batch["gt_depth"] > 0).sum() > 0


def test_dataset_adjacent_scene_clamp(tmp_path):
    pkl = _write_fixture(str(tmp_path))
    ds = NuScenesOccDataset(pkl, num_adj_frames=1, stereo=True)
    s0 = ds.get_sample(0)           # first sample of scene0
    # both adjacent slots clamp to itself (scene boundary)
    assert s0["adjacent"][0]["token"] == "tok0"
    assert s0["adjacent"][1]["token"] == "tok0"
    s3 = ds.get_sample(3)           # scene1 second sample; index-2 is scene0
    assert s3["adjacent"][0]["token"] == "tok2"
    assert s3["adjacent"][1]["token"] == "tok3"   # clamped to curr


def test_pipeline_temporal_layout(tmp_path):
    pkl = _write_fixture(str(tmp_path))
    cfg = get_config("dhd_tiny_stereo")
    ds = NuScenesOccDataset(pkl, num_adj_frames=cfg.num_adj_frames,
                            stereo=cfg.stereo)
    pipe = SamplePipeline(cfg, is_train=False, seed=0)
    batch = collate([pipe(ds.get_sample(2))])
    f = cfg.num_frames
    h, w = cfg.vt.input_size
    assert batch["imgs"].shape == (1, f, 6, h, w, 3)
    assert batch["sensor2ego"].shape == (1, f, 6, 4, 4)
    assert batch["ego2global"].shape == (1, f, 6, 4, 4)


@pytest.mark.slow
def test_pipeline_feeds_model(tmp_path):
    import jax
    import jax.numpy as jnp
    from dhd_tpu.models import build_model

    pkl = _write_fixture(str(tmp_path))
    cfg = get_config("dhd_tiny")
    ds = NuScenesOccDataset(pkl)
    pipe = SamplePipeline(cfg, is_train=False, seed=0)
    batch = {k: jnp.asarray(v)
             for k, v in collate([pipe(ds.get_sample(0))]).items()}
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert np.isfinite(np.asarray(out["occ_logits"])).all()
