"""RayIoU / DDA ray marching tests against brute-force oracles."""
import numpy as np
import jax.numpy as jnp
import pytest

from dhd_tpu.eval.rayiou import (
    FREE_ID, calc_rayiou, generate_lidar_rays, process_one_sample,
    ray_march, rayiou_from_outputs, scene_origins)


def test_generate_lidar_rays():
    rays = generate_lidar_rays()
    assert rays.shape[1] == 3 and rays.shape[0] % 360 == 0
    np.testing.assert_allclose(np.linalg.norm(rays, axis=1), 1.0, atol=1e-5)


def test_ray_march_axis_aligned_hit():
    occ = np.zeros((20, 20, 8), np.float32)
    occ[15, 10, 4] = 1.0
    origin = jnp.asarray([2.5, 10.5, 4.5])
    endpts = jnp.asarray([[19.5, 10.5, 4.5]])   # straight +x ray
    dist, coord = ray_march(jnp.asarray(occ), origin, endpts, 64)
    # first-hit voxel x=15; exit distance = 16 - 2.5 = 13.5 voxel units
    assert np.allclose(np.asarray(dist)[0], 13.5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(coord)[0], [15, 10, 4])


def test_ray_march_no_hit_falls_back_to_exit():
    occ = np.zeros((20, 20, 8), np.float32)
    origin = jnp.asarray([2.5, 10.5, 4.5])
    endpts = jnp.asarray([[19.5, 10.5, 4.5]])
    dist, coord = ray_march(jnp.asarray(occ), origin, endpts, 64)
    # exits at x=20 -> distance 17.5; last voxel x=19
    assert np.allclose(np.asarray(dist)[0], 17.5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(coord)[0], [19, 10, 4])


def test_ray_march_diagonal_matches_bruteforce():
    rng = np.random.default_rng(0)
    occ = (rng.random((16, 16, 8)) < 0.05).astype(np.float32)
    origin = np.array([8.3, 7.7, 3.2], np.float32)
    dirs = rng.normal(0, 1, (32, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    endpts = origin + dirs * 5.0
    dist, coord = ray_march(jnp.asarray(occ), jnp.asarray(origin),
                            jnp.asarray(endpts), 64)
    dist, coord = np.asarray(dist), np.asarray(coord)
    # brute force: tiny-step sampling along each ray
    for r in range(32):
        t = 0.0
        hit = None
        for t in np.arange(0.0, 40.0, 0.002):
            p = origin + dirs[r] * t
            v = np.floor(p).astype(int)
            if np.any(v < 0) or np.any(v >= [16, 16, 8]):
                if t > 1.0:
                    break
                continue
            if occ[v[0], v[1], v[2]] > 0.5:
                hit = v
                break
        if hit is not None:
            np.testing.assert_array_equal(coord[r], hit)
            # dda distance = exit distance of the hit voxel >= entry distance
            assert dist[r] >= t - 2e-3


def test_process_one_sample_shapes():
    rng = np.random.default_rng(1)
    sem = np.full((200, 200, 16), FREE_ID, np.uint8)
    sem[90:110, 90:110, :4] = 4         # a block of 'car'
    rays = generate_lidar_rays()
    origins = np.array([[0.0, 0.0, 1.8]], np.float32)
    out = process_one_sample(sem, rays, origins)
    assert out.shape == (rays.shape[0], 2)
    assert (out[:, 1] > 0).all()
    # downward rays near origin should hit the car block
    assert (out[:, 0] == 4).sum() > 0


def test_rayiou_perfect_prediction():
    rng = np.random.default_rng(2)
    sem = np.full((200, 200, 16), FREE_ID, np.uint8)
    sem[80:120, 80:120, :3] = 11        # drivable surface slab
    sem[95:105, 95:105, 3:6] = 4
    origins = [np.array([[0.0, 0.0, 1.8]], np.float32)]
    res = rayiou_from_outputs([sem], [sem], origins)
    assert res["RayIoU"] == pytest.approx(1.0)


def test_rayiou_wrong_prediction_lower():
    sem_gt = np.full((200, 200, 16), FREE_ID, np.uint8)
    sem_gt[80:120, 80:120, :3] = 11
    sem_pred = np.full((200, 200, 16), FREE_ID, np.uint8)
    sem_pred[80:120, 80:120, :3] = 14   # wrong class everywhere
    origins = [np.array([[0.0, 0.0, 1.8]], np.float32)]
    res = rayiou_from_outputs([sem_pred], [sem_gt], origins)
    assert res["RayIoU"] < 0.1


def test_init_voxelize():
    from dhd_tpu.eval.rayiou import init_voxelize
    points = jnp.asarray([[[1.5, 2.5, 0.5], [100.0, 0.0, 0.0],
                           [3.0, 3.0, 1.0]]])
    tindex = jnp.asarray([[0.0, 0.0, -1.0]])     # last is padded
    occ = np.asarray(init_voxelize(points, tindex, (1, 1, 2, 4, 4)))
    assert occ[0, 0, 0, 2, 1] == 1.0             # (z=0, y=2, x=1)
    assert occ.sum() == 1.0                      # oob + padded dropped


def test_scene_origins():
    infos = []
    for i in range(12):
        infos.append({
            "token": f"t{i}", "scene_token": "s0",
            "ego2global_rotation": [1.0, 0, 0, 0],
            "ego2global_translation": [float(i * 5), 0.0, 0.0],
            "lidar2ego_rotation": [1.0, 0, 0, 0],
            "lidar2ego_translation": [0.0, 0.0, 1.8],
        })
    org = scene_origins(infos, 5)
    assert org.shape[1] == 3
    assert org.shape[0] <= 8
    assert (np.abs(org[:, 0]) < 39).all()
    # the reference sample itself maps to the lidar2ego translation
    assert any(np.allclose(o, [0, 0, 1.8], atol=1e-5) for o in org)
