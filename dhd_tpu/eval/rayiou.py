"""RayIoU evaluation (core/evaluation/ray_metrics.py + lib/dvr/dvr.cu).

The reference JIT-compiles a CUDA 3D-DDA (Amanatides-Woo) voxel traversal
(dvr.render_forward, dvr.cu:70-311).  Here the traversal is a vectorized
jax.lax.fori_loop over all rays at once — each step advances every ray one
voxel border, records the exit distance of the first occupied voxel, and
freezes once a ray leaves the grid after having been inside.  Everything
else (lidar ray fan, ego-trajectory origins, per-class TP counting at 1/2/4 m)
is a direct numpy re-derivation.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dhd_tpu.config import OCC_CLASS_NAMES
from dhd_tpu.data.nuscenes import pose_to_mat

PC_RANGE = (-40.0, -40.0, -1.0, 40.0, 40.0, 5.4)
VOXEL_SIZE = 0.4
FREE_ID = len(OCC_CLASS_NAMES) - 1


def generate_lidar_rays() -> np.ndarray:
    """nuScenes-like pitch fan x 360 azimuths (ray_metrics.py:56-79)."""
    pitch = []
    for k in range(10):
        pitch.append(-(math.pi / 2 - math.atan(k + 1)))
    while pitch[-1] < 0.21:
        delta = pitch[-1] - pitch[-2]
        pitch.append(pitch[-1] + delta)
    rays = []
    for p in pitch:
        for az_deg in np.arange(0, 360, 1):
            az = np.deg2rad(az_deg)
            rays.append((np.cos(p) * np.cos(az), np.cos(p) * np.sin(az),
                         np.sin(p)))
    return np.array(rays, dtype=np.float32)


@partial(jax.jit, static_argnums=(3,))
def ray_march(occ: jnp.ndarray, origin: jnp.ndarray, endpts: jnp.ndarray,
              max_steps: int = 448) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DDA first-hit along rays through a binary voxel grid.

    Args:
      occ: (X, Y, Z) binary occupancy (1 = occupied).
      origin: (3,) ray origin in voxel units (x, y, z).
      endpts: (M, 3) ray endpoints in voxel units.
      max_steps: traversal budget; 448 covers any ray whose origin lies
        inside the 200x200x16 grid (<= X+Y+Z+slack border crossings).
    Returns:
      dist: (M,) exit distance of the first occupied voxel (voxel units);
        falls back to the last in-grid voxel's exit distance, 0 if the ray
        never enters the grid.
      coord: (M, 3) int32 hit-voxel (x, y, z); last visited voxel when no
        hit, 0 when never inside.
    """
    sizes = jnp.asarray(occ.shape, jnp.int32)
    m = endpts.shape[0]
    ro = origin[None, :]                                     # (1, 3)
    rv = endpts - ro                                         # (M, 3)
    gt_d = jnp.linalg.norm(rv, axis=-1, keepdims=True)
    dirs = rv / gt_d
    step = jnp.where(dirs >= 0, 1, -1).astype(jnp.int32)     # (M, 3)
    v0 = jnp.broadcast_to(ro, (m, 3)).astype(jnp.int32)
    next_bound = v0 + (step > 0).astype(jnp.int32)
    big = jnp.float32(1e30)
    safe = jnp.where(dirs == 0, 1.0, dirs)
    tmax = jnp.where(dirs == 0, big, (next_bound - ro) / safe)
    tdelta = jnp.where(dirs == 0, big, step / safe)

    state = dict(
        v=v0, tmax=tmax,
        found=jnp.zeros((m,), bool),
        was_inside=jnp.zeros((m,), bool),
        done=jnp.zeros((m,), bool),
        hit_d=jnp.zeros((m,), jnp.float32),
        hit_v=jnp.zeros((m, 3), jnp.int32),
        last_d=jnp.zeros((m,), jnp.float32),
        last_v=jnp.zeros((m, 3), jnp.int32),
        any_inside=jnp.zeros((m,), bool),
    )

    def body(_, s):
        v = s["v"]
        inside = jnp.all((v >= 0) & (v < sizes[None, :]), axis=-1)
        was_inside = s["was_inside"] | inside
        done = s["done"] | (s["was_inside"] & ~inside)

        tm = s["tmax"]
        # CUDA tie-break (dvr.cu:209-229): X if tMaxX < tMaxY and < tMaxZ,
        # else Z; or Y if tMaxY < tMaxZ, else Z.
        pick_x = (tm[:, 0] < tm[:, 1]) & (tm[:, 0] < tm[:, 2])
        pick_y = ~(tm[:, 0] < tm[:, 1]) & (tm[:, 1] < tm[:, 2])
        axis = jnp.where(pick_x, 0, jnp.where(pick_y, 1, 2))
        _d = jnp.take_along_axis(tm, axis[:, None], axis=1)[:, 0]
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        new_v = v + step * onehot
        new_tmax = tm + jnp.take_along_axis(
            tdelta, axis[:, None], axis=1) * onehot.astype(tm.dtype)

        vc = jnp.clip(v, 0, sizes[None, :] - 1)
        occ_v = occ[vc[:, 0], vc[:, 1], vc[:, 2]] > 0.5
        active = inside & ~done
        hit_now = active & occ_v & ~s["found"]
        found = s["found"] | hit_now
        hit_d = jnp.where(hit_now, _d.astype(jnp.float32), s["hit_d"])
        hit_v = jnp.where(hit_now[:, None], v, s["hit_v"])
        upd_last = active & ~s["found"]
        last_d = jnp.where(upd_last, _d.astype(jnp.float32), s["last_d"])
        last_v = jnp.where(upd_last[:, None], v, s["last_v"])

        return dict(v=jnp.where(done[:, None], v, new_v),
                    tmax=jnp.where(done[:, None], tm, new_tmax),
                    found=found, was_inside=was_inside, done=done,
                    hit_d=hit_d, hit_v=hit_v, last_d=last_d, last_v=last_v,
                    any_inside=s["any_inside"] | inside)

    s = jax.lax.fori_loop(0, max_steps, body, state)
    dist = jnp.where(s["found"], s["hit_d"], s["last_d"])
    coord = jnp.where(s["found"][:, None], s["hit_v"], s["last_v"])
    dist = jnp.where(s["any_inside"], dist, 0.0)
    coord = jnp.where(s["any_inside"][:, None], coord, 0)
    return dist, coord


def init_voxelize(points: jnp.ndarray, tindex: jnp.ndarray,
                  grid_shape: Tuple[int, int, int, int, int]) -> jnp.ndarray:
    """dvr.init parity (dvr.cu:19-66): mark each ray endpoint's voxel
    occupied.

    points: (N, M, 3) endpoint coords in voxel units (x, y, z);
    tindex: (N, M) time index (< 0 = padded); grid_shape (N, T, Z, Y, X).
    Returns float32 occupancy grid.
    """
    n, t, vz, vy, vx = grid_shape
    occ = jnp.zeros(grid_shape, jnp.float32)
    ts = jnp.clip(tindex.astype(jnp.int32), 0, t - 1)
    if t == 1:
        ts = jnp.zeros_like(ts)
    v = points.astype(jnp.int32)
    valid = ((tindex >= 0)
             & (v[..., 0] >= 0) & (v[..., 0] < vx)
             & (v[..., 1] >= 0) & (v[..., 1] < vy)
             & (v[..., 2] >= 0) & (v[..., 2] < vz))
    bidx = jnp.broadcast_to(
        jnp.arange(n)[:, None], tindex.shape).astype(jnp.int32)
    flat = (((bidx * t + ts) * vz + jnp.clip(v[..., 2], 0, vz - 1)) * vy
            + jnp.clip(v[..., 1], 0, vy - 1)) * vx \
        + jnp.clip(v[..., 0], 0, vx - 1)
    occ = occ.reshape(-1).at[
        jnp.where(valid, flat, 0).reshape(-1)].max(
        valid.reshape(-1).astype(jnp.float32))
    return occ.reshape(grid_shape)


def process_one_sample(sem: np.ndarray, lidar_rays: np.ndarray,
                       origins: np.ndarray,
                       pc_range: Sequence[float] = PC_RANGE,
                       voxel_size: float = VOXEL_SIZE) -> np.ndarray:
    """-> (T*M, 2) of [semantic label at hit voxel, hit distance in meters]
    (ray_metrics.py:82-135).  ``sem`` is a (Dx, Dy, Dz) class grid; the
    reference hard-codes 200x200x16 but any grid consistent with
    ``pc_range``/``voxel_size`` works here."""
    sem = np.asarray(sem)
    occ = jnp.asarray((sem != FREE_ID).astype(np.float32))
    offset = np.asarray(pc_range[:3], np.float32)
    out = []
    for t in range(origins.shape[0]):
        o = origins[t]
        endpts = (lidar_rays + o - offset) / voxel_size
        o_vox = (o - offset) / voxel_size
        dist, coord = ray_march(occ, jnp.asarray(o_vox), jnp.asarray(endpts))
        dist = np.asarray(dist) * voxel_size
        coord = np.asarray(coord)
        labels = sem[coord[:, 0], coord[:, 1], coord[:, 2]]
        out.append(np.stack([labels.astype(np.float32), dist], axis=-1))
    return np.concatenate(out, axis=0)


def scene_origins(data_infos: Sequence[dict], index: int,
                  max_origins: int = 8) -> np.ndarray:
    """Lidar origins along the sample's scene trajectory, in the reference
    sample's (lidar-)ego frame, within +-39 m (ego_pose_dataset.py:56-94)."""
    info = data_infos[index]
    scene = [i for i in data_infos
             if i["scene_token"] == info["scene_token"]]

    def lidar2global(i):
        return pose_to_mat(i["ego2global_rotation"],
                           i["ego2global_translation"]) @ \
            pose_to_mat(i["lidar2ego_rotation"], i["lidar2ego_translation"])

    ref_inv = np.linalg.inv(lidar2global(info))
    ego_from_lidar = pose_to_mat(info["lidar2ego_rotation"],
                                 info["lidar2ego_translation"])
    origins = []
    for cand in scene:
        if cand["token"] == info["token"]:
            o = np.zeros(3, np.float32)
        else:
            o = (ref_inv @ lidar2global(cand))[:3, 3].astype(np.float32)
        o = (ego_from_lidar[:3] @ np.concatenate([o, [1.0]])).astype(
            np.float32)
        if abs(o[0]) < 39 and abs(o[1]) < 39:
            origins.append(o)
    if len(origins) > max_origins:
        sel = np.round(np.linspace(0, len(origins) - 1,
                                   max_origins)).astype(int)
        origins = [origins[i] for i in sel]
    return np.stack(origins)


def calc_rayiou(pcd_pred_list: List[np.ndarray],
                pcd_gt_list: List[np.ndarray]) -> Dict[str, float]:
    """Per-class TP/IoU at 1/2/4 m (ray_metrics.py:138-228)."""
    thresholds = (1.0, 2.0, 4.0)
    n_cls = len(OCC_CLASS_NAMES)
    gt_cnt = np.zeros(n_cls)
    pred_cnt = np.zeros(n_cls)
    tp_cnt = np.zeros((len(thresholds), n_cls))
    for pred, gt in zip(pcd_pred_list, pcd_gt_list):
        valid = gt[:, 0].astype(int) != FREE_ID
        pred, gt = pred[valid], gt[valid]
        l1 = np.abs(pred[:, 1] - gt[:, 1])
        for j, thr in enumerate(thresholds):
            ok = l1 < thr
            for i in range(n_cls):
                mp = pred[:, 0] == i
                mg = gt[:, 0] == i
                if j == 0:
                    gt_cnt[i] += mg.sum()
                    pred_cnt[i] += mp.sum()
                tp_cnt[j, i] += (mp & mg & ok).sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        ious = [(tp_cnt[j] / (gt_cnt + pred_cnt - tp_cnt[j]))[:-1]
                for j in range(len(thresholds))]
    return {
        "RayIoU": float(np.nanmean(ious)),
        "RayIoU@1": float(np.nanmean(ious[0])),
        "RayIoU@2": float(np.nanmean(ious[1])),
        "RayIoU@4": float(np.nanmean(ious[2])),
        "per_class": {OCC_CLASS_NAMES[i]: [float(ious[j][i])
                                           for j in range(3)]
                      for i in range(n_cls - 1)},
    }


def rayiou_from_outputs(sem_pred_list, sem_gt_list, origins_list,
                        pc_range: Sequence[float] = PC_RANGE,
                        voxel_size: float = VOXEL_SIZE) -> Dict[str, float]:
    """Full RayIoU pipeline over a dataset's outputs (ray_metrics.main)."""
    rays = generate_lidar_rays()
    preds, gts = [], []
    for sp, sg, org in zip(sem_pred_list, sem_gt_list, origins_list):
        preds.append(process_one_sample(np.asarray(sp), rays, org,
                                        pc_range, voxel_size))
        gts.append(process_one_sample(np.asarray(sg), rays, org,
                                      pc_range, voxel_size))
    return calc_rayiou(preds, gts)
