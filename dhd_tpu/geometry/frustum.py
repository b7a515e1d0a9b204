"""Camera frustum geometry: pixel+depth -> ego-frame 3D points.

Pure-jnp re-derivation of the LSS geometry chain used by the reference MGHS
view transformer (projects/mmdet3d_plugin/models/necks/lss_heightmap.py:105-231)
and the key-ego alignment (detectors/bevdet.py:60-78).  Everything is batched
with plain broadcasting and is jit/vmap friendly (static shapes only).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dhd_tpu.config import GridConfig


def create_frustum(depth: GridConfig, input_size: Tuple[int, int],
                   downsample: int, sid: bool = False) -> jnp.ndarray:
    """Build the (D, fH, fW, 3) frustum template of (u, v, d) triples.

    u spans [0, W_in-1] over fW columns, v spans [0, H_in-1] over fH rows, and
    d walks the depth bins (lss_heightmap.py:105-134).  With ``sid`` the depth
    spacing is log-uniform instead.
    """
    h_in, w_in = input_size
    fh, fw = h_in // downsample, w_in // downsample
    d = np.arange(depth.lower, depth.upper, depth.interval, dtype=np.float32)
    num_d = d.shape[0]
    if sid:
        idx = np.arange(num_d, dtype=np.float32)
        d = np.exp(np.log(depth.lower) + idx / (num_d - 1)
                   * np.log((depth.upper - 1.0) / depth.lower))
    u = np.linspace(0.0, w_in - 1.0, fw, dtype=np.float32)
    v = np.linspace(0.0, h_in - 1.0, fh, dtype=np.float32)
    grid = np.stack(
        [
            np.broadcast_to(u[None, None, :], (num_d, fh, fw)),
            np.broadcast_to(v[None, :, None], (num_d, fh, fw)),
            np.broadcast_to(d[:, None, None], (num_d, fh, fw)),
        ],
        axis=-1,
    )
    return jnp.asarray(grid)


def frustum_to_ego(frustum: jnp.ndarray,
                   sensor2ego: jnp.ndarray,
                   intrins: jnp.ndarray,
                   post_rots: jnp.ndarray,
                   post_trans: jnp.ndarray,
                   bda: jnp.ndarray) -> jnp.ndarray:
    """Map frustum (u, v, d) points to ego-frame xyz.

    Mirrors MGHS.get_ego_coor (lss_heightmap.py:179-231):
    1. undo image augmentation: p = post_rot^-1 (frustum - post_tran)
    2. (u, v, d) -> (du, dv, d), apply R_s2e @ K^-1, add t_s2e
    3. apply the BEV-augmentation rotation bda.

    Args:
      frustum: (D, fH, fW, 3)
      sensor2ego: (B, N, 4, 4) camera->ego (already key-ego aligned)
      intrins: (B, N, 3, 3)
      post_rots: (B, N, 3, 3); post_trans: (B, N, 3)
      bda: (B, 3, 3)
    Returns:
      (B, N, D, fH, fW, 3) ego-frame coordinates.
    """
    b, n = sensor2ego.shape[:2]
    pts = frustum[None, None] - post_trans[:, :, None, None, None, :]
    inv_post = jnp.linalg.inv(post_rots)
    pts = jnp.einsum("bnij,bndhwj->bndhwi", inv_post, pts,
                     precision=jax.lax.Precision.HIGHEST)
    pts = jnp.concatenate(
        [pts[..., :2] * pts[..., 2:3], pts[..., 2:3]], axis=-1)
    combine = jnp.einsum(
        "bnij,bnjk->bnik", sensor2ego[:, :, :3, :3], jnp.linalg.inv(intrins),
        precision=jax.lax.Precision.HIGHEST)
    pts = jnp.einsum("bnij,bndhwj->bndhwi", combine, pts,
                     precision=jax.lax.Precision.HIGHEST)
    pts = pts + sensor2ego[:, :, None, None, None, :3, 3]
    pts = jnp.einsum("bij,bndhwj->bndhwi", bda, pts,
                     precision=jax.lax.Precision.HIGHEST)
    return pts


def sensor2keyego(sensor2egos: jnp.ndarray,
                  ego2globals: jnp.ndarray) -> jnp.ndarray:
    """Align every view's camera->ego transform to the first view's ego frame.

    sensor2keyego = (keyego2global)^-1 @ ego2global @ sensor2ego, computed in
    float64 like the reference (bevdet.py:60-78) to avoid precision loss in
    the global-frame round trip.

    Args:
      sensor2egos, ego2globals: (B, N, 4, 4)
    Returns:
      (B, N, 4, 4) float32
    """
    keyego2global = ego2globals[:, :1].astype(jnp.float64)
    global2keyego = jnp.linalg.inv(keyego2global)
    out = jnp.einsum(
        "bnij,bnjk,bnkl->bnil",
        jnp.broadcast_to(global2keyego, ego2globals.shape),
        ego2globals.astype(jnp.float64), sensor2egos.astype(jnp.float64),
        precision=jax.lax.Precision.HIGHEST)
    return out.astype(jnp.float32)


def get_mlp_input(sensor2ego: jnp.ndarray, intrins: jnp.ndarray,
                  post_rots: jnp.ndarray, post_trans: jnp.ndarray,
                  bda: jnp.ndarray) -> jnp.ndarray:
    """27-dim camera embedding fed to DepthNet/HeightNet SE gates.

    Layout matches MGHS.get_mlp_input (lss_heightmap.py:493-526):
    [fx, fy, cx, cy, pr00, pr01, pt0, pr10, pr11, pt1,
     bda00, bda01, bda10, bda11, bda22, flat(sensor2ego[:3, :4])].

    Args:
      sensor2ego: (B, N, 4, 4); intrins/post_rots: (B, N, 3, 3)
      post_trans: (B, N, 3); bda: (B, 3, 3)
    Returns:
      (B, N, 27)
    """
    b, n = sensor2ego.shape[:2]
    bda_n = jnp.broadcast_to(bda[:, None], (b, n, 3, 3))
    feats = jnp.stack([
        intrins[:, :, 0, 0], intrins[:, :, 1, 1],
        intrins[:, :, 0, 2], intrins[:, :, 1, 2],
        post_rots[:, :, 0, 0], post_rots[:, :, 0, 1], post_trans[:, :, 0],
        post_rots[:, :, 1, 0], post_rots[:, :, 1, 1], post_trans[:, :, 1],
        bda_n[:, :, 0, 0], bda_n[:, :, 0, 1],
        bda_n[:, :, 1, 0], bda_n[:, :, 1, 1], bda_n[:, :, 2, 2],
    ], axis=-1)
    s2e = sensor2ego[:, :, :3, :].reshape(b, n, 12)
    return jnp.concatenate([feats, s2e], axis=-1)
