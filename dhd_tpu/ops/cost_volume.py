"""Stereo matching cost volume (model_utils/depthnet.py:249-361).

For every stereo-resolution pixel and depth bin, reproject into the previous
frame's camera (via k2s_sensor), bilinearly sample the previous stereo
features, and accumulate the per-channel absolute difference against the
current features.  cost -> softmax(-cost) over depth.  Channels are processed
in chunks with lax.scan to bound memory (the reference loops groups of 4 for
the same reason); the result is treated as a constant (stop_gradient), like
the reference's @no_grad.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .warp import grid_sample_2d


def stereo_reproject_grid(frustum: jnp.ndarray, k2s_sensor: jnp.ndarray,
                          intrins: jnp.ndarray, post_rots: jnp.ndarray,
                          post_trans: jnp.ndarray, img_h: int, img_w: int
                          ) -> jnp.ndarray:
    """Normalized sampling grid mapping current pixels+depth to prev pixels.

    Mirrors DepthNet.gen_grid (depthnet.py:249-308).  Returns
    (B, N, D, Hs, Ws, 2) in [-1, 1], with invalid (behind-camera) points at -2.
    """
    hp = jax.lax.Precision.HIGHEST
    b, n = k2s_sensor.shape[:2]
    pts = frustum[None, None] - post_trans[:, :, None, None, None, :]
    pts = jnp.einsum("bnij,bndhwj->bndhwi", jnp.linalg.inv(post_rots), pts,
                     precision=hp)
    pts = jnp.concatenate([pts[..., :2] * pts[..., 2:3], pts[..., 2:3]],
                          axis=-1)
    rots = k2s_sensor[:, :, :3, :3]
    trans = k2s_sensor[:, :, :3, 3]
    combine = jnp.einsum("bnij,bnjk->bnik", rots, jnp.linalg.inv(intrins),
                         precision=hp)
    pts = jnp.einsum("bnij,bndhwj->bndhwi", combine, pts, precision=hp)
    pts = pts + trans[:, :, None, None, None, :]
    neg = pts[..., 2] < 1e-3
    pts = jnp.einsum("bnij,bndhwj->bndhwi", intrins, pts, precision=hp)
    uv = pts[..., :2] / pts[..., 2:3]
    uv = jnp.einsum("bnij,bndhwj->bndhwi",
                    post_rots[:, :, :2, :2], uv, precision=hp)
    uv = uv + post_trans[:, :, None, None, None, :2]
    px = uv[..., 0] / (img_w - 1.0) * 2.0 - 1.0
    py = uv[..., 1] / (img_h - 1.0) * 2.0 - 1.0
    px = jnp.where(neg, -2.0, px)
    py = jnp.where(neg, -2.0, py)
    return jnp.stack([px, py], axis=-1)


def stereo_cost_volume(prev_feat: jnp.ndarray, curr_feat: jnp.ndarray,
                       frustum: jnp.ndarray, k2s_sensor: jnp.ndarray,
                       intrins: jnp.ndarray, post_rots: jnp.ndarray,
                       post_trans: jnp.ndarray, bias: float = 0.0,
                       group_size: int = 4) -> jnp.ndarray:
    """Softmaxed depth probability volume from two stereo feature maps.

    Args:
      prev_feat, curr_feat: (B, N, Hs, Ws, C) stride-4 stereo features.
      frustum: (D, Hs, Ws, 3) stereo-resolution frustum (cv_frustum).
      k2s_sensor: (B, N, 4, 4) current -> previous camera transform.
      intrins/post_rots: (B, N, 3, 3); post_trans: (B, N, 3).
      bias: added to the cost of invalid samples (5.0 for DHD-M/L).
    Returns:
      (B, N, D, Hs, Ws) cost-volume probabilities (stop-gradient).
    """
    b, n, hs, ws, c = curr_feat.shape
    d = frustum.shape[0]
    img_h, img_w = hs * 4, ws * 4
    grid = stereo_reproject_grid(frustum, k2s_sensor, intrins, post_rots,
                                 post_trans, img_h, img_w)
    grid = grid.reshape(b * n, d * hs, ws, 2)
    prev = prev_feat.reshape(b * n, hs, ws, c)
    curr = curr_feat.reshape(b * n, hs, ws, c)

    n_groups = c // group_size
    prev_g = jnp.moveaxis(
        prev.reshape(b * n, hs, ws, n_groups, group_size), 3, 0)
    curr_g = jnp.moveaxis(
        curr.reshape(b * n, hs, ws, n_groups, group_size), 3, 0)

    # first group also yields the invalid mask (channel 0 of the warp == 0,
    # depthnet.py:354-356)
    warp0 = grid_sample_2d(prev_g[0], grid).reshape(
        b * n, d, hs, ws, group_size)
    cost0 = jnp.abs(curr_g[0][:, None] - warp0).sum(-1)
    invalid = warp0[..., 0] == 0

    if n_groups > 1:
        def scan_body(cost, xs):
            pg, cg = xs
            warp = grid_sample_2d(pg, grid).reshape(
                b * n, d, hs, ws, group_size)
            return cost + jnp.abs(cg[:, None] - warp).sum(-1), None
        cost, _ = jax.lax.scan(scan_body, cost0,
                               (prev_g[1:], curr_g[1:]))
    else:
        cost = cost0

    if bias != 0.0:
        cost = jnp.where(invalid, cost + bias, cost)
    prob = jax.nn.softmax(-cost.astype(jnp.float32), axis=1)
    return jax.lax.stop_gradient(prob.reshape(b, n, d, hs, ws))
