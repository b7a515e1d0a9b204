"""Stereo matching cost volume (model_utils/depthnet.py:249-361).

For every stereo-resolution pixel and depth bin, reproject into the previous
frame's camera (via k2s_sensor), bilinearly sample the previous stereo
features, and accumulate the per-channel absolute difference against the
current features.  cost -> softmax(-cost) over depth.

Memory is bounded by chunking the lax.scan over DEPTH BINS with the full
channel width — the opposite axis from the reference, which loops groups of
4 channels (depthnet.py:341).  On TPU a gather's throughput scales with the
gathered row width (rows land on the 128-lane registers), so 4-channel rows
run at ~3% lane utilization; full-width rows with fewer scan steps are
~50x faster at the same peak memory.  The result is a constant
(stop_gradient), like the reference's @no_grad.
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
                       depth_chunk: int = 8, method: str = "auto",
                       win_rows: int = 2, static: Optional[dict] = None,
                       out_layout: str = "ndhw") -> jnp.ndarray:
    """Softmaxed depth probability volume from two stereo feature maps.

    Args:
      prev_feat, curr_feat: (B, N, Hs, Ws, C) stride-4 stereo features.
      frustum: (D, Hs, Ws, 3) stereo-resolution frustum (cv_frustum).
      k2s_sensor: (B, N, 4, 4) current -> previous camera transform.
      intrins/post_rots: (B, N, 3, 3); post_trans: (B, N, 3).
      bias: added to the cost of invalid samples (5.0 for DHD-M/L).
      depth_chunk: depth bins warped per scan step (memory bound; rounded
        down to a divisor of D; XLA path only).
      method: 'auto' (MXU Pallas kernel on TPU, XLA gather elsewhere),
        'xla', or 'pallas'.
      win_rows: Pallas warp row window height (2 = no in-plane inter-frame
        rotation, the nuScenes rig; raise for rigs with roll — see
        cost_volume_pallas.validate_cv_plan).
      static: optional rig-static plan half (cost_volume_pallas.
        build_cv_static; streaming serving — composed projective per-frame
        plan, Pallas path only).
      out_layout: 'ndhw' -> (B, N, D, Hs, Ws); 'hwd' -> (B*N, Hs, Ws, D)
        (DepthNet's input layout, saves a transpose on the Pallas path).
    Returns:
      cost-volume probabilities (stop-gradient) in ``out_layout``.
    """
    # the whole op is non-differentiable (the reference computes it under
    # @torch.no_grad, depthnet.py:310); stopping gradients on the *inputs*
    # kills tangents before they reach the Pallas kernel — pallas_call has
    # no JVP rule, so an output-side stop_gradient alone would still crash
    # the train-step linearization (caught by the DHD-M train benchmark)
    prev_feat, curr_feat, k2s_sensor, intrins, post_rots, post_trans = (
        jax.lax.stop_gradient(x) for x in
        (prev_feat, curr_feat, k2s_sensor, intrins, post_rots, post_trans))
    if method == "auto":
        method = "pallas" if jax.default_backend() == "tpu" else "xla"
    if method == "pallas":
        from .cost_volume_pallas import stereo_cost_volume_pallas
        return stereo_cost_volume_pallas(
            prev_feat, curr_feat, frustum, k2s_sensor, intrins, post_rots,
            post_trans, bias=bias, win_rows=win_rows,
            interpret=jax.default_backend() != "tpu", static=static,
            out_layout=out_layout)
    b, n, hs, ws, c = curr_feat.shape
    d = frustum.shape[0]
    img_h, img_w = hs * 4, ws * 4
    grid = stereo_reproject_grid(frustum, k2s_sensor, intrins, post_rots,
                                 post_trans, img_h, img_w)
    prev = prev_feat.reshape(b * n, hs, ws, c)
    curr = curr_feat.reshape(b * n, hs, ws, c)

    chunk = max(1, min(depth_chunk, d))
    while d % chunk:
        chunk -= 1
    gchunks = jnp.moveaxis(
        grid.reshape(b * n, d // chunk, chunk, hs, ws, 2), 1, 0)

    def scan_body(_, g):
        warp = grid_sample_2d(prev, g.reshape(b * n, chunk * hs, ws, 2)) \
            .reshape(b * n, chunk, hs, ws, c)
        cost = jnp.abs(curr[:, None] - warp).sum(-1)
        # invalid where the warp sampled outside (zero padding -> channel 0
        # reads exactly 0, depthnet.py:354-356)
        return None, (cost, warp[..., 0] == 0)

    _, (cost, invalid) = jax.lax.scan(scan_body, None, gchunks)
    cost = jnp.moveaxis(cost, 0, 1).reshape(b * n, d, hs, ws)
    invalid = jnp.moveaxis(invalid, 0, 1).reshape(b * n, d, hs, ws)

    if bias != 0.0:
        cost = jnp.where(invalid, cost + bias, cost)
    prob = jax.nn.softmax(-cost.astype(jnp.float32), axis=1)
    if out_layout == "hwd":
        return jax.lax.stop_gradient(jnp.transpose(prob, (0, 2, 3, 1)))
    return jax.lax.stop_gradient(prob.reshape(b, n, d, hs, ws))
