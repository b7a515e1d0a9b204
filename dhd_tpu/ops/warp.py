"""Bilinear warping (torch ``F.grid_sample`` equivalent) in pure jnp.

Used by the temporal BEV alignment (detectors/bevdet4d.py:118-134) and the
stereo cost volume (model_utils/depthnet.py:310-361).  Gather-based bilinear
sampling with zero padding; channels-last layout.
"""
from __future__ import annotations

import jax.numpy as jnp


def grid_sample_2d(img: jnp.ndarray, grid: jnp.ndarray,
                   align_corners: bool = True) -> jnp.ndarray:
    """Sample ``img`` at normalized grid locations, zero padding outside.

    Args:
      img: (B, H, W, C)
      grid: (B, Ho, Wo, 2) with (x, y) in [-1, 1]; -1 maps to pixel 0 and +1
        to pixel (W-1 | H-1) when ``align_corners`` (torch semantics).
    Returns:
      (B, Ho, Wo, C)
    """
    b, h, w, c = img.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (w - 1)
        fy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((gx + 1.0) * w - 1.0) * 0.5
        fy = ((gy + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yy, xx):
        valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        xs = jnp.clip(xx, 0, w - 1)
        ys = jnp.clip(yy, 0, h - 1)
        flat = img.reshape(b, h * w, c)
        lin = (ys * w + xs).reshape(b, -1)
        out = jnp.take_along_axis(flat, lin[..., None], axis=1)
        out = out.reshape(*xx.shape, c)
        return out * valid[..., None].astype(img.dtype)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    wx = wx[..., None].astype(img.dtype)
    wy = wy[..., None].astype(img.dtype)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
