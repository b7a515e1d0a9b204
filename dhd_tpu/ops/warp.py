"""Bilinear warping (torch ``F.grid_sample`` equivalent) in pure jnp.

Used by the temporal BEV alignment (detectors/bevdet4d.py:118-134) and the
stereo cost volume (model_utils/depthnet.py:310-361).  Gather-based bilinear
sampling with zero padding; channels-last layout.

The four bilinear corners come from ONE ``lax.gather`` of (2, 2, C) blocks
instead of four separate row gathers: on TPU each gathered row costs about
the same regardless of adjacency, so fetching the 2x2 neighbourhood as a
single block halves the gathered rows and doubles locality (measured 227 ->
122 ms for the DHD-M cost-volume warp).  XLA clamps out-of-range block
starts; border/outside corners are then selected and zero-masked per point,
which keeps torch's zero-padding semantics exactly.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


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
    if h < 2 or w < 2:
        raise ValueError(
            f"grid_sample_2d needs H>=2 and W>=2 (got {h}x{w}): the "
            "block-gather path pairs adjacent rows/columns")
    out_shape = grid.shape[:-1] + (c,)
    gx = grid[..., 0].reshape(b, -1)
    gy = grid[..., 1].reshape(b, -1)
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

    # ONE gathered row per point fetches all 4 bilinear corners: adjacent
    # image rows are pre-paired channel-wise (imgp[y] = [img[y], img[y+1]],
    # loop-invariant, hoisted out of callers' scans), so a (1, 1, 2, 2C)
    # slice at (y0, x0) is the whole 2x2 neighbourhood as 2C-contiguous
    # memory.  Starts are clamped into [0, H-2] x [0, W-2].
    imgp = jnp.concatenate([img[:, :-1], img[:, 1:]], axis=-1)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,))
    blk = lax.gather(imgp, jnp.stack([y0i, x0i], axis=-1), dn,
                     slice_sizes=(1, 1, 2, 2 * c),
                     mode=lax.GatherScatterMode.CLIP)
    blk = blk.reshape(b, -1, 2, 2 * c)                 # (B, P, x-pair, 2C)

    # Fold bilinear weight, zero-padding validity, and the border/outside
    # block-position correction into one scalar weight per block entry.
    # Separable in x and y: block column j holds pixel bx+j, and corner
    # x0+ox contributes weight wx(ox) there iff it is that pixel and lies
    # inside the image.  Everything stays (B, P) scalars — the (..., C)
    # tensor is touched exactly once in the final weighted sum.
    def axis_weights(v0i, frac, size):
        base = jnp.clip(v0i, 0, size - 2)
        t = v0i - base                      # 0 interior, 1 right border,
        #                                     negative left of the image
        w0, w1 = 1.0 - frac, frac
        val0 = (v0i >= 0) & (v0i < size)
        val1 = (v0i + 1 >= 0) & (v0i + 1 < size)
        a0 = jnp.where((t == 0) & val0, w0, 0.0) \
            + jnp.where((t == -1) & val1, w1, 0.0)
        a1 = jnp.where((t == 1) & val0, w0, 0.0) \
            + jnp.where((t == 0) & val1, w1, 0.0)
        return a0.astype(blk.dtype), a1.astype(blk.dtype)

    ax0, ax1 = axis_weights(x0i, wx, w)
    ay0, ay1 = axis_weights(y0i, wy, h)
    ax0, ax1 = ax0[..., None], ax1[..., None]
    ay0, ay1 = ay0[..., None], ay1[..., None]
    v00, v10 = blk[:, :, 0, :c], blk[:, :, 0, c:]      # (y0, x0), (y0+1, x0)
    v01, v11 = blk[:, :, 1, :c], blk[:, :, 1, c:]
    out = (v00 * ax0 + v01 * ax1) * ay0 + (v10 * ax0 + v11 * ax1) * ay1
    return out.reshape(out_shape)
