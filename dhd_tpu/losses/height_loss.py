"""Depth/height distribution supervision.

Ports MGHS.get_height_loss / get_downsampled_gt_{depth,height}
(lss_heightmap.py:595-701): min-pool the sparse lidar-projected GT maps over
``downsample`` x ``downsample`` blocks ignoring zeros, bin into shifted
one-hots, and take BCE between the predicted distribution (probabilities) and
the one-hot over foreground pixels (pixels whose depth label is nonzero).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from dhd_tpu.config import GridConfig


def downsample_min_nonzero(gt: jnp.ndarray, ds: int) -> jnp.ndarray:
    """Min-pool over ds x ds blocks treating 0.0 as missing (-> 1e5).

    gt: (B, N, H, W) -> (B, N, H/ds, W/ds); empty blocks come back as 1e5
    (the reference leaves them at 1e5 too before the range check zeroes them).
    """
    b, n, h, w = gt.shape
    x = jnp.where(gt == 0.0, 1e5, gt)
    x = x.reshape(b, n, h // ds, ds, w // ds, ds)
    return jnp.min(x, axis=(3, 5))


def shifted_onehot_labels(values: jnp.ndarray, lower: float, interval: float,
                          num_bins: int, shift_lower: bool) -> jnp.ndarray:
    """Bin values into the reference's shifted one-hot labels.

    depth flavour (shift_lower=True):  idx = (v - (lower - interval))/interval
    height flavour (shift_lower=False): idx = (v - lower)/interval
    Kept if 0 <= idx < num_bins + 1, else forced to bin 0; one-hot over
    num_bins+1 classes with the first column dropped — so "kept" pixels with
    idx 0 become all-zero rows (lss_heightmap.py:649-701).
    """
    if shift_lower:
        idx = (values - (lower - interval)) / interval
    else:
        idx = (values - lower) / interval
    valid = (idx >= 0.0) & (idx < num_bins + 1)
    idx = jnp.where(valid, idx, 0.0).astype(jnp.int32)
    onehot = jax.nn.one_hot(idx, num_bins + 1, dtype=jnp.float32)
    return onehot[..., 1:]


def bce_distribution_loss(pred_prob: jnp.ndarray, labels: jnp.ndarray,
                          fg_mask: jnp.ndarray) -> jnp.ndarray:
    """sum(BCE(pred, onehot)) over fg pixels / max(1, n_fg).

    pred_prob: (..., K) probabilities; labels: (..., K) {0,1};
    fg_mask: (...) bool.  torch F.binary_cross_entropy clamps log at -100.
    """
    p = pred_prob.astype(jnp.float32)
    logp = jnp.clip(jnp.log(p), -100.0, None)
    log1mp = jnp.clip(jnp.log1p(-p), -100.0, None)
    bce = -(labels * logp + (1.0 - labels) * log1mp)
    fg = fg_mask.astype(jnp.float32)
    total = jnp.sum(bce * fg[..., None])
    return total / jnp.maximum(jnp.sum(fg), 1.0)


def depth_height_labels(gt_depth: jnp.ndarray, gt_height: jnp.ndarray,
                        downsample: int, gt_depth_grid: GridConfig,
                        frustum_d: int,
                        height_min: float, height_interval: float,
                        num_height_bins: int
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full GT preparation: returns (depth_labels, height_labels, fg_mask).

    The depth binning uses the *mutated* 0.5 m interval the reference ends up
    with at loss time (see ViewTransformConfig.gt_depth), while the number of
    label bins stays the frustum D (lss_heightmap.py:663-666) — for DHD-S
    that means 44 bins of 0.5 m, so the fg-mask covers depth in [1, 23) m.
    """
    d_ds = downsample_min_nonzero(gt_depth, downsample)
    h_ds = downsample_min_nonzero(gt_height, downsample)
    d_labels = shifted_onehot_labels(
        d_ds, gt_depth_grid.lower, gt_depth_grid.interval, frustum_d,
        shift_lower=True)
    h_labels = shifted_onehot_labels(
        h_ds, height_min, height_interval, num_height_bins,
        shift_lower=False)
    fg_mask = jnp.max(d_labels, axis=-1) > 0.0
    return d_labels, h_labels, fg_mask
