"""FlashOcc-style channel-to-height occupancy head.

Mirrors ``predictor`` (models/dense_heads/occ_head.py:33-100): 3x3 conv, a
(Dy, Dx) -> (Dx, Dy) transpose, then an MLP (Linear -> Softplus -> Linear)
reshaped to (B, Dx, Dy, Dz, num_classes).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class OccHead(nn.Module):
    """``return_flat`` keeps the output packed as (B, Dx, Dy, Dz*n_cls):
    the (..., Dz, 18) view pads its minor dim to the 128-lane tile in HBM
    (7.1x the bytes), so the train path consumes the packed form and only
    reshapes where a consumer actually needs classes-minor."""
    out_dim: int = 256
    Dz: int = 16
    num_classes: int = 18
    use_predicter: bool = True
    return_flat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, Dy, Dx, C) channels-last.
        out_ch = self.out_dim if self.use_predicter \
            else self.num_classes * self.Dz
        x = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="final_conv")(x)
        # mmcv ConvModule defaults to act_cfg=ReLU (no norm), so the
        # reference's final_conv is conv + ReLU (occ_head.py:52-60)
        x = nn.relu(x)
        # reference permutes (B, C, Dy, Dx) -> (B, Dx, Dy, C)
        # (occ_head.py:93); channels-last equivalent: swap the spatial axes.
        x = jnp.swapaxes(x, 1, 2)
        if self.use_predicter:
            x = nn.Dense(self.out_dim * 2, dtype=self.dtype, name="fc0")(x)
            x = jax.nn.softplus(x)
            x = nn.Dense(self.num_classes * self.Dz, dtype=self.dtype,
                         name="fc1")(x)
        if self.return_flat:
            return x
        b, dx_, dy_ = x.shape[:3]
        return x.reshape(b, dx_, dy_, self.Dz, self.num_classes)
