"""SFA — Synergistic Feature Aggregation (models/necks/mix.py:8-90).

Fuses the BEV branch with the voxel-slab branch: a channel attention stage
(global pool -> FC bottleneck -> sigmoid alpha; fuse a*bev + (1-a)*voxel),
a spatial attention stage (1x1 conv gate, same mixing), then a residual
block over the fused half plus a 1x1 shortcut over the full concat.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm

Dtype = Any


class ChannelSpatialStage(nn.Module):
    features: int            # channels of the concat input (2C)
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        x_bev, x_voxel = x[..., :c], x[..., c:]
        pooled = jnp.mean(x, axis=(1, 2))                       # (B, 2C)
        a = nn.Dense(self.features // self.reduction,
                     dtype=self.dtype, name="fc0")(pooled)
        a = nn.relu(a)
        a = nn.Dense(c, dtype=self.dtype, name="fc1")(a)
        a = jax.nn.sigmoid(a)[:, None, None, :]                 # (B,1,1,C)
        x_bev1 = a * x_bev
        x_vox1 = (1.0 - a) * x_voxel
        fused = x_bev1 + x_vox1
        s = nn.Conv(c, (1, 1), dtype=self.dtype, name="sp0")(fused)
        s = BatchNorm(dtype=self.dtype, name="sp_bn0")(s, train)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype, name="sp1")(s)
        s = BatchNorm(dtype=self.dtype, name="sp_bn1")(s, train)
        g = jax.nn.sigmoid(s)
        return g * x_bev1 + (1.0 - g) * x_vox1


class SFA(nn.Module):
    out_channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        fused = ChannelSpatialStage(x.shape[-1], dtype=self.dtype,
                                    name="stage")(x, train)
        y = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="res0")(fused)
        y = BatchNorm(dtype=self.dtype, name="res_bn0")(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="res1")(y)
        y = BatchNorm(dtype=self.dtype, name="res_bn1")(y, train)
        sc = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                     dtype=self.dtype, name="shortcut")(x)
        sc = BatchNorm(dtype=self.dtype, name="sc_bn")(sc, train)
        return nn.relu(y + sc)
