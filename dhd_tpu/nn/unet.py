"""UNet voxel-slab encoder (models/backbones/unet.py:7-143).

Classic 2D UNet: enc 64->1024 via maxpool+DoubleConv, dec via ConvTranspose2d
(k2 s2, bilinear=False default) + skip concat + DoubleConv, 1x1 out conv.
Used on z-collapsed voxel slabs (e.g. 256ch @ 200x200) and, in DHD-M, as the
whole BEV encoder backbone.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, max_pool2

Dtype = Any


class DoubleConv(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = BatchNorm(dtype=self.dtype, name=f"bn{i}")(x, train)
            x = nn.relu(x)
        return x


class Up(nn.Module):
    """ConvTranspose (k2, s2) then skip-concat then DoubleConv."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        up_ch = x1.shape[-1] // 2
        x1 = nn.ConvTranspose(up_ch, (2, 2), strides=(2, 2),
                              dtype=self.dtype, name="up")(x1)
        # pad x1 to x2's spatial size (UNet odd-size guard, unet.py:95-99)
        dy = x2.shape[1] - x1.shape[1]
        dx = x2.shape[2] - x1.shape[2]
        if dy or dx:
            x1 = jnp.pad(x1, ((0, 0), (dy // 2, dy - dy // 2),
                              (dx // 2, dx - dx // 2), (0, 0)))
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.features, dtype=self.dtype,
                          name="conv")(x, train)


class UNet(nn.Module):
    """UNet(n_channels -> n_classes) with the reference's fixed 64..1024
    channel ladder."""
    n_classes: int
    base: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = self.base
        x1 = DoubleConv(b, dtype=self.dtype, name="inc")(x, train)
        x2 = DoubleConv(b * 2, dtype=self.dtype,
                        name="down1")(max_pool2(x1), train)
        x3 = DoubleConv(b * 4, dtype=self.dtype,
                        name="down2")(max_pool2(x2), train)
        x4 = DoubleConv(b * 8, dtype=self.dtype,
                        name="down3")(max_pool2(x3), train)
        x5 = DoubleConv(b * 16, dtype=self.dtype,
                        name="down4")(max_pool2(x4), train)
        x = Up(b * 8, dtype=self.dtype, name="up1")(x5, x4, train)
        x = Up(b * 4, dtype=self.dtype, name="up2")(x, x3, train)
        x = Up(b * 2, dtype=self.dtype, name="up3")(x, x2, train)
        x = Up(b, dtype=self.dtype, name="up4")(x, x1, train)
        return nn.Conv(self.n_classes, (1, 1), dtype=self.dtype,
                       name="outc")(x)
