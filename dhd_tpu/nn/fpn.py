"""Image neck (CustomFPN) and BEV-encoder neck (FPN_LSS).

CustomFPN mirrors models/necks/fpn.py:11-203 with ``out_ids`` selecting one
fused level; FPN_LSS mirrors models/necks/lss_fpn.py:12-75.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, upsample_bilinear_align

Dtype = Any


class CustomFPN(nn.Module):
    """FPN over the backbone outputs; returns only level ``out_ids[0]``.

    DHD-S: in [1024, 2048] -> 256, num_outs=1, out_ids=[0] (DHD-S.py:56-62):
    lateral 1x1 convs, top-down nearest upsample + add, one 3x3 output conv.
    """
    out_channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = jax.image.resize(
                laterals[i],
                laterals[i - 1].shape[:1] + laterals[i - 1].shape[1:3]
                + laterals[i].shape[-1:],
                method="nearest")
            laterals[i - 1] = laterals[i - 1] + up
        out = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                      name="fpn_conv0")(laterals[0])
        return out


class FPN_LSS(nn.Module):
    """2-level fuse neck (lss_fpn.py:12-75).

    Upsample the deep level by ``scale_factor`` (bilinear, align_corners),
    concat with the shallow level, 2x conv-BN-ReLU, then an optional extra
    x2 upsample head ending in a 1x1 conv.
    """
    out_channels: int = 256
    scale_factor: int = 4
    input_feature_index: Tuple[int, int] = (0, 2)
    extra_upsample: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        x2 = feats[self.input_feature_index[0]]
        x1 = feats[self.input_feature_index[1]]
        x1 = upsample_bilinear_align(x1, self.scale_factor)
        x = jnp.concatenate([x2, x1], axis=-1)
        cf = 2 if self.extra_upsample else 1
        mid = self.out_channels * cf
        # names follow the torch Sequential indices (lss_fpn.py:31-48):
        # conv.{0,1,3,4} and up2.{1,2,4}
        x = nn.Conv(mid, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv_0")(x)
        x = BatchNorm(dtype=self.dtype, name="conv_1")(x, train)
        x = nn.relu(x)
        x = nn.Conv(mid, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv_3")(x)
        x = BatchNorm(dtype=self.dtype, name="conv_4")(x, train)
        x = nn.relu(x)
        if self.extra_upsample:
            x = upsample_bilinear_align(x, self.extra_upsample)
            x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name="up2_1")(x)
            x = BatchNorm(dtype=self.dtype, name="up2_2")(x, train)
            x = nn.relu(x)
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="up2_4")(x)
        return x
