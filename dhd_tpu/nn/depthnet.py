"""DepthNet / HeightNet: camera-aware depth & height distribution heads.

Re-creates model_utils/depthnet.py:172-652 in flax: a reduce conv, SE gates
driven by the 27-dim camera embedding, 3 BasicBlocks + ASPP (+ optional
deformable conv) + 1x1 projection to the D (depth) or H (height) bins, and an
optional stereo cost-volume input branch.  The deformable conv is a
gather-based bilinear-sampling implementation of mmcv's DCN
(DeformConv2dPack, deform_groups=1, conv groups=4, zero-init offsets).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dhd_tpu.config import DepthNetConfig
from .layers import ASPP, BasicBlock, BatchNorm, Mlp, SELayer

Dtype = Any


def _bilinear_sample_matmul(img: jnp.ndarray, py: jnp.ndarray,
                            px: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample as a one-hot interpolation matmul (MXU path).

    XLA's row gather runs the deformable conv at ~3.5 ms on a v5e at DHD-S
    scale; building the (HW*K, HW) interpolation matrix with compares and
    contracting it on the MXU is ~10x faster for the small feature maps the
    DCN sees (fH*fW = 704 for DHD-S/M).  Memory is O(HW^2 * K), so the
    caller gates this on HW.

    img: (B, H, W, C); py/px: (B, H, W, K) -> (B, H, W, K, C).
    """
    b, h, w, c = img.shape
    k = py.shape[-1]
    hw = h * w
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    pos = jnp.arange(hw, dtype=jnp.int32)
    m = jnp.zeros((b, hw * k, hw), img.dtype)
    for dy_, dx_, wgt in ((0, 0, (1 - wy) * (1 - wx)),
                          (0, 1, (1 - wy) * wx),
                          (1, 0, wy * (1 - wx)),
                          (1, 1, wy * wx)):
        yi = y0.astype(jnp.int32) + dy_
        xi = x0.astype(jnp.int32) + dx_
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        lin = (jnp.clip(yi, 0, h - 1) * w
               + jnp.clip(xi, 0, w - 1)).reshape(b, hw * k)
        ww = jnp.where(valid, wgt, 0.0).reshape(b, hw * k).astype(img.dtype)
        m = m + ww[..., None] * (lin[..., None] == pos).astype(img.dtype)
    out = jnp.einsum("bpq,bqc->bpc", m, img.reshape(b, hw, c))
    return out.reshape(b, h, w, k, c)


def _bilinear_sample_abs(img: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray
                         ) -> jnp.ndarray:
    """Bilinear sample at absolute pixel coords, zero outside.

    img: (B, H, W, C); py/px: (B, Ho, Wo, K) -> (B, Ho, Wo, K, C).
    """
    b, h, w, c = img.shape
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = (px - x0)[..., None].astype(img.dtype)
    wy = (py - y0)[..., None].astype(img.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = img.reshape(b, h * w, c)

    def gather(yy, xx):
        valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        lin = (jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1))
        out = jnp.take_along_axis(flat, lin.reshape(b, -1)[..., None], axis=1)
        out = out.reshape(yy.shape + (c,))
        return out * valid[..., None].astype(img.dtype)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


class DeformConv(nn.Module):
    """3x3 deformable conv v1 (offsets only), conv groups=4, zero-init offset
    predictor — matches mmcv DCN as configured in depthnet.py:226-236."""
    features: int
    groups: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, cin = x.shape
        k = 9
        # offset conv: zero-init so the op starts as a plain 3x3 conv.
        off = nn.Conv(2 * k, (3, 3), padding=1,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      dtype=self.dtype, name="conv_offset")(x)
        off = off.reshape(b, h, w, k, 2)          # (dy, dx) per tap
        gy = jnp.arange(h, dtype=off.dtype)[None, :, None, None]
        gx = jnp.arange(w, dtype=off.dtype)[None, None, :, None]
        ky = jnp.array([-1, -1, -1, 0, 0, 0, 1, 1, 1], off.dtype)
        kx = jnp.array([-1, 0, 1, -1, 0, 1, -1, 0, 1], off.dtype)
        py = gy + ky[None, None, None, :] + off[..., 0]
        px = gx + kx[None, None, None, :] + off[..., 1]
        # (B, H, W, 9, Cin); MXU one-hot-matmul path for the small feature
        # maps the DCN sees, gather fallback for big ones
        if h * w <= 1024:
            sampled = _bilinear_sample_matmul(x, py, px)
        else:
            sampled = _bilinear_sample_abs(x, py, px)
        g = self.groups
        cg = cin // g
        og = self.features // g
        wgt = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (k, cg, g, og), jnp.float32).astype(self.dtype)
        sampled = sampled.reshape(b, h, w, k, g, cg)
        return jnp.einsum("bhwkgc,kcgo->bhwgo", sampled, wgt
                          ).reshape(b, h, w, self.features)


class _DistributionNet(nn.Module):
    """Shared trunk of DepthNet/HeightNet (the 'depth branch')."""
    mid_channels: int
    out_bins: int
    cfg: DepthNetConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, cost_volume, train: bool = False):
        x = feat
        if self.cfg.stereo:
            assert cost_volume is not None
            cv = cost_volume
            for i in range(2):
                cv = nn.Conv(self.out_bins, (3, 3), strides=2, padding=1,
                             dtype=self.dtype, name=f"cv_conv{i}")(cv)
                cv = BatchNorm(dtype=self.dtype, name=f"cv_bn{i}")(cv, train)
            x = jnp.concatenate([x, cv], axis=-1)
            x = BasicBlock(self.mid_channels, downsample="conv1x1",
                           dtype=self.dtype, name="block0")(x, train)
        else:
            x = BasicBlock(self.mid_channels, dtype=self.dtype,
                           name="block0")(x, train)
        x = BasicBlock(self.mid_channels, dtype=self.dtype,
                       name="block1")(x, train)
        x = BasicBlock(self.mid_channels, dtype=self.dtype,
                       name="block2")(x, train)
        if self.cfg.use_aspp:
            mid = (self.cfg.aspp_mid_channels
                   if self.cfg.aspp_mid_channels > 0 else self.mid_channels)
            x = ASPP(mid, self.mid_channels,
                     dropout_rate=self.cfg.aspp_dropout, dtype=self.dtype,
                     name="aspp")(x, train)
        if self.cfg.use_dcn:
            x = DeformConv(self.mid_channels, dtype=self.dtype,
                           name="dcn")(x, train)
        return nn.Conv(self.out_bins, (1, 1), dtype=self.dtype,
                       name="out_conv")(x)


class DepthNet(nn.Module):
    """Full BEVDepth-style DepthNet (depthnet.py:172-415).

    __call__(x, mlp_input, cost_volume) -> (BN, fH, fW, D + C_context):
    the first D channels are depth logits, the rest the context features.
    """
    mid_channels: int
    context_channels: int
    depth_channels: int
    cfg: DepthNetConfig = DepthNetConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mlp_input, cost_volume=None, train: bool = False):
        mlp = BatchNorm(dtype=jnp.float32, name="mlp_bn")(mlp_input, train)
        x = nn.Conv(self.mid_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="reduce_conv")(x)
        x = BatchNorm(dtype=self.dtype, name="reduce_bn")(x, train)
        x = nn.relu(x)

        ctx_se = Mlp(self.mid_channels, self.mid_channels, dtype=self.dtype,
                     name="context_mlp")(mlp)
        context = SELayer(self.mid_channels, dtype=self.dtype,
                          name="context_se")(x, ctx_se)
        context = nn.Conv(self.context_channels, (1, 1), dtype=self.dtype,
                          name="context_conv")(context)

        dep_se = Mlp(self.mid_channels, self.mid_channels, dtype=self.dtype,
                     name="depth_mlp")(mlp)
        depth = SELayer(self.mid_channels, dtype=self.dtype,
                        name="depth_se")(x, dep_se)
        depth = _DistributionNet(self.mid_channels, self.depth_channels,
                                 self.cfg, dtype=self.dtype,
                                 name="depth_conv")(depth, cost_volume, train)
        return jnp.concatenate([depth, context], axis=-1)


class HeightNet(nn.Module):
    """DepthNet minus the context branch (depthnet.py:418-652)."""
    mid_channels: int
    height_channels: int
    cfg: DepthNetConfig = DepthNetConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mlp_input, cost_volume=None, train: bool = False):
        mlp = BatchNorm(dtype=jnp.float32, name="mlp_bn")(mlp_input, train)
        x = nn.Conv(self.mid_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="reduce_conv")(x)
        x = BatchNorm(dtype=self.dtype, name="reduce_bn")(x, train)
        x = nn.relu(x)
        se = Mlp(self.mid_channels, self.mid_channels, dtype=self.dtype,
                 name="depth_mlp")(mlp)
        h = SELayer(self.mid_channels, dtype=self.dtype,
                    name="depth_se")(x, se)
        return _DistributionNet(self.mid_channels, self.height_channels,
                                self.cfg, dtype=self.dtype,
                                name="depth_conv")(h, cost_volume, train)
