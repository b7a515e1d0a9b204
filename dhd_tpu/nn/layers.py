"""Shared NN building blocks (flax.linen, NHWC layout).

These re-create the torch bricks the reference composes from mmcv/mmdet:
BasicBlock (mmdet.models.backbones.resnet), SELayer / Mlp / ASPP
(model_utils/depthnet.py:10-169), plus torch-compatible resizing helpers.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# torch BatchNorm defaults: momentum 0.1 (flax momentum = 0.9), eps 1e-5.
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def BatchNorm(dtype: Dtype = jnp.float32, name: Optional[str] = None):
    """BatchNorm2d with torch defaults, created flat in the caller's scope.

    Under jit with batch-sharded inputs the mean/var reductions are global,
    i.e. this *is* SyncBN — the TPU-native equivalent of the reference's
    SyncbnControlHook (core/hook/syncbncontrol.py:10-33), always on.
    """
    def apply(x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=dtype, param_dtype=jnp.float32, name=name)(x)
    return apply


class ConvBNReLU(nn.Module):
    """conv -> BN -> (ReLU)."""
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    use_bn: bool = True
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.dilation * (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding=pad,
                    kernel_dilation=self.dilation,
                    use_bias=self.use_bias, dtype=self.dtype,
                    name="conv")(x)
        if self.use_bn:
            x = BatchNorm(dtype=self.dtype, name="bn")(x, train)
        if self.act:
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    """mmdet-style ResNet BasicBlock: 3x3(s)-BN-ReLU-3x3-BN + skip, ReLU.

    ``downsample``: None (identity), 'conv' (bare 3x3 conv like CustomResNet,
    models/backbones/resnet.py:47-48), or 'conv1x1' (1x1 conv, used for the
    stereo DepthNet first block, depthnet.py:204-206).
    """
    features: int
    stride: int = 1
    downsample: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.downsample == "conv":
            identity = nn.Conv(self.features, (3, 3), strides=self.stride,
                               padding=1, dtype=self.dtype,
                               name="downsample")(x)
        elif self.downsample == "conv1x1":
            identity = nn.Conv(self.features, (1, 1), strides=self.stride,
                               padding=0, dtype=self.dtype,
                               name="downsample")(x)
        else:
            identity = x
        y = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = BatchNorm(dtype=self.dtype, name="bn1")(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = BatchNorm(dtype=self.dtype, name="bn2")(y, train)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    """torchvision/mmdet Bottleneck (pytorch style: stride on the 3x3)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.planes * self.expansion
        if self.downsample:
            identity = nn.Conv(out_ch, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = BatchNorm(dtype=self.dtype,
                                 name="downsample_bn")(identity, train)
        else:
            identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = BatchNorm(dtype=self.dtype, name="bn1")(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = BatchNorm(dtype=self.dtype, name="bn2")(y, train)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = BatchNorm(dtype=self.dtype, name="bn3")(y, train)
        return nn.relu(y + identity)


class Mlp(nn.Module):
    """2-layer MLP with ReLU (depthnet.py:119-147)."""
    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class SELayer(nn.Module):
    """Camera-aware SE gate (depthnet.py:150-169): x * sigmoid(MLP(se))."""
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_se):
        # x: (B, H, W, C); x_se: (B, C) broadcast over space.
        g = nn.Dense(self.channels, dtype=self.dtype, name="conv_reduce")(x_se)
        g = nn.relu(g)
        g = nn.Dense(self.channels, dtype=self.dtype, name="conv_expand")(g)
        return x * jax.nn.sigmoid(g)[:, None, None, :]


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (depthnet.py:42-116).

    4 dilated branches (1x1 d1, 3x3 d6/d12/d18) + global-average branch,
    concat -> 1x1 conv -> BN -> ReLU -> dropout(0.5).
    """
    mid_channels: int
    out_channels: int
    dropout_rate: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = ConvBNReLU(self.mid_channels, kernel=1, dtype=self.dtype,
                        name="aspp1")(x, train)
        b2 = ConvBNReLU(self.mid_channels, kernel=3, dilation=6,
                        dtype=self.dtype, name="aspp2")(x, train)
        b3 = ConvBNReLU(self.mid_channels, kernel=3, dilation=12,
                        dtype=self.dtype, name="aspp3")(x, train)
        b4 = ConvBNReLU(self.mid_channels, kernel=3, dilation=18,
                        dtype=self.dtype, name="aspp4")(x, train)
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = ConvBNReLU(self.mid_channels, kernel=1, dtype=self.dtype,
                       name="gap")(g, train)
        g = jnp.broadcast_to(g, b4.shape[:-1] + (self.mid_channels,))
        y = jnp.concatenate([b1, b2, b3, b4, g], axis=-1)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(y)
        y = BatchNorm(dtype=self.dtype, name="bn1")(y, train)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        return y


def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) align-corners bilinear interpolation matrix."""
    m = np.zeros((n_out, n_in), np.float32)
    if n_in == 1:
        m[:, 0] = 1.0
        return m
    pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    i0 = np.clip(np.floor(pos).astype(int), 0, n_in - 2)
    frac = pos - i0
    m[np.arange(n_out), i0] = 1.0 - frac
    m[np.arange(n_out), i0 + 1] = frac
    return m


def upsample_bilinear_align(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Bilinear x``scale`` upsample with torch align_corners=True semantics.

    Implemented as two small constant interpolation matmuls (MXU-friendly
    and fusion-friendly) instead of gathers; out pixel i samples input at
    i*(in-1)/(out-1).  x: (B, H, W, C).
    """
    b, h, w, c = x.shape
    wy = jnp.asarray(_interp_matrix(h, h * scale), x.dtype)
    wx = jnp.asarray(_interp_matrix(w, w * scale), x.dtype)
    hp = jax.lax.Precision.HIGHEST
    x = jnp.einsum("oh,bhwc->bowc", wy, x, precision=hp)
    return jnp.einsum("pw,bowc->bopc", wx, x, precision=hp)


def max_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 max pool, stride 2 (UNet Down / ResNet stem)."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))
