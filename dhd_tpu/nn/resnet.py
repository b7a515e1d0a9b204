"""Image backbone (ResNet-50) and BEV encoder backbone (CustomResNet).

ResNet-50 follows the torchvision layout used by the reference's mmdet
``ResNet`` (DHD-S.py:44-55, style='pytorch', norm BN); CustomResNet mirrors
models/backbones/resnet.py:11-80 (stride-2 stages of BasicBlocks whose
downsample branch is a *bare* 3x3 conv, no BN).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import BasicBlock, BatchNorm, Bottleneck, max_pool2

Dtype = Any


class ResNet50(nn.Module):
    """torchvision-style ResNet-50 trunk returning selected stage outputs.

    out_indices: stage ids (0..3) to emit; stage i has 256*2**i channels at
    stride 4*2**i.  DHD-S uses (2, 3); the stereo models use (0, 2, 3) where
    stage-0 also feeds the stereo cost volume (bevdet.py:33-37).
    """
    out_indices: Tuple[int, ...] = (2, 3)
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, stage0_only: bool = False):
        """``stage0_only`` runs stem + layer1 only and returns that feature —
        the stereo extra-ref-frame path (bevstereo4d.py:20-40).  Parameters
        are shared with the full path by name.

        ``remat`` rematerializes each bottleneck in the backward pass — the
        torch.utils.checkpoint `with_cp=True` of the reference backbone
        config (DHD-S.py:52)."""
        block_cls = (nn.remat(Bottleneck, static_argnums=(2,))
                     if self.remat else Bottleneck)
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = BatchNorm(dtype=self.dtype, name="stem_bn")(x, train)
        x = nn.relu(x)
        # torch maxpool(3, 2, padding=1): pad then pool.
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        outs = []
        planes = 64
        for stage, n_blocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            for blk in range(n_blocks):
                x = block_cls(
                    planes=planes,
                    stride=stride if blk == 0 else 1,
                    downsample=(blk == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{blk}")(x, train)
            if stage0_only and stage == 0:
                return x
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return outs


class CustomResNet(nn.Module):
    """BEV-encoder backbone: stages of BasicBlocks, stride 2 each, returns
    the per-stage features selected by ``backbone_output_ids``
    (models/backbones/resnet.py:11-80)."""
    num_channels: Tuple[int, ...] = (128, 256, 512)
    num_layer: Tuple[int, ...] = (2, 2, 2)
    stride: Tuple[int, ...] = (2, 2, 2)
    backbone_output_ids: Tuple[int, ...] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ids = (self.backbone_output_ids
                   if self.backbone_output_ids is not None
                   else tuple(range(len(self.num_layer))))
        feats = []
        for i, (ch, n, s) in enumerate(
                zip(self.num_channels, self.num_layer, self.stride)):
            x = BasicBlock(ch, stride=s, downsample="conv",
                           dtype=self.dtype, name=f"stage{i}_0")(x, train)
            for b in range(1, n):
                x = BasicBlock(ch, dtype=self.dtype,
                               name=f"stage{i}_{b}")(x, train)
            if i in out_ids:
                feats.append(x)
        return feats


class TinyCNN(nn.Module):
    """Small 2-scale conv backbone standing in for ResNet-50 in unit tests.

    Emits features at stride 16 and 32 with the channel counts the tiny
    config's neck expects.
    """
    channels: Tuple[int, ...] = (16, 32, 64, 128)
    emit_stereo: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, stage0_only: bool = False):
        outs = []
        for i, ch in enumerate(self.channels):
            x = BasicBlock(ch, stride=2, downsample="conv",
                           dtype=self.dtype, name=f"b{i}")(x, train)
            if i == 1:                                   # stride 4
                if stage0_only:
                    return x
                if self.emit_stereo:
                    outs.append(x)
        outs.append(x)                                   # stride 16
        x = BasicBlock(self.channels[-1], stride=2, downsample="conv",
                       dtype=self.dtype, name="b_last")(x, train)
        outs.append(x)                                   # stride 32
        return outs
