"""Swin Transformer backbone (DHD-L's Swin-B).

Re-implements the mmcv-flavoured Swin used by the reference
(models/backbones/swin.py:680-976): 4x4 conv patch embed + LN, stages of
W-MSA/SW-MSA blocks with relative position bias and stochastic depth,
unfold-ordered PatchMerging (channel-major 2x2 concat, swin.py:216-241),
per-out-index LN heads, and the ``return_stereo_feat`` flag that also emits
the stage-0 (stride-4) feature for the stereo cost volume (swin.py:957-961).

DHD-L config: embed 128, depths (2,2,18,2), heads (4,8,16,32), window 12,
no absolute pos embed, out_indices (2,3) -> channels (512, 1024).
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nH*nW, ws*ws, C); H, W divisible by ws."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, ws * ws, c)


def window_reverse(wins: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    b = wins.shape[0] // ((h // ws) * (w // ws))
    x = wins.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h, w, -1)


@functools.lru_cache(maxsize=None)
def _window_perms(hp: int, wp: int, h: int, w: int, ws: int,
                  shift: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static row permutations replacing roll+window_partition and
    window_reverse+unroll+crop.

    Window partition/reverse are pure row permutations of the
    (Hp*Wp, C) matrix (C is the lane dim and untouched), but XLA lowers
    the reshape+transpose formulation through sublane-shuffling relayout
    fusions measured ~8-26x off the HBM roofline (DHD-L stage 3:
    12.4 ms/step of pure data movement, round-5 trace) — while a static
    row gather of the same bytes rides the fast path (cf. the pool-plan
    row-gather finding, README "Performance notes").  The cyclic shift
    (jnp.roll) and the final [:h, :w] crop are themselves row
    permutations/selections, so both fold into the same gather for free.

    Returns (fwd, inv): ``fwd[widx*N + n]`` is the row of the PADDED
    (hp, wp) map feeding window element n of window widx (shift already
    applied); ``inv[i*w + j]`` is the (widx*N + n) row of the window
    tensor that lands at cropped output position (i, j).
    """
    nw_w = wp // ws
    wi, pi, wj, pj = np.meshgrid(
        np.arange(hp // ws), np.arange(ws), np.arange(nw_w),
        np.arange(ws), indexing="ij")
    # forward: window element (wi, wj, pi, pj) reads rolled row
    # (wi*ws+pi, wj*ws+pj) = padded row ((.+shift) % hp, (.+shift) % wp)
    src = (((wi * ws + pi + shift) % hp) * wp
           + (wj * ws + pj + shift) % wp)           # (nH, ws, nW, ws)
    fwd = src.transpose(0, 2, 1, 3).reshape(-1)     # widx-major, N inner
    # inverse: output (i, j) <- rolled row ((i-shift) % hp, (j-shift) % wp)
    i, j = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    ri, rj = (i - shift) % hp, (j - shift) % wp
    inv = ((ri // ws * nw_w + rj // ws) * (ws * ws)
           + (ri % ws) * ws + rj % ws).reshape(-1)
    return fwd.astype(np.int32), inv.astype(np.int32)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))           # (2, ws, ws)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]                # (2, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)                                       # (N, N)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """SW-MSA attention mask (swin.py:423-443): (nW, N, N) of {0, -100}."""
    img = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wcs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wcs] = cnt
            cnt += 1
    m = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    m = m.reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class FusedLayerNorm(nn.Module):
    """``nn.LayerNorm`` drop-in: same 'scale'/'bias' param names and
    flax-default numerics (f32 fast-variance stats, eps under the rsqrt,
    rsqrt*scale then multiply), with a one-pass Pallas kernel for TPU
    inference (ops/layer_norm.py — XLA's two-fusion LN lowering measured
    ~15x off the HBM roofline at DHD-L stage-2 shapes).  ``use_kernel``
    is resolved by the caller (TPU + inference only, like the fused
    window attention)."""
    use_kernel: bool = False
    dtype: Dtype = jnp.float32
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.use_kernel and c % 128 == 0:
            from dhd_tpu.ops.layer_norm import fused_layer_norm
            return fused_layer_norm(x, scale, bias,
                                    eps=self.epsilon).astype(self.dtype)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
        y = (xf - mu) * (jax.lax.rsqrt(var + self.epsilon) * scale) + bias
        return y.astype(self.dtype)


class DropPath(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return x * mask.astype(x.dtype) / keep


class WindowMSA(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    # fuse QK^T+bias+mask+softmax+AV in a Pallas kernel (inference on TPU;
    # the XLA path materializes the (nWB, h, N, N) attention tensor in HBM
    # ~4x per block — ops/window_attention.py)
    use_kernel: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        # x: (nWB, N, C)
        nwb, n, c = x.shape
        h = self.num_heads
        head_dim = c // h
        qkv = nn.Dense(c * 3, use_bias=True, dtype=self.dtype,
                       name="qkv")(x)

        ws = self.window_size
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, h), jnp.float32)
        idx = jnp.asarray(_relative_position_index(ws))
        bias = jnp.transpose(table[idx.reshape(-1)].reshape(n, n, h),
                             (2, 0, 1))                      # (h, N, N)

        if self.use_kernel:
            from dhd_tpu.ops.window_attention import (
                window_attention_pallas, window_attention_pallas_v2)
            m = (mask.astype(self.dtype) if mask is not None
                 else jnp.zeros((1, n, n), self.dtype))
            # v1's per-(window, head) dot loop is latency-bound (stage 2
            # measured ~1.1 ms/block vs a ~0.12 ms roofline); v2 batches
            # 128//hd heads per full-K MXU dot via block-diagonal tiles
            # and beats XLA at every Swin-B stage (round-5 artifact,
            # tools/check_attn_parity.py: 2.3x/1.9x/1.75x/1.2x) — use it
            # whenever the head count divides into whole groups.
            fn = (window_attention_pallas_v2
                  if h % max(1, 128 // head_dim) == 0
                  else window_attention_pallas)
            out = fn(qkv, bias.astype(self.dtype), m, heads=h)
            return nn.Dense(c, dtype=self.dtype, name="proj")(out)

        qkv = qkv.reshape(nwb, n, 3, h, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]   # (nWB, N, h, d)
        q = q * (head_dim ** -0.5)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(nwb // nw, nw, h, n, n) \
                + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(nwb, h, n, n)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1
                              ).astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(nwb, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: bool
    drop_path: float
    mlp_ratio: int = 4
    attn_kernel: bool = False
    ln_kernel: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int], train: bool = False):
        h, w = hw
        b, l, c = x.shape
        ws = self.window_size
        lnk = self.ln_kernel and not train
        shortcut = x
        y = FusedLayerNorm(use_kernel=lnk, dtype=self.dtype,
                           name="norm1")(x)
        y = y.reshape(b, h, w, c)
        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        if pad_b or pad_r:
            y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        shift = ws // 2 if self.shift else 0
        mask = (jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
                if shift else None)
        # inference: roll + partition (and below reverse + unroll + crop)
        # as ONE static row gather each — numerically identical to the
        # reshape/transpose formulation, but XLA's relayout lowering of
        # the latter measured 12.4 ms/step at DHD-L stage 3 (see
        # _window_perms).  Training keeps the transpose path (its
        # backward fuses; gather grad is a scatter).
        gather_path = not train
        if gather_path:
            fwd, _ = _window_perms(hp, wp, h, w, ws, shift)
            wins = jnp.take(y.reshape(b, hp * wp, c), jnp.asarray(fwd),
                            axis=1).reshape(-1, ws * ws, c)
        else:
            if shift:
                y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            wins = window_partition(y, ws)
        # the fused kernel is inference-only (no custom_vjp; training keeps
        # the XLA einsum path whose backward XLA fuses).  All head counts
        # use a kernel: the head-grouped v2 wherever heads divide into
        # whole 128-lane groups (all Swin-B stages), v1 otherwise (the
        # round-4 'heads <= 16 -> XLA' gate existed because v1's
        # per-(window, head) loop lost to XLA at stage 3; v2 supersedes it)
        wins = WindowMSA(self.dim, self.num_heads, ws,
                         use_kernel=(self.attn_kernel and not train),
                         dtype=self.dtype, name="attn")(wins, mask)
        if gather_path:
            _, inv = _window_perms(hp, wp, h, w, ws, shift)
            y = jnp.take(wins.reshape(b, -1, c), jnp.asarray(inv),
                         axis=1)                          # (B, h*w, C)
        else:
            y = window_reverse(wins, ws, hp, wp)
            if shift:
                y = jnp.roll(y, (shift, shift), axis=(1, 2))
            y = y[:, :h, :w].reshape(b, l, c)
        x = shortcut + DropPath(self.drop_path, name="dp1")(y, train)

        y = FusedLayerNorm(use_kernel=lnk, dtype=self.dtype,
                           name="norm2")(x)
        y = nn.Dense(c * self.mlp_ratio, dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="fc2")(y)
        return x + DropPath(self.drop_path, name="dp2")(y, train)


class PatchMerging(nn.Module):
    """Unfold-ordered 2x2 merge: channel layout [c, ky, kx] = c*4 + ky*2 + kx
    (swin.py:216-241), LN then Linear(4C -> 2C, no bias)."""
    out_dim: int
    ln_kernel: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int]):
        h, w = hw
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        h2, w2 = (h + 1) // 2, (w + 1) // 2
        x = x.reshape(b, h2, 2, w2, 2, c)
        x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))       # (B, h2, w2, C, 2, 2)
        x = x.reshape(b, h2 * w2, 4 * c)
        x = FusedLayerNorm(use_kernel=self.ln_kernel, dtype=self.dtype,
                           name="norm")(x)
        x = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                     name="reduction")(x)
        return x, (h2, w2)


class SwinTransformer(nn.Module):
    """Swin backbone; returns [stereo_feat?] + [normed out_indices feats] as
    NHWC maps (swin.py:946-971)."""
    embed_dims: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 12
    out_indices: Tuple[int, ...] = (2, 3)
    drop_path_rate: float = 0.1
    return_stereo_feat: bool = True
    # rematerialize each block in the backward (reference with_cp; on TPU
    # this is what fits DHD-L 512x1408 training into one chip's HBM)
    remat: bool = False
    # fused Pallas window attention for inference (config.attn_method)
    attn_kernel: bool = False
    # fused one-pass Pallas LayerNorm for inference (config.ln_method)
    ln_kernel: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, stage0_only: bool = False):
        b = x.shape[0]
        lnk = self.ln_kernel and not train
        x = nn.Conv(self.embed_dims, (4, 4), strides=4, dtype=self.dtype,
                    name="patch_embed")(x)
        hw = x.shape[1:3]
        x = x.reshape(b, hw[0] * hw[1], self.embed_dims)
        x = FusedLayerNorm(use_kernel=lnk, dtype=self.dtype,
                           name="patch_norm")(x)

        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1)
               for i in range(total)]
        outs = []
        dim = self.embed_dims
        blk_id = 0
        block_cls = (nn.remat(SwinBlock, static_argnums=(2, 3))
                     if self.remat else SwinBlock)
        for i, depth in enumerate(self.depths):
            for d in range(depth):
                x = block_cls(dim, self.num_heads[i], self.window_size,
                              shift=(d % 2 == 1), drop_path=dpr[blk_id],
                              attn_kernel=self.attn_kernel,
                              ln_kernel=self.ln_kernel,
                              dtype=self.dtype,
                              name=f"stage{i}_block{d}")(x, hw, train)
                blk_id += 1
            out, out_hw = x, hw
            if i < len(self.depths) - 1:
                x, hw = PatchMerging(dim * 2, ln_kernel=lnk,
                                     dtype=self.dtype,
                                     name=f"downsample{i}")(x, hw)
                dim *= 2
            if i == 0 and (self.return_stereo_feat or stage0_only):
                feat = out.reshape(b, *out_hw, out.shape[-1])
                if stage0_only:
                    return feat
                outs.append(feat)
            if i in self.out_indices:
                y = FusedLayerNorm(use_kernel=lnk, dtype=self.dtype,
                                   name=f"norm{i}")(out)
                outs.append(y.reshape(b, *out_hw, y.shape[-1]))
        return outs
