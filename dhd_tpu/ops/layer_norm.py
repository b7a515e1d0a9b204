"""Pallas TPU kernel: one-pass fused LayerNorm (inference path).

Why: XLA lowers each Swin LayerNorm (nn/swin.py) to a stats fusion
(f32 mean / E[x^2] over the lane dim, plus a bf16 copy of x) and a
separate apply fusion, with f32 intermediates materialized between them.
The round-5 DHD-L streaming device trace attributes ~17.6 ms/step to the
stats fusions alone (30 `convert_reduce_fusion` ids); the worst class is
stage 2's 18 blocks x 2 LNs on bf16[6, 2816, 512] — ~0.67 ms each, i.e.
~52 GB/s effective for a tensor that is 17.3 MB: 15x off the HBM
roofline, on a pure read-normalize-write op.

This kernel does the whole LN in one pass over VMEM row tiles: load a
(block_r, C) bf16 tile, compute f32 row stats, normalize, scale/shift,
write bf16.  HBM traffic is exactly read-x + write-y.

Numerics mirror flax ``nn.LayerNorm`` defaults op-for-op (the module this
replaces in nn/swin.py): f32 stats (force_float32_reductions), fast
variance E[|x|^2] - |E[x]|^2 clipped at 0, eps added under the rsqrt,
f32 normalize/affine, cast to the output dtype.  The only deviation is
lane-reduction ORDER inside the tile (bf16-rounding-level; pinned by
tests/test_layer_norm.py against nn.LayerNorm).

Reference behaviour being reproduced: the torch ``nn.LayerNorm`` calls in
models/backbones/swin.py (norm1/norm2 per block :305, PatchMerging norm
:223, patch_embed/out norms :712, :957).

Inference-only (no custom_vjp): training keeps the flax path, whose
backward XLA fuses; gating happens in nn/swin.py exactly like the fused
window-attention kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)                    # (block_r, C)
    c = x.shape[-1]
    mu = jnp.sum(x, axis=-1, keepdims=True) / c
    var = jnp.sum(x * x, axis=-1, keepdims=True) / c - mu * mu
    var = jnp.maximum(var, 0.0)                           # flax clips
    # flax op order: mul = rsqrt(var+eps) * scale; y = (x-mean)*mul + bias
    mul = jax.lax.rsqrt(var + eps) * g_ref[...].astype(jnp.float32)
    y = (x - mu) * mul + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                     eps: float = 1e-6, interpret: bool = False
                     ) -> jnp.ndarray:
    """LayerNorm over the last axis, one HBM pass, flax-default numerics.

    Args:
      x: (..., C) input; C must be a multiple of 128 (every Swin-B C is).
      scale, bias: (C,) f32 affine params (flax LN 'scale'/'bias').
    Returns: (..., C) in x.dtype.
    """
    orig_shape = x.shape
    c = orig_shape[-1]
    assert c % 128 == 0, c
    r = 1
    for d in orig_shape[:-1]:
        r *= d
    x2 = x.reshape(r, c)
    # ~2 MB bf16 input tile (double-buffered by the pipeline); partial
    # trailing blocks are safe — rows are independent and OOB writes are
    # masked by the block machinery
    block_r = max(8, min(2048, (2 << 20) // (c * 2)))
    grid = (r + block_r - 1) // block_r
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_r, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_r, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r, c), x.dtype),
        interpret=interpret,
    )(x2, scale.reshape(1, c), bias.reshape(1, c))
    return out.reshape(orig_shape)
