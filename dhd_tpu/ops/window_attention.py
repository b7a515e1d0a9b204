"""Pallas TPU kernel for Swin window attention (inference path).

The XLA lowering of window MSA (nn/swin.py WindowMSA) materializes the
(nW*B, heads, N, N) attention tensor in HBM four times per block — QK^T
write, bias+mask add, f32 softmax, AV read — plus two layout copies of the
qkv tensor ((nWB, N, 3, h, d) relayouts measured 1.2 ms each at DHD-L
stage-0 scale).  At DHD-L shapes that is ~1.4 G attention elements per
forward (~3 GB of bf16 HBM traffic before the f32 softmax doubles it), and
profiling attributes ~25 ms of the 196 ms streaming step to these ops.

This kernel fuses QK^T + relative-position bias + shift mask + softmax + AV
per (window, head) entirely in VMEM: one grid step owns G windows, loops
windows x heads with static unrolls, and touches HBM only for the raw qkv
block in and the attention output out.  The (N, N) attention matrix never
leaves VMEM.  Matmul shapes are the same small (N, d)x(N, d)^T dots XLA
runs (MXU utilization is bounded by head_dim=32 either way) — the win is
pure memory traffic + convert elimination.

Numerics follow the XLA path's structure (bf16 q*scale, dots with f32
accumulation, bias/mask add, x-max/exp/sum softmax, AV) with two
intentional deviations: scores stay f32 end-to-end (the XLA path rounds
QK^T through bf16 before its f32 softmax — f32 here is strictly tighter),
and the softmax denominator is folded into a row-scale AFTER the AV dot
(whose numerator is bf16).  Outputs are therefore NOT bit-identical
across attn_method settings — differences are bf16-rounding-level and
benign for inference; tests/test_swin.py pins interpret-mode parity and
tools/check_attn_parity.py pins the compiled-TPU lowering at real DHD-L
stage shapes (all four head counts, shifted + unshifted — results in
README "Performance notes").

Reference behaviour being reproduced: models/backbones/swin.py:305-352
(WindowMSA.forward: qkv split, scaled QK^T, relative_position_bias, shift
mask add, softmax, AV).

Used for inference only (no custom_vjp — training keeps the XLA einsum
path, whose backward XLA already fuses well; the flag is resolved in
nn/swin.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(qkv_ref, bias_ref, mask_ref, out_ref, *,
            g: int, n: int, c: int, heads: int, scale: float):
    hd = c // heads
    nt = jax.lax.dot_general  # noqa: E741  (shorthand)
    for wi in range(g):
        mask = mask_ref[wi].astype(jnp.float32)
        for h in range(heads):
            q = qkv_ref[wi, :, h * hd:(h + 1) * hd]          # (N, hd) bf16
            k = qkv_ref[wi, :, c + h * hd:c + (h + 1) * hd]
            v = qkv_ref[wi, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
            q = q * jnp.asarray(scale, q.dtype)
            # s[n, m] = sum_d q[n, d] * k[m, d]  (contract both minors).
            # Scores stay f32 end-to-end (the XLA path round-trips through
            # bf16 before its f32 softmax; f32 here is strictly tighter).
            s = nt(q, k, (((1,), (1,)), ((), ())),
                   preferred_element_type=jnp.float32)
            s = s + bias_ref[h].astype(jnp.float32) + mask
            e = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
            # softmax denominator folded into a row-scale of the AV output:
            # one (N, hd) multiply instead of an (N, N) divide
            o = nt(e.astype(q.dtype), v, (((1,), (0,)), ((), ())),
                   preferred_element_type=jnp.float32)
            o = o / jnp.sum(e, axis=-1, keepdims=True)
            out_ref[wi, :, h * hd:(h + 1) * hd] = o.astype(q.dtype)


def _pick_group(divisor_of: int, n: int, c: int) -> int:
    """Windows per grid step: the largest divisor of ``divisor_of`` whose
    qkv block stays under ~2 MB (pipelining double-buffers the block)."""
    budget = max(1, (2 << 20) // max(1, n * 3 * c * 2))
    for g in range(min(divisor_of, budget), 0, -1):
        if divisor_of % g == 0:
            return g
    return 1


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def window_attention_pallas(qkv: jnp.ndarray, bias: jnp.ndarray,
                            mask: jnp.ndarray, heads: int,
                            interpret: bool = False) -> jnp.ndarray:
    """Fused window MSA: softmax(q k^T * scale + bias + mask) v.

    Args:
      qkv: (W, N, 3C) raw qkv-dense output, feature order [q|k|v] x
        [head0..headH] x [d0..dhd] (flax Dense + (3, h, d) reshape order).
      bias: (heads, N, N) relative-position bias in qkv.dtype.
      mask: (nW_img, N, N) additive shift mask in qkv.dtype; W must be a
        multiple of nW_img (window w uses mask[w % nW_img]).  Pass a
        (1, N, N) zero mask for unshifted blocks.
    Returns:
      (W, N, C) attention output (pre-proj), qkv.dtype.
    """
    w, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    n_img = mask.shape[0]
    # misuse must fail loudly at trace time: grid=(w//g,) floors, so a W
    # that g does not divide would silently leave trailing output windows
    # unwritten, and W % n_img != 0 would misalign the shifted masks
    assert c % heads == 0, (c, heads)
    assert w % n_img == 0, (w, n_img)
    if n_img == 1:
        # unshifted: any group dividing W works; the one zero mask repeats
        g = _pick_group(w, n, c)
        mask = jnp.broadcast_to(mask, (g, n, n))
        mask_spec = pl.BlockSpec((g, n, n), lambda i: (0, 0, 0))
    else:
        # shifted: the group must divide the per-image window count so each
        # grid step's windows map to one contiguous mask block (window w
        # uses mask[w % n_img] and W is a multiple of n_img)
        g = _pick_group(n_img, n, c)
        mask_spec = pl.BlockSpec((g, n, n),
                                 lambda i: (i % (n_img // g), 0, 0))
    kernel = functools.partial(_kernel, g=g, n=n, c=c, heads=heads,
                               scale=hd ** -0.5)
    return pl.pallas_call(
        kernel,
        grid=(w // g,),
        in_specs=[
            pl.BlockSpec((g, n, 3 * c), lambda i: (i, 0, 0)),
            pl.BlockSpec((heads, n, n), lambda i: (0, 0, 0)),
            mask_spec,
        ],
        out_specs=pl.BlockSpec((g, n, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((w, n, c), qkv.dtype),
        interpret=interpret,
    )(qkv, bias, mask)
