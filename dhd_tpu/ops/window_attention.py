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


def _kernel_v2(qkv_ref, biasp_ref, maskt_ref, hmask_ref, out_ref, *,
               g: int, n: int, c: int, heads: int, hg: int, scale: float):
    """Head-grouped variant: hg heads per MXU dot via block-diagonal tiles.

    v1 issues one (N, hd) x (hd, N) dot per (window, head) — at Swin-B
    stage 2 (heads=16, hd=32) that is K=32 (25% of the systolic K) and
    2304 tiny dots per block: measured ~1.1 ms against a ~0.12 ms
    roofline (latency-bound).  Here hg heads ride ONE dot pair with
    K = hg*hd = 128: scores S = q_g (N, 128) @ ktile^T where ktile
    (hg*N, 128) is the k-group tiled hg times down the sublanes and
    masked block-diagonally (head j's rows keep only its hd lanes), so
    S[:, j*N:(j+1)*N] is exactly head j's (N, N) score block.  The output
    AV dot uses the same vtile and lands all hg heads' outputs in their
    packed lane positions in one (N, hg*N) @ (hg*N, 128) dot.  The extra
    zero-block FLOPs are hg x, but the dots are full-K MXU work instead
    of a latency-bound loop.

    Softmax exactness: the row max is taken over ALL hg*N lanes — a
    per-row constant, and softmax is shift-invariant per head group, so
    subtracting the whole-row max is mathematically the per-head softmax
    (a colder head's exp may underflow a few denormal terms XLA would
    keep; ~e^-80 relative, far below bf16 resolution).  The denominator
    is folded post-AV per head via two tiny 0/1 matmuls.
    """
    nt = jax.lax.dot_general
    ng = c // (hg * (c // heads))
    gw = hg * n                                          # group width
    hmask = hmask_ref[...]                               # (hg*N, hg*hd) 0/1
    # denominator group-sum / expand matrices from iota compares (cheap,
    # per grid step, VPU)
    lane_g = jax.lax.broadcasted_iota(jnp.int32, (gw, hg), 1)
    row_g = jax.lax.broadcasted_iota(jnp.int32, (gw, hg), 0) // n
    gsum = (row_g == lane_g).astype(jnp.float32)         # (hg*N, hg)
    hd = c // heads
    lane_e = jax.lax.broadcasted_iota(jnp.int32, (hg, hg * hd), 1) // hd
    row_e = jax.lax.broadcasted_iota(jnp.int32, (hg, hg * hd), 0)
    gexp = (row_e == lane_e).astype(jnp.float32)         # (hg, hg*hd)
    for wi in range(g):
        maskt = maskt_ref[wi].astype(jnp.float32)        # (N, hg*N)
        for gi in range(ng):
            base = gi * hg * hd
            q = qkv_ref[wi, :, base:base + hg * hd]
            k = qkv_ref[wi, :, c + base:c + base + hg * hd]
            v = qkv_ref[wi, :, 2 * c + base:2 * c + base + hg * hd]
            q = q * jnp.asarray(scale, q.dtype)
            ktile = jnp.concatenate([k] * hg, axis=0) * hmask
            vtile = jnp.concatenate([v] * hg, axis=0) * hmask
            s = nt(q, ktile, (((1,), (1,)), ((), ())),
                   preferred_element_type=jnp.float32)   # (N, hg*N)
            s = s + biasp_ref[gi].astype(jnp.float32) + maskt
            e = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
            o = nt(e.astype(q.dtype), vtile, (((1,), (0,)), ((), ())),
                   preferred_element_type=jnp.float32)   # (N, hg*hd)
            den = nt(e, gsum, (((1,), (0,)), ((), ())),
                     preferred_element_type=jnp.float32)  # (N, hg)
            den = nt(den, gexp, (((1,), (0,)), ((), ())),
                     preferred_element_type=jnp.float32)  # (N, hg*hd)
            out_ref[wi, :, base:base + hg * hd] = (o / den).astype(q.dtype)


def _pick_group(divisor_of: int, n: int, c: int) -> int:
    """Windows per grid step: the largest divisor of ``divisor_of`` whose
    qkv block stays under ~2 MB (pipelining double-buffers the block)."""
    budget = max(1, (2 << 20) // max(1, n * 3 * c * 2))
    for g in range(min(divisor_of, budget), 0, -1):
        if divisor_of % g == 0:
            return g
    return 1


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def window_attention_pallas_v2(qkv: jnp.ndarray, bias: jnp.ndarray,
                               mask: jnp.ndarray, heads: int,
                               interpret: bool = False) -> jnp.ndarray:
    """Head-grouped fused window MSA (see _kernel_v2).

    Same contract as :func:`window_attention_pallas`; preferred at
    heads >= 16 (Swin-B stages 2-3), where v1's per-(window, head) dot
    loop is latency-bound.  head_dim must divide 128.
    """
    w, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    n_img = mask.shape[0]
    hg = max(1, min(heads, 128 // hd))
    assert c % heads == 0 and heads % hg == 0, (c, heads, hg)
    assert w % n_img == 0, (w, n_img)
    ng = heads // hg
    # bias packed per group: (ng, N, hg*N) with head j's (N, N) block in
    # lanes j*N..(j+1)*N; mask tiled hg x along lanes; block-diagonal
    # head mask (hg*N, hg*hd).  All host/XLA-side constants per call.
    biasp = jnp.transpose(bias.reshape(ng, hg, n, n),
                          (0, 2, 1, 3)).reshape(ng, n, hg * n)
    maskt = jnp.tile(mask, (1, 1, hg))
    hmask = (jax.lax.broadcasted_iota(jnp.int32, (hg * n, hg * hd), 0) // n
             == jax.lax.broadcasted_iota(
                 jnp.int32, (hg * n, hg * hd), 1) // hd
             ).astype(qkv.dtype)
    if n_img == 1:
        g = _pick_group(w, n, c)
        maskt = jnp.broadcast_to(maskt, (g, n, hg * n))
        mask_spec = pl.BlockSpec((g, n, hg * n), lambda i: (0, 0, 0))
    else:
        g = _pick_group(n_img, n, c)
        mask_spec = pl.BlockSpec((g, n, hg * n),
                                 lambda i: (i % (n_img // g), 0, 0))
    kernel = functools.partial(_kernel_v2, g=g, n=n, c=c, heads=heads,
                               hg=hg, scale=hd ** -0.5)
    return pl.pallas_call(
        kernel,
        grid=(w // g,),
        in_specs=[
            pl.BlockSpec((g, n, 3 * c), lambda i: (i, 0, 0)),
            pl.BlockSpec((ng, n, hg * n), lambda i: (0, 0, 0)),
            mask_spec,
            pl.BlockSpec((hg * n, hg * hd), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((g, n, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((w, n, c), qkv.dtype),
        interpret=interpret,
    )(qkv, biasp, maskt, hmask)


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
