"""On-hardware parity + timing for the fused Pallas window-attention kernel
(ops/window_attention.py) vs the XLA einsum path, at real DHD-L stage shapes.

This is the same treatment the pool and cost-volume kernels got (README
"on-hardware parity" notes): the interpret-mode test in tests/test_swin.py
pins the math at tiny shapes; this script pins the *compiled TPU lowering*
at the shapes the kernel actually runs in production — every Swin-B stage
(heads 4/8/16/32), shifted and unshifted masks, bf16 — and re-measures the
per-stage speed so the `num_heads <= 16` gate in nn/swin.py:163-170 rests
on more than one observation.

Parity bar: the kernel intentionally deviates from XLA at bf16-rounding
level (scores stay f32; softmax denominator folded post-AV — see the kernel
docstring), so the check is "max |diff| within a few bf16 ulp of the output
scale", not bit-exactness.

Reference numerics being validated: models/backbones/swin.py:305-352.

Usage:  python tools/check_attn_parity.py [--iters 30]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dhd_tpu.nn.swin import _shift_attn_mask
from dhd_tpu.ops.window_attention import (window_attention_pallas,
                                          window_attention_pallas_v2)

# DHD-L: 6 cams, input 512x1408, patch stride 4 -> stage-0 map 128x352,
# window 12 (padded to multiples of 12 per stage).  (hp, wp) after padding,
# dim and heads per Swin-B stage.
B = 6
WS = 12
STAGES = [
    # (stage, hp, wp, dim, heads)
    (0, 132, 360, 128, 4),
    (1, 72, 180, 256, 8),
    (2, 36, 96, 512, 16),
    (3, 24, 48, 1024, 32),
]


@functools.partial(jax.jit, static_argnums=(3,))
def _xla_path(qkv, bias, mask, heads):
    """The exact einsum composition from nn/swin.py WindowMSA (XLA path)."""
    w, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    qr = qkv.reshape(w, n, 3, heads, hd)
    q, k, v = qr[:, :, 0], qr[:, :, 1], qr[:, :, 2]
    q = q * (hd ** -0.5)
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) + bias[None].astype(q.dtype)
    nw = mask.shape[0]
    attn = attn.reshape(w // nw, nw, heads, n, n) \
        + mask[None, :, None].astype(attn.dtype)
    attn = attn.reshape(w, heads, n, n)
    p = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(qkv.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v).reshape(w, n, c)


def _time(fn, qkv, bias, mask, heads, iters):
    """Per-call ms via ONE jit running `iters` chained calls in an
    on-device fori_loop ending in a host read — through the axon tunnel
    block_until_ready does not actually block and dispatch costs
    ~1.2 ms/call, so a naive loop measures the dispatch floor."""
    @jax.jit
    def run(qkv, bias, mask, n):
        def body(_, c):
            out = fn(qkv + c.astype(qkv.dtype), bias, mask, heads)
            return jnp.tanh(jnp.sum(out[0, 0, :8].astype(jnp.float32))
                            ) * 1e-9
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    _ = float(run(qkv, bias, mask, 1))          # compile + warm
    t0 = time.perf_counter()
    _ = float(run(qkv, bias, mask, iters))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    rng = np.random.default_rng(0)
    worst = 0.0
    for stage, hp, wp, dim, heads in STAGES:
        n = WS * WS
        nw_img = (hp // WS) * (wp // WS)
        w = B * nw_img
        qkv = jnp.asarray(rng.normal(0, 1, (w, n, 3 * dim)),
                          jnp.bfloat16)
        bias = jnp.asarray(rng.normal(0, 1, (heads, n, n)), jnp.bfloat16)
        shift_mask = jnp.asarray(_shift_attn_mask(hp, wp, WS, WS // 2),
                                 jnp.bfloat16)
        zero_mask = jnp.zeros((1, n, n), jnp.bfloat16)
        for label, mask in (("unshift", zero_mask), ("shift", shift_mask)):
            ref = np.asarray(_xla_path(qkv, bias, mask, heads),
                             np.float32)
            out = np.asarray(
                window_attention_pallas(qkv, bias, mask, heads=heads),
                np.float32)
            out2 = np.asarray(
                window_attention_pallas_v2(qkv, bias, mask, heads=heads),
                np.float32)
            # bf16 ulp at the output's scale (|out| ~ few units after
            # softmax-weighted averaging of unit-normal v)
            scale = np.abs(ref).max()
            ulp = float(np.spacing(np.float32(scale), dtype=np.float32)
                        ) * 2 ** (23 - 7)       # f32 ulp -> bf16 ulp
            diff = np.abs(out - ref).max()
            diff2 = np.abs(out2 - ref).max()
            worst = max(worst, diff / ulp, diff2 / ulp)
            t_xla = _time(_xla_path, qkv, bias, mask, heads, args.iters)
            t_pal = _time(
                lambda q, b, m, h: window_attention_pallas(q, b, m,
                                                           heads=h),
                qkv, bias, mask, heads, args.iters)
            t_v2 = _time(
                lambda q, b, m, h: window_attention_pallas_v2(q, b, m,
                                                              heads=h),
                qkv, bias, mask, heads, args.iters)
            print(f"stage{stage} heads={heads:2d} W={w:5d} {label:7s}: "
                  f"max|diff| v1={diff:.3e} v2={diff2:.3e} "
                  f"({max(diff, diff2)/ulp:5.2f} bf16-ulp @ "
                  f"scale {scale:.1f})  xla {t_xla:7.3f} ms  "
                  f"v1 {t_pal:7.3f} ms  v2 {t_v2:7.3f} ms  "
                  f"best-speedup {t_xla/min(t_pal, t_v2):5.2f}x", flush=True)
    print(f"worst-case diff: {worst:.2f} bf16 ulp "
          f"({'PASS' if worst <= 4 else 'FAIL'} at <=4 ulp bar)")
    return 0 if worst <= 4 else 1


if __name__ == "__main__":
    sys.exit(main())
