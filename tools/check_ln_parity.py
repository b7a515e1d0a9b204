"""On-hardware parity + timing for the fused Pallas LayerNorm
(ops/layer_norm.py) vs flax nn.LayerNorm, at real DHD-L Swin-B shapes.

Same treatment the pool/CV/attention kernels got: interpret-mode tests
(tests/test_layer_norm.py) pin the math at tiny shapes; this pins the
compiled TPU lowering at the LN sites the kernel actually replaces —
every Swin-B stage's token count and width, bf16, including the
PatchMerging 4C pre-reduction norms.

Parity bar: op-for-op identical formulation (flax order: f32 fast-variance
stats, rsqrt*scale then multiply); only the lane-reduction order may
differ, so the bar is a few bf16 ulp at the output scale (|y| ~ O(1) by
construction after normalization).

Usage:  python tools/check_ln_parity.py [--iters 30]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dhd_tpu.ops.layer_norm import fused_layer_norm

# DHD-L: 6 cams, stage-i token map (rows from 512x1408 /4 per stage), plus
# the PatchMerging 4C norms between stages.
SHAPES = [
    ("stage0 LN", (6, 45056, 128)),
    ("merge0 4C", (6, 11264, 512)),
    ("stage1 LN", (6, 11264, 256)),
    ("merge1 4C", (6, 2816, 1024)),
    ("stage2 LN", (6, 2816, 512)),
    ("merge2 4C", (6, 704, 2048)),
    ("stage3 LN", (6, 704, 1024)),
]


def _time(fn, x, g, b, iters):
    """Chained on-device fori_loop ending in a host read (the axon tunnel's
    block_until_ready does not block; dispatch costs ~1.2 ms/call)."""
    @jax.jit
    def run(x, g, b, n):
        def body(_, c):
            out = fn(x + c.astype(x.dtype), g, b)
            return jnp.tanh(jnp.sum(out[0, 0, :8].astype(jnp.float32))
                            ) * 1e-9
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    _ = float(run(x, g, b, 1))
    t0 = time.perf_counter()
    _ = float(run(x, g, b, iters))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    rng = np.random.default_rng(0)
    worst = 0.0
    for label, shape in SHAPES:
        c = shape[-1]
        x = jnp.asarray(rng.normal(0, 2, shape), jnp.bfloat16)
        g = jnp.asarray(rng.normal(1, 0.2, (c,)).astype(np.float32))
        b = jnp.asarray(rng.normal(0, 0.5, (c,)).astype(np.float32))

        def xla_ln(x, g, b):
            return nn.LayerNorm(dtype=jnp.bfloat16).apply(
                {"params": {"scale": g, "bias": b}}, x)

        ref = np.asarray(jax.jit(xla_ln)(x, g, b), np.float32)
        out = np.asarray(fused_layer_norm(x, g, b), np.float32)
        scale = np.abs(ref).max()
        ulp = float(np.spacing(np.float32(scale), dtype=np.float32)
                    ) * 2 ** (23 - 7)
        diff = np.abs(out - ref).max()
        worst = max(worst, diff / ulp)
        t_xla = _time(jax.jit(xla_ln), x, g, b, args.iters)
        t_pal = _time(fused_layer_norm, x, g, b, args.iters)
        mb = x.size * 2 * 2 / 1e6
        print(f"{label:10s} {str(shape):18s}: max|diff|={diff:.3e} "
              f"({diff/ulp:5.2f} bf16-ulp @ scale {scale:.1f})  "
              f"xla {t_xla:7.3f} ms  pallas {t_pal:7.3f} ms  "
              f"speedup {t_xla/t_pal:5.2f}x  "
              f"({mb/t_pal:.0f} GB/s eff)", flush=True)
    print(f"worst-case diff: {worst:.2f} bf16 ulp "
          f"({'PASS' if worst <= 4 else 'FAIL'} at <=4 ulp bar)")
    return 0 if worst <= 4 else 1


if __name__ == "__main__":
    sys.exit(main())
