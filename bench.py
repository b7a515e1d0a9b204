"""End-to-end throughput benchmark (the tools/analysis_tools/benchmark.py
equivalent): DHD-S 6-camera inference frames/sec on one chip, bf16.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

Methodology: iterations are *chained* (each input perturbed by a scalar
derived from the previous output) and the loop ends with a host read of a
scalar, so neither result caching nor async dispatch in the device tunnel can
fake the timing.

The reference publishes no throughput numbers (BASELINE.md); we normalize
against an estimated 10 fps for DHD-S in PyTorch on an A100-class GPU
(BEVDet-R50-family models measure ~15 fps per the BEVPoolv2 report
arXiv 2211.17111; DHD-S adds HeightNet + 3 UNet slab encoders), so
vs_baseline > 1.0 means faster than the reference-class GPU baseline.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 10.0


def main() -> None:
    from dhd_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    from dhd_tpu.config import get_config
    from dhd_tpu.data import synthetic_batch
    from dhd_tpu.models import DHDNet
    from dhd_tpu.models.dhd import build_batch_pool_plan

    batch_size = 1
    cfg = get_config("dhd_s")
    model = DHDNet(cfg, dtype=jnp.bfloat16)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, batch_size=batch_size,
                                         with_gt=False).items()}
    init = jax.jit(lambda rng, b: model.init(rng, b, train=False))
    variables = jax.block_until_ready(init(jax.random.PRNGKey(0), batch))
    # serving configuration: the voxel-pooling plan (sort order + kernel
    # visit tables) is geometry-only, precomputed once per camera rig —
    # the reference benchmark's 'accelerate' mode
    # (tools/analysis_tools/benchmark.py:83-84)
    batch["pool_plan"] = jax.jit(
        lambda b: build_batch_pool_plan(cfg, b))(batch)

    @jax.jit
    def step(variables, batch, carry):
        b = dict(batch)
        # chain iterations: perturb the images by a scalar derived from the
        # previous output so every step must actually execute.
        b["imgs"] = batch["imgs"] + carry.astype(batch["imgs"].dtype)
        out = model.apply({"params": variables["params"],
                           "batch_stats": variables["batch_stats"]},
                          b, train=False)["occ_logits"]
        new_carry = jnp.tanh(jnp.mean(out)) * 1e-6
        return new_carry

    carry = jnp.zeros((), jnp.float32)
    # compile + warmup (forced to completion by the host read)
    t0 = time.perf_counter()
    carry = step(variables, batch, carry)
    _ = float(carry)
    print(f"compile: {time.perf_counter() - t0:.1f}s on {jax.devices()[0]}",
          file=sys.stderr)
    for _ in range(3):
        carry = step(variables, batch, carry)
    _ = float(carry)

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = step(variables, batch, carry)
    _ = float(carry)          # host round-trip: forces full completion
    dt = time.perf_counter() - t0
    fps = iters * batch_size / dt

    # context for the absolute number: ~934 GFLOPs/forward (XLA cost
    # analysis, README) vs the chip's bf16 peak
    dev = jax.devices()[0]
    peak_tflops = 197.0 if "v5 lite" in str(dev) else float("nan")
    mfu = fps * 934e9 / (peak_tflops * 1e12)
    print(f"chip: {dev}; est. MFU {mfu * 100:.1f}% "
          f"(934 GFLOP/fwd @ {peak_tflops:.0f} TFLOP/s bf16 peak); "
          f"vs_baseline denominator {BASELINE_FPS} fps is an ESTIMATE "
          f"(BEVPoolv2 report, arXiv 2211.17111) — no GPU available to "
          f"measure the reference", file=sys.stderr)
    print(json.dumps({
        "metric": "dhd_s_6cam_inference_tpu_v5e",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
