"""Measure bf16-vs-fp32 prediction drift at real model scale (SURVEY §7
hard-part 5; reference fp32 islands: detectors/bevdet.py:46,
losses/semkitti_loss.py).

Runs each preset's full forward twice with the SAME fp32 random-init
parameters — once with bf16 compute, once with fp32 compute — and reports
the fraction of voxels whose argmax class flips.  Random-init logits are
near-uniform (the least favourable case for argmax stability), so the flip
rate is an upper bound on the numeric-noise contribution to mIoU drift.

Usage:  python tools/measure_drift.py [preset ...]   (default: s m l)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dhd_tpu.config import get_config
from dhd_tpu.data import synthetic_batch
from dhd_tpu.models import build_model


def measure(preset: str) -> float:
    cfg = get_config(preset)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, batch_size=1,
                                         with_gt=False).items()}
    m32 = build_model(cfg, dtype=jnp.float32)
    m16 = build_model(cfg, dtype=jnp.bfloat16)
    variables = jax.jit(lambda r, b: m32.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)

    preds = []
    for m in (m32, m16):
        logits = jax.jit(lambda v, b, m=m: m.apply(
            v, b, train=False)["occ_logits"])(variables, batch)
        preds.append(jax.device_get(jnp.argmax(logits, -1)))
        del logits
    flip = float((preds[0] != preds[1]).mean())
    print(f"{preset}: bf16 argmax flip rate {flip:.4%}", flush=True)
    return flip


if __name__ == "__main__":
    presets = sys.argv[1:] or ["dhd_s", "dhd_m", "dhd_l"]
    for p in presets:
        measure(p)
