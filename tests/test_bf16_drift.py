"""bf16-vs-fp32 numeric drift on the occupancy predictions (SURVEY §7
hard-part 5: the reference forces fp32 islands — detectors/bevdet.py:46,
losses/semkitti_loss.py — while this rebuild runs the model in bf16 with
fp32 losses; the budget is < 0.2 mIoU drift).

The drift measured here is *prediction* drift on the synthetic fixture:
the same fp32 parameters applied with bf16 vs fp32 compute, compared by
voxel class-flip rate and by fixture-mIoU delta.  Real-checkpoint drift
on nuScenes needs the released weights (ckpts/ holds stubs only).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dhd_tpu.config import get_config
from dhd_tpu.data import synthetic_batch
from dhd_tpu.models import build_model


@pytest.mark.slow
def test_bf16_prediction_drift_small():
    cfg = get_config("dhd_tiny")
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, batch_size=2,
                                         with_gt=True).items()}
    m32 = build_model(cfg, dtype=jnp.float32)
    m16 = build_model(cfg, dtype=jnp.bfloat16)
    variables = jax.jit(lambda r, b: m32.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)

    p32 = jnp.argmax(jax.jit(
        lambda v, b: m32.apply(v, b, train=False)["occ_logits"])(
        variables, batch), -1)
    p16 = jnp.argmax(jax.jit(
        lambda v, b: m16.apply(v, b, train=False)["occ_logits"])(
        variables, batch), -1)

    flip = float(jnp.mean((p32 != p16).astype(jnp.float32)))
    # random-init logits are near-uniform — the least favourable case for
    # argmax stability; trained logits have larger margins.  A few percent
    # of voxels flipping here bounds the bf16 numeric noise.
    assert flip < 0.05, f"bf16 flipped {flip:.1%} of voxels"

    # fixture-mIoU delta between the two precision modes
    from dhd_tpu.eval.miou import MIoUMetric
    sem = batch["voxel_semantics"]
    mask = batch["mask_camera"]
    mious = []
    for p in (p32, p16):
        met = MIoUMetric(num_classes=cfg.num_classes,
                         num_eval_classes=cfg.num_classes - 1)
        met.add_batch(p, sem, mask)
        mious.append(met.compute()[0] * 100)
    assert abs(mious[0] - mious[1]) < 0.2, \
        f"bf16 mIoU drift {abs(mious[0] - mious[1]):.3f} > 0.2 budget"
