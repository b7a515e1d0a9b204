"""Int8 post-training quantization (the TRT-int8 deploy analogue).

Covers: calibration captures every targeted conv, the int8 model's
occupancy predictions stay close to fp (voxel flip rate), and the
quantized function round-trips through jax.export like the fp one
(reference: tools/convert_bevdet_to_TRT.py:42-120, benchmark_trt.py:68).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhd_tpu.config import get_config
from dhd_tpu.data import synthetic_batch
from dhd_tpu.models import build_model
from dhd_tpu.nn.quant import calibrate_int8, quantize_fn

PREFIXES = ("img_encoder/backbone",)


def test_int8_conv_matches_fp_small_net():
    """Fast-lane unit check: calibrate + quantize a 2-conv net; int8 output
    within ~2% of fp (weights/activations per-channel/per-tensor 8-bit)."""
    from flax import linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), strides=2, padding=1, use_bias=False,
                        dtype=jnp.bfloat16, name="c1")(x)
            x = nn.relu(x)
            return nn.Conv(4, (1, 1), dtype=jnp.bfloat16, name="c2")(x)

    net = Net()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    v = net.init(jax.random.PRNGKey(1), x)
    fp = lambda b: net.apply(v, b)                       # noqa: E731
    scales = calibrate_int8(fp, [x], prefixes=("c",))
    assert set(scales) == {"c1", "c2"}
    yq = jax.jit(quantize_fn(fp, scales, prefixes=("c",)))(x)
    y = fp(x)
    err = np.abs(np.asarray(yq, np.float32) - np.asarray(y, np.float32))
    assert err.max() / np.abs(np.asarray(y, np.float32)).max() < 0.03


def test_calibration_remat_free_twin_matches():
    """Regression for the DHD-S-scale failure: amax recording leaks tracers
    under nn.remat (UnexpectedTracerError), so calibration runs on a
    remat-free twin — whose scales must equal the remat'd model's would-be
    scales (remat is output-invariant), and quantize_fn itself must work
    fine under remat."""
    import pytest
    from flax import linen as nn

    class Block(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.relu(nn.Conv(8, (3, 3), padding=1, name="c")(x))

    class Net(nn.Module):
        remat: bool = False

        @nn.compact
        def __call__(self, x):
            cls = nn.remat(Block) if self.remat else Block
            x = cls(name="b1")(x)
            return cls(name="b2")(x)

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 3))
    v = Net(remat=True).init(jax.random.PRNGKey(1), x)
    fn_remat = lambda b: Net(remat=True).apply(v, b)      # noqa: E731
    fn_plain = lambda b: Net(remat=False).apply(v, b)     # noqa: E731
    with pytest.raises(Exception):
        calibrate_int8(fn_remat, [x], prefixes=("b",))
    scales = calibrate_int8(fn_plain, [x], prefixes=("b",))
    assert set(scales) == {"b1/c", "b2/c"}
    # the scales transfer: int8 serving of the REMAT'D model works and
    # matches the remat-free int8 twin exactly
    yq_r = jax.jit(quantize_fn(fn_remat, scales, ("b",)))(x)
    yq_p = jax.jit(quantize_fn(fn_plain, scales, ("b",)))(x)
    np.testing.assert_array_equal(np.asarray(yq_r), np.asarray(yq_p))


# Full-model quantization tests below: ~90 s of init+compile on one CPU
# core — slow lane (the fast-lane unit test above covers the quant math).


@pytest.fixture(scope="module")
def quant_setup():
    cfg = get_config("dhd_micro")
    model = build_model(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, batch_size=1,
                                         with_gt=False).items()}
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), batch, train=False))()

    def infer(b):
        out = model.apply(variables, b, train=False)
        return jnp.argmax(out["occ_logits"], axis=-1).astype(jnp.uint8)

    return cfg, batch, infer


@pytest.mark.slow
def test_calibration_covers_backbone_convs(quant_setup):
    cfg, batch, infer = quant_setup
    scales = calibrate_int8(infer, [batch], PREFIXES)
    assert len(scales) >= 4, sorted(scales)       # tiny_cnn: >=5 blocks
    assert all(p.startswith(PREFIXES[0]) for p in scales)
    assert all(np.isfinite(v) and v > 0 for v in scales.values())


@pytest.mark.slow
def test_int8_prediction_drift_small(quant_setup):
    """Voxel argmax flip rate between fp32 and int8-backbone serving stays
    small (the accuracy gate the reference's TRT int8 path relies on its
    calibration for)."""
    cfg, batch, infer = quant_setup
    scales = calibrate_int8(infer, [batch], PREFIXES)
    occ_fp = np.asarray(jax.jit(infer)(batch))
    occ_q = np.asarray(jax.jit(quantize_fn(infer, scales, PREFIXES))(batch))
    flip = float((occ_fp != occ_q).mean())
    assert flip < 0.02, f"int8 flip rate {flip:.4f}"


@pytest.mark.slow
def test_int8_export_roundtrip(quant_setup):
    cfg, batch, infer = quant_setup
    from jax import export as jexport
    scales = calibrate_int8(infer, [batch], PREFIXES)
    qfn = quantize_fn(infer, scales, PREFIXES)
    exported = jexport.export(jax.jit(qfn))(batch)
    blob = exported.serialize()
    restored = jexport.deserialize(bytearray(blob))
    out = jax.jit(restored.call)(batch)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jax.jit(qfn)(batch)))
