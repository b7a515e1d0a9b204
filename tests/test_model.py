"""End-to-end model forward on the tiny config."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhd_tpu.config import get_config
from dhd_tpu.data import synthetic_batch
from dhd_tpu.models import DHDNet, band_masks_from_height, collapse_z


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = get_config("dhd_tiny")
    model = DHDNet(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, batch_size=1).items()}
    # jitted init: one compiled program instead of thousands of eager CPU
    # ops (~90 s -> seconds on the 1-core test host)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)
    return cfg, model, batch, variables


def test_forward_shapes(tiny_setup):
    cfg, model, batch, variables = tiny_setup
    out = model.apply(variables, batch, train=False)
    dx, dy, dz = cfg.vt.x.size, cfg.vt.y.size, cfg.head_Dz
    assert out["occ_logits"].shape == (1, dx, dy, dz, cfg.num_classes)
    fh, fw = cfg.vt.feat_size
    assert out["depth"].shape == (1, cfg.num_cams, fh, fw, cfg.vt.D)
    assert out["height"].shape == (
        1, cfg.num_cams, fh, fw, cfg.vt.num_height_bins)
    assert np.isfinite(np.asarray(out["occ_logits"])).all()
    # distributions sum to 1
    np.testing.assert_allclose(
        np.asarray(out["depth"].sum(-1)), 1.0, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["height"].sum(-1)), 1.0, atol=1e-4)


def test_forward_jits(tiny_setup):
    cfg, model, batch, variables = tiny_setup
    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))
    out = fwd(variables, batch)
    assert np.isfinite(np.asarray(out["occ_logits"])).all()


def test_train_mode_updates_batch_stats(tiny_setup):
    cfg, model, batch, variables = tiny_setup
    out, mutated = model.apply(
        variables, batch, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    assert "batch_stats" in mutated
    assert np.isfinite(np.asarray(out["occ_logits"])).all()


def test_band_masks_partition():
    cfg = get_config("dhd_tiny")
    rng = np.random.default_rng(0)
    prob = jax.nn.softmax(
        jnp.asarray(rng.normal(0, 1, (2, 4, 4, cfg.vt.num_height_bins))),
        axis=-1)
    masks = np.asarray(band_masks_from_height(prob, cfg.vt))
    # each pixel belongs to at most one band (top-bin pixels to none)
    assert masks.sum(-1).max() <= 1.0
    assert set(np.unique(masks)) <= {0.0, 1.0}


def test_collapse_z_order():
    # z-minor input (B, Dy, Dx, Dz, C); collapsed channels are z-major
    x = jnp.arange(2 * 2 * 2 * 3 * 4).reshape(2, 2, 2, 3, 4).astype(jnp.float32)
    y = collapse_z(x)
    assert y.shape == (2, 2, 2, 12)
    # z-major: first 4 channels are z=0's channels
    np.testing.assert_array_equal(np.asarray(y[0, 0, 0, :4]),
                                  np.asarray(x[0, 0, 0, 0]))
    np.testing.assert_array_equal(np.asarray(y[0, 0, 0, 4:8]),
                                  np.asarray(x[0, 0, 0, 1]))
