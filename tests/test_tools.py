"""CLI tool units: bev_pool v1, vis BEV projection, export round trip."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dhd_tpu.ops.voxel_pool import bev_pool


def test_bev_pool_v1_sum_and_max():
    feats = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    coords = jnp.asarray([[1, 0, 0, 0], [1, 0, 0, 0], [0, 1, 0, 0]],
                         jnp.int32)
    out = bev_pool(feats, coords, b=1, dz=1, dy=2, dx=2, pool="sum")
    assert out.shape == (1, 2, 1, 2, 2)
    np.testing.assert_allclose(np.asarray(out[0, :, 0, 0, 1]), [4.0, 6.0])
    np.testing.assert_allclose(np.asarray(out[0, :, 0, 1, 0]), [5.0, 6.0])
    out_max = bev_pool(feats, coords, b=1, dz=1, dy=2, dx=2, pool="max")
    np.testing.assert_allclose(np.asarray(out_max[0, :, 0, 0, 1]),
                               [3.0, 4.0])
    # empty pillars are zero
    np.testing.assert_allclose(np.asarray(out_max[0, :, 0, 1, 1]), 0.0)


def test_bev_pool_v1_drops_out_of_grid():
    feats = jnp.ones((2, 3))
    coords = jnp.asarray([[5, 0, 0, 0], [-1, 0, 0, 0]], jnp.int32)
    out = bev_pool(feats, coords, b=1, dz=1, dy=2, dx=2)
    assert float(jnp.abs(out).sum()) == 0.0


def test_vis_bev_projection():
    from dhd_tpu.cli.vis import occ_to_bev_rgb, PALETTE
    occ = np.full((4, 4, 3), 17, np.uint8)
    occ[1, 2, 0] = 4          # car at bottom
    occ[1, 2, 2] = 7          # pedestrian on top -> wins
    rgb = occ_to_bev_rgb(occ)
    assert rgb.shape == (4, 4, 3)
    np.testing.assert_allclose(rgb[2, 1], PALETTE[7])      # (y, x) transpose
    np.testing.assert_allclose(rgb[0, 0], PALETTE[17])


def test_export_roundtrip(tmp_path):
    from jax import export as jexport
    from dhd_tpu.config import get_config
    from dhd_tpu.data import synthetic_batch
    from dhd_tpu.models import build_model

    cfg = get_config("dhd_tiny")
    model = build_model(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, 1, with_gt=False).items()}
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=False))()

    def infer(batch):
        out = model.apply(variables, batch, train=False)
        return jnp.argmax(out["occ_logits"], axis=-1).astype(jnp.uint8)

    exported = jexport.export(jax.jit(infer))(batch)
    blob = exported.serialize()
    restored = jexport.deserialize(blob)
    out1 = np.asarray(jax.jit(infer)(batch))
    out2 = np.asarray(restored.call(batch))
    np.testing.assert_array_equal(out1, out2)
