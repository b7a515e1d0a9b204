"""Voxel pooling correctness: reference fixture, dense oracle, fusion proof."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhd_tpu.config import GridConfig, ViewTransformConfig
from dhd_tpu.geometry import create_frustum, frustum_to_ego
from dhd_tpu.ops import bev_pool_v2, compute_pool_indices, mghs_pool


def test_bev_pool_v2_reference_fixture():
    """Port of the reference inline self-test
    (ops/bev_pool_v2/bev_pool.py:163-194): 8 depths, ones features,
    hand-computed output sum and gradients."""
    depth = jnp.asarray(
        [0.3, 0.4, 0.2, 0.1, 0.7, 0.6, 0.8, 0.9]).reshape(1, 1, 2, 2, 2)
    feat = jnp.ones((1, 1, 2, 2, 2))
    ranks_depth = jnp.asarray([0, 4, 1, 6], jnp.int32)
    ranks_feat = jnp.asarray([0, 0, 1, 2], jnp.int32)
    ranks_bev = jnp.asarray([0, 0, 1, 1], jnp.int32)

    def loss_fn(depth, feat):
        out = bev_pool_v2(depth, feat, ranks_depth, ranks_feat, ranks_bev,
                          (1, 1, 2, 2, 2))
        return jnp.sum(out)

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(depth, feat)
    assert np.isclose(float(loss), 4.4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(grads[0]).ravel(), [2., 2., 0., 0., 2., 0., 2., 0.],
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(grads[1]).ravel(), [1.0, 1.0, 0.4, 0.4, 0.8, 0.8, 0., 0.],
        atol=1e-6)


def _tiny_vt():
    return ViewTransformConfig(
        input_size=(32, 64),
        downsample=16,
        depth=GridConfig(1.0, 9.0, 1.0),       # D=8
        x=GridConfig(-4.0, 4.0, 0.4),          # 20
        y=GridConfig(-4.0, 4.0, 0.4),          # 20
        out_channels=8,
    )


def _random_inputs(vt, b=2, n=2, seed=0):
    rng = np.random.default_rng(seed)
    fh, fw = vt.feat_size
    d = vt.D
    depth = rng.random((b, n, d, fh, fw)).astype(np.float32)
    feat = rng.normal(0, 1, (b, n, fh, fw, vt.out_channels)).astype(np.float32)
    # ego coords spanning a bit beyond the grid to exercise bounds
    coords = rng.uniform(-5.0, 5.0, (b, n, d, fh, fw, 3)).astype(np.float32)
    coords[..., 2] = rng.uniform(-2.0, 6.0, coords[..., 2].shape)
    band_idx = rng.integers(0, 4, (b, n, fh, fw))   # 3 = no band (top bin)
    band_mask = np.stack([band_idx == k for k in range(3)],
                         axis=-1).astype(np.float32)
    return depth, feat, coords, band_mask


def _dense_reference(depth, feat, coords, band_mask, vt):
    """Straight-line numpy implementation of the reference's 4 pooling
    passes (lss_heightmap.py:407-459): truncation voxelization, bounds
    filter, per-band masked feature splats."""
    b, n, d, fh, fw = depth.shape
    c = feat.shape[-1]
    dx, dy = vt.x.size, vt.y.size
    s1, s2, s3 = vt.slab_sizes
    bev = np.zeros((b, dy, dx, c), np.float32)
    vox = np.zeros((b, vt.z_fine.size, dy, dx, c), np.float32)
    for bi in range(b):
        for ni in range(n):
            for di in range(d):
                for hi in range(fh):
                    for wi in range(fw):
                        x, y, z = coords[bi, ni, di, hi, wi]
                        xi = int((x - vt.x.lower) / vt.x.interval)
                        yi = int((y - vt.y.lower) / vt.y.interval)
                        if not (0 <= xi < dx and 0 <= yi < dy):
                            continue
                        w = depth[bi, ni, di, hi, wi]
                        f = feat[bi, ni, hi, wi]
                        zif = int((z - vt.z_full.lower) / vt.z_full.interval)
                        if 0 <= zif < vt.z_full.size:
                            bev[bi, yi, xi] += w * f
                        zi = int((z - vt.z_fine.lower) / vt.z_fine.interval)
                        if 0 <= zi < vt.z_fine.size:
                            band = 0 if zi < s1 else (1 if zi < s1 + s2 else 2)
                            gate = band_mask[bi, ni, hi, wi, band]
                            vox[bi, zi, yi, xi] += w * f * gate
    return bev, vox


def test_mghs_pool_matches_dense_reference():
    vt = _tiny_vt()
    depth, feat, coords, band_mask = _random_inputs(vt)
    idx = compute_pool_indices(jnp.asarray(coords), vt)
    bev, vox = mghs_pool(jnp.asarray(depth), jnp.asarray(feat),
                         jnp.asarray(band_mask), idx, vt)
    ref_bev, ref_vox = _dense_reference(depth, feat, coords, band_mask, vt)
    np.testing.assert_allclose(np.asarray(bev), ref_bev, atol=1e-4)
    # vox comes out z-minor: (B, Dy, Dx, Dz, C)
    np.testing.assert_allclose(np.asarray(vox),
                               np.transpose(ref_vox, (0, 2, 3, 1, 4)),
                               atol=1e-4)


def test_mghs_pool_pallas_matches_xla():
    """The Pallas inference path (single sort + fused dual kernel) must be
    numerically identical to the XLA segment-sum path."""
    vt = _tiny_vt()
    depth, feat, coords, band_mask = _random_inputs(vt, seed=5)
    idx = compute_pool_indices(jnp.asarray(coords), vt)
    bev_x, vox_x = mghs_pool(jnp.asarray(depth), jnp.asarray(feat),
                             jnp.asarray(band_mask), idx, vt)
    from dhd_tpu.ops import mghs_pool_pallas
    depth_px = jnp.transpose(jnp.asarray(depth), (0, 1, 3, 4, 2))
    bev_p, vox_p = mghs_pool_pallas(
        depth_px, jnp.asarray(feat), jnp.asarray(band_mask),
        idx, vt, interpret=jax.default_backend() != "tpu")
    np.testing.assert_allclose(np.asarray(bev_p), np.asarray(bev_x),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(vox_p), np.asarray(vox_x),
                               atol=1e-3)


def test_mghs_pool_grads_flow():
    vt = _tiny_vt()
    depth, feat, coords, band_mask = _random_inputs(vt, seed=3)
    idx = compute_pool_indices(jnp.asarray(coords), vt)

    def loss(depth, feat):
        bev, vox = mghs_pool(depth, feat, jnp.asarray(band_mask), idx, vt)
        return jnp.sum(bev ** 2) + jnp.sum(vox ** 2)

    g_depth, g_feat = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(depth), jnp.asarray(feat))
    assert np.isfinite(np.asarray(g_depth)).all()
    assert np.isfinite(np.asarray(g_feat)).all()
    assert float(jnp.abs(g_depth).sum()) > 0
    assert float(jnp.abs(g_feat).sum()) > 0


def test_out_of_grid_points_dropped():
    vt = _tiny_vt()
    b, n, fh, fw = 1, 1, vt.feat_size[0], vt.feat_size[1]
    d = vt.D
    coords = np.full((b, n, d, fh, fw, 3), 1e3, np.float32)  # all outside
    depth = np.ones((b, n, d, fh, fw), np.float32)
    feat = np.ones((b, n, fh, fw, vt.out_channels), np.float32)
    mask = np.ones((b, n, fh, fw, 3), np.float32)
    idx = compute_pool_indices(jnp.asarray(coords), vt)
    bev, vox = mghs_pool(jnp.asarray(depth), jnp.asarray(feat),
                         jnp.asarray(mask), idx, vt)
    assert float(jnp.abs(bev).sum()) == 0.0
    assert float(jnp.abs(vox).sum()) == 0.0


def test_pool_deterministic_and_permutation_invariant():
    """segment_sum is deterministic (unlike atomic CUDA scatter-add) and
    permutation-invariant up to fp accumulation order (SURVEY §5 race
    notes)."""
    vt = _tiny_vt()
    depth, feat, coords, band_mask = _random_inputs(vt, seed=7)
    idx = compute_pool_indices(jnp.asarray(coords), vt)
    f = jax.jit(lambda d, x, m: mghs_pool(d, x, m, idx, vt))
    out1 = f(jnp.asarray(depth), jnp.asarray(feat), jnp.asarray(band_mask))
    out2 = f(jnp.asarray(depth), jnp.asarray(feat), jnp.asarray(band_mask))
    # bitwise deterministic across runs
    np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out2[0]))
    np.testing.assert_array_equal(np.asarray(out1[1]), np.asarray(out2[1]))

    # permute the cameras (a relabeling of points): results match closely
    perm = np.asarray([1, 0])
    idx_p = compute_pool_indices(jnp.asarray(coords[:, perm]), vt)
    bev_p, vox_p = mghs_pool(jnp.asarray(depth[:, perm]),
                             jnp.asarray(feat[:, perm]),
                             jnp.asarray(band_mask[:, perm]), idx_p, vt)
    np.testing.assert_allclose(np.asarray(bev_p), np.asarray(out1[0]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(vox_p), np.asarray(out1[1]),
                               atol=1e-4)


def test_truncation_boundary_semantics():
    """Points in (lower - interval, lower) truncate to index 0 and are kept,
    replicating torch .long() semantics (lss_heightmap.py:331-348)."""
    vt = _tiny_vt()
    fh, fw = vt.feat_size
    coords = np.zeros((1, 1, vt.D, fh, fw, 3), np.float32)
    coords[..., 0] = vt.x.lower - 0.5 * vt.x.interval   # trunc -> 0, kept
    coords[..., 1] = 0.0
    coords[..., 2] = 0.0
    idx = compute_pool_indices(jnp.asarray(coords), vt)
    assert int((idx.seg_bev < idx.num_seg_bev).sum()) == vt.D * fh * fw


@pytest.mark.parametrize("dtype,atol", [
    # fp32 pins the custom_vjp exactly (the backward is two gathers of g —
    # any pack/dtype regression in the forward or backward shows up here);
    # bf16 covers the serving dtype, where out/cotangent rounding dominates
    (np.float32, 1e-5),
    (np.float16, None),  # placeholder replaced below (bf16 has no np alias)
])
def test_mghs_pool_pallas_grads_match_xla(dtype, atol):
    """Training THROUGH the kernel path (precomputed plan in a train batch,
    e.g. a pod loader shipping plans) must give the XLA path's gradients:
    the dual kernel carries a custom_vjp whose backward is two gathers."""
    vt = _tiny_vt()
    depth, feat, coords, band_mask = _random_inputs(vt, seed=9)
    idx = compute_pool_indices(jnp.asarray(coords), vt)
    from dhd_tpu.ops import build_pool_plan, mghs_pool_pallas
    plan = build_pool_plan(idx, vt, depth.shape)
    bf16 = dtype == np.float16
    dt = jnp.bfloat16 if bf16 else jnp.float32
    if bf16:
        atol = 2e-2
    feat_j = jnp.asarray(feat, dt)
    depth_px = jnp.transpose(jnp.asarray(depth, dt), (0, 1, 3, 4, 2))
    bm = jnp.asarray(band_mask)

    def loss_pallas(depth_px, feat):
        bev, vox = mghs_pool_pallas(depth_px, feat, bm, None, vt,
                                    interpret=True, plan=plan)
        return jnp.sum(bev.astype(jnp.float32) ** 2) \
            + jnp.sum(vox.astype(jnp.float32) ** 2)

    def loss_xla(depth, feat):
        bev, vox = mghs_pool(depth.astype(jnp.float32),
                             feat.astype(jnp.float32), bm, idx, vt)
        if bf16:  # XLA oracle with the kernel's output rounding
            bev, vox = bev.astype(dt), vox.astype(dt)
        return jnp.sum(bev.astype(jnp.float32) ** 2) \
            + jnp.sum(vox.astype(jnp.float32) ** 2)

    gd_p, gf_p = jax.grad(loss_pallas, argnums=(0, 1))(depth_px, feat_j)
    gd_x, gf_x = jax.grad(loss_xla, argnums=(0, 1))(
        jnp.asarray(depth, dt), feat_j)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(gd_p, (0, 1, 4, 2, 3)), np.float32),
        np.asarray(gd_x, np.float32), atol=atol, rtol=1e-5 if not bf16 else 1e-2)
    np.testing.assert_allclose(np.asarray(gf_p, np.float32),
                               np.asarray(gf_x, np.float32),
                               atol=atol, rtol=1e-5 if not bf16 else 1e-2)
