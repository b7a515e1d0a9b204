"""Geometry chain golden tests."""
import jax.numpy as jnp
import numpy as np

from dhd_tpu.config import GridConfig
from dhd_tpu.geometry import (
    create_frustum, frustum_to_ego, get_mlp_input, sensor2keyego)


def test_create_frustum_shape_and_values():
    f = np.asarray(create_frustum(GridConfig(1.0, 45.0, 1.0), (256, 704), 16))
    assert f.shape == (44, 16, 44, 3)
    assert f[0, 0, 0, 2] == 1.0 and f[-1, 0, 0, 2] == 44.0
    assert f[0, 0, 0, 0] == 0.0 and f[0, 0, -1, 0] == 703.0
    assert f[0, 0, 0, 1] == 0.0 and f[0, -1, 0, 1] == 255.0


def test_frustum_to_ego_identity_camera():
    """With identity extrinsics and a pinhole K, point (u=cx, v=cy, d) must
    land at (0, 0, d) in camera coords = ego coords."""
    fr = create_frustum(GridConfig(1.0, 5.0, 1.0), (32, 64), 16)
    b, n = 1, 1
    s2e = jnp.eye(4)[None, None]
    intr = jnp.asarray(
        [[[[100.0, 0, 32.0], [0, 100.0, 16.0], [0, 0, 1.0]]]])
    post_rot = jnp.eye(3)[None, None]
    post_tran = jnp.zeros((1, 1, 3))
    bda = jnp.eye(3)[None]
    pts = frustum_to_ego(fr, s2e, intr, post_rot, post_tran, bda)
    # frustum pixel nearest to the principal point:
    u = np.asarray(fr[..., 0])
    v = np.asarray(fr[..., 1])
    iw = np.argmin(np.abs(u[0, 0] - 32.0))
    ih = np.argmin(np.abs(v[0, :, 0] - 16.0))
    for d_idx in range(4):
        p = np.asarray(pts[0, 0, d_idx, ih, iw])
        d = d_idx + 1.0
        expect = np.array([(u[0, 0, iw] - 32.0) / 100.0 * d,
                           (v[0, ih, 0] - 16.0) / 100.0 * d, d])
        np.testing.assert_allclose(p, expect, atol=1e-5)


def test_frustum_to_ego_undoes_post_aug():
    """Applying a post_rot/post_tran must leave ego points unchanged when the
    frustum is transformed consistently (the aug is inverted first)."""
    fr = create_frustum(GridConfig(1.0, 5.0, 1.0), (32, 64), 16)
    s2e = jnp.eye(4)[None, None]
    intr = jnp.asarray(
        [[[[100.0, 0, 32.0], [0, 100.0, 16.0], [0, 0, 1.0]]]])
    ident = frustum_to_ego(fr, s2e, intr, jnp.eye(3)[None, None],
                           jnp.zeros((1, 1, 3)), jnp.eye(3)[None])
    # aug: scale 0.5 + translate (3, 7)
    pr = jnp.asarray([[[[0.5, 0, 0], [0, 0.5, 0], [0, 0, 1.0]]]])
    pt = jnp.asarray([[[3.0, 7.0, 0.0]]])
    fr_aug = fr.at[..., :2].mul(0.5).at[..., 0].add(3.0).at[..., 1].add(7.0)
    auged = frustum_to_ego(fr_aug, s2e, intr, pr, pt, jnp.eye(3)[None])
    np.testing.assert_allclose(np.asarray(auged), np.asarray(ident),
                               atol=1e-4)


def test_sensor2keyego_first_view_unchanged():
    rng = np.random.default_rng(0)
    s2e = np.broadcast_to(np.eye(4, dtype=np.float32), (1, 3, 4, 4)).copy()
    s2e[..., :3, 3] = rng.normal(0, 1, (1, 3, 3))
    e2g = np.broadcast_to(np.eye(4, dtype=np.float32), (1, 3, 4, 4)).copy()
    # view 0's ego IS the key ego, so with shared ego2global the transforms
    # stay put
    out = np.asarray(sensor2keyego(jnp.asarray(s2e), jnp.asarray(e2g)))
    np.testing.assert_allclose(out, s2e, atol=1e-5)

    # distinct ego poses: key alignment maps view k through global
    th = 0.3
    rot = np.eye(4, dtype=np.float32)
    rot[0, 0] = rot[1, 1] = np.cos(th)
    rot[0, 1] = -np.sin(th)
    rot[1, 0] = np.sin(th)
    e2g2 = e2g.copy()
    e2g2[0, 1] = rot
    out2 = np.asarray(sensor2keyego(jnp.asarray(s2e), jnp.asarray(e2g2)))
    expect = np.linalg.inv(e2g2[0, 0]) @ e2g2[0, 1] @ s2e[0, 1]
    np.testing.assert_allclose(out2[0, 1], expect, atol=1e-5)


def test_mlp_input_layout():
    b, n = 1, 2
    intr = np.zeros((b, n, 3, 3), np.float32)
    intr[..., 0, 0] = 11.0
    intr[..., 1, 1] = 22.0
    intr[..., 0, 2] = 33.0
    intr[..., 1, 2] = 44.0
    intr[..., 2, 2] = 1.0
    pr = np.broadcast_to(np.eye(3, dtype=np.float32), (b, n, 3, 3))
    pt = np.zeros((b, n, 3), np.float32)
    s2e = np.broadcast_to(np.eye(4, dtype=np.float32), (b, n, 4, 4))
    bda = np.broadcast_to(np.eye(3, dtype=np.float32), (b, 3, 3))
    out = np.asarray(get_mlp_input(
        jnp.asarray(s2e), jnp.asarray(intr), jnp.asarray(pr),
        jnp.asarray(pt), jnp.asarray(bda)))
    assert out.shape == (b, n, 27)
    np.testing.assert_allclose(out[0, 0, :4], [11.0, 22.0, 33.0, 44.0])
    # bda diag entries at positions 10, 13, 14
    np.testing.assert_allclose(out[0, 0, [10, 13, 14]], [1.0, 1.0, 1.0])
    # flattened sensor2ego rows: identity pattern
    np.testing.assert_allclose(
        out[0, 0, 15:], np.eye(4, dtype=np.float32)[:3].ravel())


def _pose(yaw, t):
    m = np.eye(4)
    m[0, 0] = np.cos(yaw)
    m[0, 1] = -np.sin(yaw)
    m[1, 0] = np.sin(yaw)
    m[1, 1] = np.cos(yaw)
    m[:3, 3] = t
    return m


def test_rigid_relative_survives_large_translations():
    """Regression for the fp64-geometry gap (VERDICT r1 #4): with realistic
    O(1000 m) nuScenes ego2global translations, naive fp32 inv(A) @ B loses
    >1e-4 m to cancellation; the SE3 relative composition must not."""
    from dhd_tpu.geometry import rigid_inverse, rigid_relative
    rng = np.random.default_rng(3)
    errs_naive, errs_stable = [], []
    for _ in range(10):
        t0 = rng.uniform(-3000, 3000, 3)
        t0[2] = rng.uniform(-2, 2)
        a64 = _pose(rng.uniform(0, 2 * np.pi), t0)
        # adjacent frame: ~0.5 m of ego motion, small yaw change
        b64 = _pose(rng.uniform(0, 2 * np.pi),
                    t0 + rng.uniform(-0.6, 0.6, 3))

        a32 = jnp.asarray(a64, jnp.float32)
        b32 = jnp.asarray(b64, jnp.float32)
        # ground truth: float64 on the same fp32-quantized inputs, isolating
        # *computation* error from the irreducible input quantization
        want = np.linalg.inv(np.asarray(a32, np.float64)) @ \
            np.asarray(b32, np.float64)
        naive = np.asarray(
            jnp.matmul(jnp.linalg.inv(a32), b32))
        stable = np.asarray(rigid_relative(a32, b32))
        errs_naive.append(np.abs(naive[:3, 3] - want[:3, 3]).max())
        errs_stable.append(np.abs(stable[:3, 3] - want[:3, 3]).max())

        inv_stable = np.asarray(rigid_inverse(a32))
        np.testing.assert_allclose(inv_stable @ np.asarray(a32),
                                   np.eye(4), atol=2e-3)
    # the naive path demonstrably fails at this scale ...
    assert max(errs_naive) > 1e-4, errs_naive
    # ... while the stable path stays at the ulp of the *relative* motion
    assert max(errs_stable) < 1e-5, errs_stable


def test_stereo_prepare_inputs_prefers_host_fp64(dhd_tiny_stereo_cfg=None):
    """The pipeline ships float64-composed sensor2keyego/curr2adjsensor;
    _prepare_inputs must use them verbatim and the in-jit fallback must agree
    to fp32 accuracy even with large global translations."""
    from dhd_tpu.config import get_config
    from dhd_tpu.models.dhd_stereo import DHDStereoNet

    cfg = get_config("dhd_tiny_stereo")
    net = DHDStereoNet(cfg)
    rng = np.random.default_rng(0)
    b, f, n = 1, cfg.num_frames, cfg.num_cams
    s2e = np.stack([[[_pose(rng.uniform(0, 6.28), rng.uniform(-2, 2, 3))
                      for _ in range(n)] for _ in range(f)]])
    base = rng.uniform(-3000, 3000, 3)
    base[2] = 0.0
    e2g = np.stack([[[_pose(0.3 * fi, base + [0.5 * fi, 0, 0])
                      for _ in range(n)] for fi in range(f)]])
    batch = {"sensor2ego": s2e.astype(np.float32),
             "ego2global": e2g.astype(np.float32)}

    # host-side fp64 (what the pipeline computes)
    g2k = np.linalg.inv(e2g[:, 0, 0])[:, None, None]
    s2k_64 = (g2k @ e2g @ s2e).astype(np.float32)
    c2g = e2g @ s2e
    c2a_64 = (np.linalg.inv(c2g[:, 1:]) @ c2g[:, :-1]).astype(np.float32)

    # fallback (raw poses only) must agree with fp64 to ~1e-5 m
    s2k_fb, c2a_fb = net._prepare_inputs(
        {k: jnp.asarray(v) for k, v in batch.items()})
    np.testing.assert_allclose(np.asarray(s2k_fb), s2k_64, atol=3e-5)
    np.testing.assert_allclose(np.asarray(c2a_fb), c2a_64, atol=3e-5)

    # precomputed keys are used verbatim
    batch["sensor2keyego"] = s2k_64
    batch["curr2adjsensor"] = c2a_64
    s2k_pc, c2a_pc = net._prepare_inputs(
        {k: jnp.asarray(v) for k, v in batch.items()})
    np.testing.assert_array_equal(np.asarray(s2k_pc), s2k_64)
    np.testing.assert_array_equal(np.asarray(c2a_pc), c2a_64)
