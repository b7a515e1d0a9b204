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
