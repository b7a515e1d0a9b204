"""Pallas cost-volume kernel vs the XLA gather path (interpret mode on CPU).

Same geometry style as test_oracle_parity.test_depthnet_stereo_parity: a
mild inter-frame rotation + translation.  The kernel's row-windowed bilinear
warp equals the zero-padded grid_sample the XLA path computes whenever the
plan's required row window fits the compiled win_rows — which is what
validate_cv_plan checks, and what these tests pin.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dhd_tpu.geometry import create_frustum
from dhd_tpu.config import GridConfig
from dhd_tpu.ops.cost_volume import stereo_cost_volume
from dhd_tpu.ops.cost_volume_pallas import (build_cv_plan, validate_cv_plan,
                                            stereo_cost_volume_pallas)


def _geometry(b, n, h_img, w_img, seed=7, rot=True):
    rng = np.random.default_rng(seed)
    intr = np.zeros((b, n, 3, 3), np.float32)
    intr[..., 0, 0] = intr[..., 1, 1] = w_img * 0.8
    intr[..., 0, 2] = w_img / 2.0
    intr[..., 1, 2] = h_img / 2.0
    intr[..., 2, 2] = 1.0
    post_rots = np.broadcast_to(np.eye(3, dtype=np.float32),
                                (b, n, 3, 3)).copy()
    post_trans = np.zeros((b, n, 3), np.float32)
    # small inter-frame motion: ~1 deg yaw + forward translation
    k2s = np.broadcast_to(np.eye(4, dtype=np.float32), (b, n, 4, 4)).copy()
    for bi in range(b):
        for ni in range(n):
            th = rng.uniform(-0.02, 0.02) if rot else 0.0
            c, s = np.cos(th), np.sin(th)
            k2s[bi, ni, :3, :3] = np.array(
                [[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
            k2s[bi, ni, :3, 3] = rng.uniform(-0.3, 0.3, 3)
    return intr, post_rots, post_trans, k2s


def _build_plan(frustum, k2s, intr, post_rots, post_trans, hs, ws,
                win_rows=2):
    return jax.jit(build_cv_plan,
                   static_argnames=("hs", "ws", "win_rows"))(
        jnp.asarray(np.asarray(frustum, np.float32)), jnp.asarray(k2s),
        jnp.asarray(intr), jnp.asarray(post_rots), jnp.asarray(post_trans),
        hs=hs, ws=ws, win_rows=win_rows)


@pytest.mark.parametrize("ws", [24, 48])
def test_cost_volume_pallas_matches_xla(ws):
    b, n, cs = 1, 2, 8
    hs = 16
    h_img, w_img = hs * 4, ws * 4
    depth_grid = GridConfig(1.0, 9.0, 0.5)          # D=16
    frustum = create_frustum(depth_grid, (h_img, w_img), downsample=4)

    rng = np.random.default_rng(3)
    prev = rng.normal(0, 1, (b, n, hs, ws, cs)).astype(np.float32)
    curr = rng.normal(0, 1, (b, n, hs, ws, cs)).astype(np.float32)
    intr, post_rots, post_trans, k2s = _geometry(b, n, h_img, w_img)

    # the ~1 deg yaw tilts the epipolar lines: this rig needs a 3-row warp
    # window (validate_cv_plan is the serving-setup guard for exactly this)
    plan = _build_plan(frustum, k2s, intr, post_rots, post_trans, hs, ws,
                       win_rows=2)
    assert not validate_cv_plan(plan)["ok"]
    win_rows = validate_cv_plan(plan)["wr_req"]
    assert win_rows == 3

    args = (jnp.asarray(prev), jnp.asarray(curr),
            jnp.asarray(np.asarray(frustum, np.float32)), jnp.asarray(k2s),
            jnp.asarray(intr), jnp.asarray(post_rots),
            jnp.asarray(post_trans))
    ref = stereo_cost_volume(*args, bias=5.0)
    for wr in (win_rows, 4):
        out = stereo_cost_volume_pallas(*args, bias=5.0, win_rows=wr,
                                        interpret=True)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


def test_cost_volume_pallas_two_row_fast_path():
    """win_rows=2 (the nuScenes-rig fast path) is exact when the rig has no
    in-plane inter-frame rotation, and validate_cv_plan certifies it."""
    b, n, cs, hs, ws = 1, 2, 8, 16, 48
    h_img, w_img = hs * 4, ws * 4
    depth_grid = GridConfig(1.0, 9.0, 0.5)          # D=16
    frustum = create_frustum(depth_grid, (h_img, w_img), downsample=4)
    intr, post_rots, post_trans, k2s = _geometry(b, n, h_img, w_img,
                                                 seed=9, rot=False)
    plan = _build_plan(frustum, k2s, intr, post_rots, post_trans, hs, ws,
                       win_rows=2)
    v = validate_cv_plan(plan)
    assert v["ok"] and v["wr_req"] <= 2

    rng = np.random.default_rng(4)
    prev = rng.normal(0, 1, (b, n, hs, ws, cs)).astype(np.float32)
    curr = rng.normal(0, 1, (b, n, hs, ws, cs)).astype(np.float32)
    args = (jnp.asarray(prev), jnp.asarray(curr),
            jnp.asarray(np.asarray(frustum, np.float32)), jnp.asarray(k2s),
            jnp.asarray(intr), jnp.asarray(post_rots),
            jnp.asarray(post_trans))
    ref = stereo_cost_volume(*args, bias=5.0)
    out = stereo_cost_volume_pallas(*args, bias=5.0, win_rows=2,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_cv_plan_multi_tile():
    """Multi-column-tile shape (Ws > 128, the DHD-L shape class): window
    origins stay in range, the required-row diagnostic certifies the fit,
    and the kernel matches XLA exactly across tile boundaries."""
    b, n, cs, hs, ws = 1, 1, 8, 8, 256
    h_img, w_img = hs * 4, ws * 4
    depth_grid = GridConfig(1.0, 9.0, 1.0)          # D=8
    frustum = create_frustum(depth_grid, (h_img, w_img), downsample=4)
    intr, post_rots, post_trans, k2s = _geometry(b, n, h_img, w_img, seed=1)

    plan = _build_plan(frustum, k2s, intr, post_rots, post_trans, hs, ws,
                       win_rows=4)
    r0 = np.asarray(plan["r0"])
    assert r0.min() >= 0 and r0.max() <= hs - 4
    v = validate_cv_plan(plan)
    assert v["ok"] and v["wr_req"] <= 4

    rng = np.random.default_rng(5)
    prev = rng.normal(0, 1, (b, n, hs, ws, cs)).astype(np.float32)
    curr = rng.normal(0, 1, (b, n, hs, ws, cs)).astype(np.float32)
    args = (jnp.asarray(prev), jnp.asarray(curr),
            jnp.asarray(np.asarray(frustum, np.float32)), jnp.asarray(k2s),
            jnp.asarray(intr), jnp.asarray(post_rots),
            jnp.asarray(post_trans))
    ref = stereo_cost_volume(*args, bias=5.0)
    out = stereo_cost_volume_pallas(*args, bias=5.0, win_rows=4,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_cost_volume_pallas_under_grad():
    """The op is non-differentiable (reference computes it under @no_grad,
    depthnet.py:310); the dispatcher must stop gradients on the *inputs*
    so train-step linearization never reaches the Pallas kernel (which has
    no JVP rule — this crashed the DHD-M train step when cv_method flipped
    to the kernel).  Input grads through a loss containing the cost volume
    must be zero, not an error."""
    b, n, cs, hs, ws = 1, 1, 8, 8, 24
    h_img, w_img = hs * 4, ws * 4
    depth_grid = GridConfig(1.0, 9.0, 1.0)          # D=8
    frustum = jnp.asarray(np.asarray(
        create_frustum(depth_grid, (h_img, w_img), downsample=4),
        np.float32))
    rng = np.random.default_rng(11)
    prev = jnp.asarray(rng.normal(0, 1, (b, n, hs, ws, cs)), jnp.float32)
    curr = jnp.asarray(rng.normal(0, 1, (b, n, hs, ws, cs)), jnp.float32)
    intr, post_rots, post_trans, k2s = _geometry(b, n, h_img, w_img, seed=2)

    def loss(prev, curr):
        cv = stereo_cost_volume(
            prev, curr, frustum, jnp.asarray(k2s), jnp.asarray(intr),
            jnp.asarray(post_rots), jnp.asarray(post_trans), bias=5.0,
            method="pallas", win_rows=4)
        # mix with a differentiable term so the grad isn't trivially zero
        return jnp.sum(cv) + jnp.sum(curr ** 2)

    g_prev, g_curr = jax.grad(loss, argnums=(0, 1))(prev, curr)
    assert float(jnp.abs(g_prev).max()) == 0.0
    np.testing.assert_allclose(np.asarray(g_curr), np.asarray(2 * curr),
                               rtol=1e-6)


def test_resolve_cv_method_serving_guard():
    """Serving entry points certify the compiled row window against the
    rig's actual inter-frame geometry and fall back to the exact XLA path
    instead of silently clipping taps (ADVICE r3)."""
    import dataclasses

    from dhd_tpu.config import get_config
    from dhd_tpu.data import synthetic_batch
    from dhd_tpu.models.dhd_stereo import resolve_cv_method

    cfg = get_config("dhd_micro_stereo")
    batch = synthetic_batch(cfg, batch_size=1, with_gt=False)
    hs = cfg.vt.input_size[0] // 4

    # an explicit cv_method always wins over the guard
    assert resolve_cv_method(
        dataclasses.replace(cfg, cv_method="xla"), batch,
        backend="tpu") == "xla"
    assert resolve_cv_method(
        dataclasses.replace(cfg, cv_method="pallas"), batch,
        backend="cpu") == "pallas"
    # non-TPU backends use the XLA path
    assert resolve_cv_method(dataclasses.replace(cfg, cv_method="auto"),
                             batch, backend="cpu") == "xla"
    # a full-image-height window always holds every in-image tap
    assert resolve_cv_method(
        dataclasses.replace(cfg, cv_method="auto", cv_win_rows=hs), batch,
        backend="tpu") == "pallas"
    # a 1-row window cannot hold a bilinear tap pair -> exact fallback
    assert resolve_cv_method(
        dataclasses.replace(cfg, cv_method="auto", cv_win_rows=1), batch,
        backend="tpu") == "xla"


def test_cv_static_plan_and_hwd_layout():
    """The streaming fast path — rig-static plan half + composed projective
    per-frame residual (cv_plan_from_static) and the transpose-free 'hwd'
    output layout — matches the stepwise plan and the XLA oracle (composed
    fp32 coordinates differ by ~1 ulp, so tolerance not bit-exactness)."""
    from dhd_tpu.ops.cost_volume_pallas import build_cv_static

    b, n, cs, hs, ws = 1, 2, 8, 16, 48
    h_img, w_img = hs * 4, ws * 4
    depth_grid = GridConfig(1.0, 9.0, 0.5)          # D=16
    frustum = create_frustum(depth_grid, (h_img, w_img), downsample=4)
    intr, post_rots, post_trans, k2s = _geometry(b, n, h_img, w_img, seed=9,
                                                 rot=False)
    rng = np.random.default_rng(6)
    prev = rng.normal(0, 1, (b, n, hs, ws, cs)).astype(np.float32)
    curr = rng.normal(0, 1, (b, n, hs, ws, cs)).astype(np.float32)
    args = (jnp.asarray(prev), jnp.asarray(curr),
            jnp.asarray(np.asarray(frustum, np.float32)), jnp.asarray(k2s),
            jnp.asarray(intr), jnp.asarray(post_rots),
            jnp.asarray(post_trans))
    ref = stereo_cost_volume(*args, bias=5.0)       # XLA oracle

    static = jax.jit(build_cv_static, static_argnames=("hs", "ws"))(
        args[2], args[4], args[5], args[6], hs=hs, ws=ws)
    out = stereo_cost_volume_pallas(*args, bias=5.0, win_rows=2,
                                    interpret=True, static=static)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)

    # hwd layout: (B*N, Hs, Ws, D) permutation of the same probabilities
    out_hwd = stereo_cost_volume_pallas(*args, bias=5.0, win_rows=2,
                                        interpret=True, static=static,
                                        out_layout="hwd")
    assert out_hwd.shape == (b * n, hs, ws, frustum.shape[0])
    np.testing.assert_allclose(
        np.asarray(out_hwd),
        np.transpose(np.asarray(out).reshape(b * n, -1, hs, ws),
                     (0, 2, 3, 1)), atol=1e-6)

    # the XLA path honours out_layout too
    ref_hwd = stereo_cost_volume(*args, bias=5.0, method="xla",
                                 out_layout="hwd")
    np.testing.assert_allclose(np.asarray(ref_hwd), np.asarray(out_hwd),
                               atol=2e-3, rtol=1e-3)


def test_vmem_scratch_guard_falls_back_to_xla():
    """Shapes whose prev-frame VMEM scratch cannot fit the 16 MiB scoped
    limit (e.g. fp32 DHD-M: 64x256x256 fp32 = 16.0 MiB) must take the
    exact XLA path instead of failing at Mosaic compile."""
    b, n, cs, hs, ws = 1, 1, 256, 64, 230           # wpad=256
    h_img, w_img = hs * 4, ws * 4
    depth_grid = GridConfig(1.0, 2.5, 0.5)          # D=3
    frustum = create_frustum(depth_grid, (h_img, w_img), downsample=4)
    intr, post_rots, post_trans, k2s = _geometry(b, n, h_img, w_img,
                                                 seed=11, rot=False)
    rng = np.random.default_rng(12)
    prev = rng.normal(0, 1, (b, n, hs, ws, cs)).astype(np.float32)
    curr = rng.normal(0, 1, (b, n, hs, ws, cs)).astype(np.float32)
    args = (jnp.asarray(prev), jnp.asarray(curr),
            jnp.asarray(np.asarray(frustum, np.float32)), jnp.asarray(k2s),
            jnp.asarray(intr), jnp.asarray(post_rots),
            jnp.asarray(post_trans))
    ref = stereo_cost_volume(*args, bias=5.0, method="xla")
    out = stereo_cost_volume_pallas(*args, bias=5.0, interpret=True)
    # same math, different jit scopes: fp32 reassociation of the C=256
    # channel sum moves softmax probs by ~3e-4
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)
    # hwd layout rides the fallback too
    out_hwd = stereo_cost_volume_pallas(*args, bias=5.0, interpret=True,
                                        out_layout="hwd")
    ref_hwd = stereo_cost_volume(*args, bias=5.0, method="xla",
                                 out_layout="hwd")
    np.testing.assert_allclose(np.asarray(out_hwd), np.asarray(ref_hwd),
                               atol=1e-3)
    # bf16 at the same shape fits (8 MiB) and must still take the kernel:
    # the guard keys on bytes, not shape
    from dhd_tpu.ops import cost_volume_pallas as cvp
    scratch = hs * cs * 256 * 2
    assert scratch <= 15 * 2 ** 20
