"""Temporal+stereo model (DHD-M/L path) on the tiny stereo config."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full temporal/stereo forwards: ~6 min on CPU

from dhd_tpu.config import get_config
from dhd_tpu.data import synthetic_batch
from dhd_tpu.models import DHDStereoNet, build_model, uncollapse_z, collapse_z
from dhd_tpu.ops.cost_volume import stereo_cost_volume
from dhd_tpu.geometry import create_frustum
from dhd_tpu.config import GridConfig


@pytest.fixture(scope="module")
def stereo_setup():
    cfg = get_config("dhd_tiny_stereo")
    model = build_model(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, batch_size=1).items()}
    # jitted init (see test_model.py: eager init is minutes on 1 core)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)
    return cfg, model, batch, variables


def test_stereo_forward_shapes(stereo_setup):
    cfg, model, batch, variables = stereo_setup
    assert isinstance(model, DHDStereoNet)
    out = model.apply(variables, batch, train=False)
    dx, dy = cfg.vt.x.size, cfg.vt.y.size
    assert out["occ_logits"].shape == (1, dx, dy, cfg.head_Dz,
                                       cfg.num_classes)
    fh, fw = cfg.vt.feat_size
    assert out["depth"].shape == (1, cfg.num_cams, fh, fw, cfg.vt.D)
    assert np.isfinite(np.asarray(out["occ_logits"])).all()


def test_stereo_train_step():
    from dhd_tpu.train import create_train_state, make_optimizer, make_train_step
    cfg = get_config("dhd_tiny_stereo")
    model = build_model(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, batch_size=1, seed=2).items()}
    tx = make_optimizer(cfg.optim, steps_per_epoch=10)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch, tx)
    step = make_train_step(cfg, donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    # stereo models add depth supervision (DHD_model.py:610-612)
    for key in ("loss_depth", "loss_height", "loss_occ", "loss_total"):
        assert key in metrics and np.isfinite(float(metrics[key]))


def test_no_grad_through_prev_frames():
    """Only the key frame may contribute image-branch gradients
    (torch.no_grad rule, DHD_model.py:437-439)."""
    cfg = get_config("dhd_tiny_stereo")
    model = build_model(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, batch_size=1, seed=3).items()}
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)

    def loss_wrt_imgs(imgs):
        b = dict(batch)
        b["imgs"] = imgs
        out = model.apply(variables, b, train=False)
        return jnp.sum(out["occ_logits"] ** 2)

    g = jax.grad(loss_wrt_imgs)(batch["imgs"])
    g = np.asarray(g)
    # frame 0 (key) has gradient; frames 1.. (prev + extra ref) do not
    assert np.abs(g[:, 0]).sum() > 0
    assert np.abs(g[:, 1:]).sum() == 0


def test_with_prev_false_variant(stereo_setup):
    """SequentialControlHook early-epoch mode: skip history, zero cost
    volume + zero prev-BEV channels; output shape unchanged."""
    cfg, model, batch, variables = stereo_setup
    out = model.apply(variables, batch, train=False, with_prev=False)
    assert out["occ_logits"].shape == (
        1, cfg.vt.x.size, cfg.vt.y.size, cfg.head_Dz, cfg.num_classes)
    assert np.isfinite(np.asarray(out["occ_logits"])).all()
    # must differ from the with_prev=True output
    out_full = model.apply(variables, batch, train=False, with_prev=True)
    assert not np.allclose(np.asarray(out["occ_logits"]),
                           np.asarray(out_full["occ_logits"]))


def test_streaming_inference(stereo_setup):
    """Streaming mode: single-frame inputs + cached prev state."""
    cfg, model, batch, variables = stereo_setup
    # single-frame stream batch from the temporal batch's key frame
    sbatch = {
        "imgs": batch["imgs"][:, 0],
        "sensor2ego": batch["sensor2ego"][:, 0],
        "ego2global": batch["ego2global"][:, 0],
        "intrins": batch["intrins"][:, 0],
        "post_rots": batch["post_rots"][:, 0],
        "post_trans": batch["post_trans"][:, 0],
        "bda": batch["bda"],
    }
    out1, cache = model.apply(variables, sbatch, train=False, cache={})
    assert out1["occ_logits"].shape == (
        1, cfg.vt.x.size, cfg.vt.y.size, cfg.head_Dz, cfg.num_classes)
    assert set(cache) == {"stereo_feat", "bev", "vox", "cam2global"}
    # second step consumes the cache (ego moved forward a bit)
    sbatch2 = dict(sbatch)
    e2g = np.asarray(sbatch["ego2global"]).copy()
    e2g[..., 0, 3] += 0.5
    sbatch2["ego2global"] = jnp.asarray(e2g)
    out2, cache2 = model.apply(variables, sbatch2, train=False, cache=cache)
    assert np.isfinite(np.asarray(out2["occ_logits"])).all()
    assert not np.allclose(np.asarray(out1["occ_logits"]),
                           np.asarray(out2["occ_logits"]))


def test_cost_volume_identity_transform():
    """With identity k2s and equal features the cost is 0 everywhere visible
    -> near-uniform distribution over visible depth bins."""
    b, n, hs, ws, c = 1, 1, 4, 8, 8
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(0, 1, (b, n, hs, ws, c)).astype(np.float32))
    frustum = create_frustum(GridConfig(1.0, 5.0, 1.0), (hs * 4, ws * 4), 4)
    k2s = jnp.broadcast_to(jnp.eye(4), (b, n, 4, 4))
    intr = jnp.asarray([[[[20.0, 0, ws * 2], [0, 20.0, hs * 2],
                          [0, 0, 1.0]]]])
    pr = jnp.broadcast_to(jnp.eye(3), (b, n, 3, 3))
    pt = jnp.zeros((b, n, 3))
    cv = stereo_cost_volume(feat, feat, frustum, k2s, intr, pr, pt)
    assert cv.shape == (b, n, 4, hs, ws)
    np.testing.assert_allclose(np.asarray(cv.sum(2)), 1.0, atol=1e-5)
    # identical features & identity reprojection -> cost 0 for all d -> uniform
    center = np.asarray(cv[0, 0, :, hs // 2, ws // 2])
    np.testing.assert_allclose(center, 0.25, atol=1e-5)


def test_tiny_swin_stereo_assembly():
    """DHD-L-shaped assembly (Swin backbone + FPN_LSS neck + stereo) at tiny
    dims compiles and runs."""
    import dataclasses
    base = get_config("dhd_tiny_stereo")
    # width divisible by 32 so Swin's ceil patch-merging stays aligned with
    # the FPN_LSS upsample (real DHD-L input 512x1408 is divisible too)
    vt = dataclasses.replace(base.vt, input_size=(64, 192))
    cfg = dataclasses.replace(
        base,
        vt=vt,
        backbone="swin_base",
        swin_embed_dims=16, swin_depths=(1, 1, 2, 1),
        swin_num_heads=(1, 2, 4, 8), swin_window=4,
        img_neck="fpn_lss",
        img_neck_in_channels=(64, 128),
        img_neck_out_channels=base.vt.in_channels,
    )
    model = build_model(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, batch_size=1, seed=5).items()}
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch, train=False)
    assert out["occ_logits"].shape == (
        1, cfg.vt.x.size, cfg.vt.y.size, cfg.head_Dz, cfg.num_classes)
    assert np.isfinite(np.asarray(out["occ_logits"])).all()


def test_uncollapse_inverts_collapse():
    # z-minor layout: (B, Dy, Dx, Dz, C)
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (2, 6, 6, 4, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(uncollapse_z(collapse_z(x), 4)), np.asarray(x))


def test_streaming_pool_plan_matches_planless(stereo_setup):
    """batch["pool_plan"] (fixed-rig streaming serving) must reproduce the
    plan-less streaming output: the plan only precomputes the geometry-side
    sort/visit tables, so predictions are identical up to the pooling
    backend's accumulation order."""
    from dhd_tpu.models.dhd_stereo import build_stream_pool_plan
    cfg, model, batch, variables = stereo_setup
    sbatch = {
        "imgs": batch["imgs"][:, 0],
        "sensor2ego": batch["sensor2ego"][:, 0],
        "ego2global": batch["ego2global"][:, 0],
        "intrins": batch["intrins"][:, 0],
        "post_rots": batch["post_rots"][:, 0],
        "post_trans": batch["post_trans"][:, 0],
        "bda": batch["bda"],
    }
    out_ref, cache_ref = model.apply(variables, sbatch, train=False,
                                     cache={})
    sbatch_p = dict(sbatch)
    sbatch_p["pool_plan"] = build_stream_pool_plan(cfg, sbatch)
    out_p, cache_p = model.apply(variables, sbatch_p, train=False, cache={})
    np.testing.assert_allclose(np.asarray(out_p["occ_logits"]),
                               np.asarray(out_ref["occ_logits"]),
                               atol=2e-2, rtol=1e-3)
    # and a second step through the cache
    out2_ref, _ = model.apply(variables, sbatch, train=False,
                              cache=cache_ref)
    out2_p, _ = model.apply(variables, sbatch_p, train=False, cache=cache_p)
    np.testing.assert_allclose(np.asarray(out2_p["occ_logits"]),
                               np.asarray(out2_ref["occ_logits"]),
                               atol=2e-2, rtol=1e-3)
