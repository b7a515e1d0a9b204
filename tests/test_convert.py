"""Checkpoint conversion: exact round trip + completeness + ConvT semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dhd_tpu.config import get_config
from dhd_tpu.data import synthetic_batch
from dhd_tpu.io import params_to_torch, torch_to_params
from dhd_tpu.models import build_model


def _flat(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


@pytest.mark.parametrize("preset", ["dhd_s"])
@pytest.mark.slow
def test_roundtrip_exact(preset):
    cfg = get_config(preset)
    model = build_model(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, batch_size=1,
                                         with_gt=False).items()}
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=False))()
    variables = jax.tree.map(np.asarray, jax.device_get(variables))

    sd = params_to_torch(variables, cfg)
    back = torch_to_params(sd, cfg)

    assert "_unmapped" not in back, back.get("_unmapped")
    orig_p = _flat(variables["params"])
    conv_p = _flat(back["params"])
    missing = set(orig_p) - set(conv_p)
    assert not missing, sorted(missing)[:10]
    for k in orig_p:
        np.testing.assert_array_equal(conv_p[k], orig_p[k], err_msg=str(k))
    orig_s = _flat(variables["batch_stats"])
    conv_s = _flat(back["batch_stats"])
    assert set(orig_s) == set(conv_s)
    for k in orig_s:
        np.testing.assert_array_equal(conv_s[k], orig_s[k], err_msg=str(k))


@pytest.mark.parametrize("preset", [
    "dhd_m",
    pytest.param("dhd_l", marks=pytest.mark.slow),   # Swin-B tree: 23 s on
    # the 1-core bench host; the dhd_m case covers the same temporal rules
])
def test_roundtrip_structural_temporal(preset):
    """Structure-complete round trip for the temporal presets, using
    eval_shape (full init of Swin-B @512x1408 is too slow for CI)."""
    cfg = get_config(preset)
    model = build_model(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, batch_size=1,
                                         with_gt=False).items()}
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=False))
    rng = np.random.default_rng(0)
    variables = jax.tree.map(
        lambda s: rng.normal(0, 1, s.shape).astype(np.float32), shapes)
    sd = params_to_torch(variables, cfg)
    back = torch_to_params(sd, cfg)
    assert "_unmapped" not in back, back.get("_unmapped")[:10]
    orig = _flat(variables["params"])
    conv = _flat(back["params"])
    missing = set(orig) - set(conv)
    assert not missing, sorted(missing)[:10]
    for k in orig:
        np.testing.assert_array_equal(conv[k], orig[k], err_msg=str(k))
    # spot-check stereo/temporal-specific reference key names
    for key in [
        "img_view_transformer.depth_net.context_conv.weight",
        "img_view_transformer.depth_net.cost_volumn_net.0.weight",
        "img_view_transformer.depth_net.depth_conv.0.downsample.weight",
        "pre_process_net.layers.0.0.conv1.weight",
        "pre_process_net_3d.layers.0.0.downsample.weight",
    ]:
        assert key in sd, key
    if preset == "dhd_l":
        for key in [
            "img_backbone.patch_embed.projection.weight",
            "img_backbone.stages.0.blocks.1.attn.w_msa.qkv.weight",
            "img_backbone.stages.2.blocks.17.ffn.layers.1.bias",
            "img_backbone.stages.0.downsample.reduction.weight",
            "img_backbone.norm3.weight",
            ("img_backbone.stages.1.blocks.0.attn.w_msa."
             "relative_position_bias_table"),
        ]:
            assert key in sd, key


@pytest.mark.slow
def test_torch_keys_match_reference_naming():
    cfg = get_config("dhd_s")
    model = build_model(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, batch_size=1,
                                         with_gt=False).items()}
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=False))()
    sd = params_to_torch(jax.tree.map(np.asarray, variables), cfg)
    # spot-check key names against the reference state_dict layout
    for key in [
        "img_backbone.conv1.weight",
        "img_backbone.layer1.0.downsample.0.weight",
        "img_backbone.layer4.2.bn3.running_var",
        "img_neck.lateral_convs.1.conv.weight",
        "img_neck.fpn_convs.0.conv.bias",
        "img_view_transformer.depth_net.weight",
        "img_view_transformer.height_net.reduce_conv.0.weight",
        "img_view_transformer.height_net.bn.running_mean",
        "img_view_transformer.height_net.depth_mlp.fc1.weight",
        "img_view_transformer.height_net.depth_se.conv_reduce.weight",
        "img_view_transformer.height_net.depth_conv.0.conv1.weight",
        "img_view_transformer.height_net.depth_conv.3.aspp2.atrous_conv.weight",
        "img_view_transformer.height_net.depth_conv.4.conv_offset.weight",
        "img_view_transformer.height_net.depth_conv.5.weight",
        "img_bev_encoder_backbone.layers.0.0.conv1.weight",
        "img_bev_encoder_neck.conv.0.weight",
        "img_bev_encoder_neck.up2.4.bias",
        "img_voxel_encoder0.inc.double_conv.0.weight",
        "img_voxel_encoder1.up2.up.weight",
        "img_voxel_encoder2.outc.conv.bias",
        "mix.mysk_7.fc.0.weight",
        "mix.mysk_7.spacial_leanring.1.running_mean",
        "mix.mix_shortcut.0.weight",
        "occ_head.final_conv.conv.weight",
        "occ_head.predicter.2.bias",
    ]:
        assert key in sd, key
    # SE 1x1 convs must export as 4-D conv weights
    assert sd["img_view_transformer.height_net.depth_se.conv_reduce.weight"
              ].ndim == 4


def test_convtranspose_semantics_match_torch():
    """Our CONVT transform must make flax ConvTranspose equal torch's
    ConvTranspose2d (k=2, s=2) bit-for-bit."""
    from flax import linen as nn

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (1, 5, 7, 6)).astype(np.float32)   # NHWC
    w_t = rng.normal(0, 1, (6, 4, 2, 2)).astype(np.float32)  # (I, O, kh, kw)
    b_t = rng.normal(0, 1, (4,)).astype(np.float32)

    ref = F.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w_t),
        torch.from_numpy(b_t), stride=2).numpy().transpose(0, 2, 3, 1)

    mod = nn.ConvTranspose(4, (2, 2), strides=(2, 2))
    w_f = np.ascontiguousarray(
        w_t[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))
    variables = {"params": {"kernel": jnp.asarray(w_f),
                            "bias": jnp.asarray(b_t)}}
    out = np.asarray(mod.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5)
