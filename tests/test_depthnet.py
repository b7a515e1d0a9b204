"""DepthNet / HeightNet / DeformConv units."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dhd_tpu.config import DepthNetConfig
from dhd_tpu.nn.depthnet import DeformConv, DepthNet, HeightNet


def test_deform_conv_zero_offsets_equals_plain_grouped_conv():
    """With zero offsets (the init state) DCN must equal a plain grouped
    3x3 conv with the same weights — verified against torch."""
    rng = np.random.default_rng(0)
    cin, cout, g = 8, 8, 4
    x = rng.normal(0, 1, (1, 6, 7, cin)).astype(np.float32)
    mod = DeformConv(cout, groups=g)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(mod.apply(variables, jnp.asarray(x)))

    # rebuild the torch weight from our (9, Cg, G, Og) kernel
    k = np.asarray(variables["params"]["kernel"])     # (9, cg, g, og)
    w_t = k.transpose(2, 3, 1, 0).reshape(cout, cin // g, 3, 3)
    ref = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(np.ascontiguousarray(w_t)), padding=1,
                   groups=g).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_deform_conv_offsets_move_samples():
    """Nonzero offsets must change the output (gradient path exists)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (1, 6, 6, 8)).astype(np.float32))
    mod = DeformConv(8, groups=4)
    variables = mod.init(jax.random.PRNGKey(0), x)
    base = mod.apply(variables, x)
    v2 = jax.tree.map(lambda a: a, variables)
    v2["params"]["conv_offset"]["bias"] = \
        v2["params"]["conv_offset"]["bias"] + 0.5
    out = mod.apply(v2, x)
    assert not np.allclose(np.asarray(base), np.asarray(out))


def test_depthnet_full_output_split():
    cfg = DepthNetConfig(use_dcn=False, use_aspp=True, aspp_mid_channels=8)
    mod = DepthNet(mid_channels=16, context_channels=12, depth_channels=10,
                   cfg=cfg)
    x = jnp.zeros((2, 4, 11, 16))
    mlp = jnp.zeros((2, 27))
    variables = mod.init(jax.random.PRNGKey(0), x, mlp)
    out = mod.apply(variables, x, mlp)
    assert out.shape == (2, 4, 11, 10 + 12)


def test_heightnet_stereo_cost_volume_input():
    cfg = DepthNetConfig(use_dcn=False, use_aspp=False, stereo=True)
    mod = HeightNet(mid_channels=16, height_channels=10, cfg=cfg)
    x = jnp.zeros((2, 4, 11, 16))
    mlp = jnp.zeros((2, 27))
    cv = jnp.zeros((2, 16, 44, 10))      # stereo res = 4x feature res
    variables = mod.init(jax.random.PRNGKey(0), x, mlp, cv)
    out = mod.apply(variables, x, mlp, cv)
    assert out.shape == (2, 4, 11, 10)
