"""NN building blocks vs torch oracles (resize, grid_sample, pooling)."""
import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from dhd_tpu.nn.layers import upsample_bilinear_align, max_pool2
from dhd_tpu.ops import grid_sample_2d


@pytest.mark.parametrize("hw,scale", [((25, 25), 4), ((100, 100), 2),
                                      ((7, 11), 2)])
def test_upsample_matches_torch_align_corners(hw, scale):
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, *hw, 5)).astype(np.float32)
    ours = np.asarray(upsample_bilinear_align(jnp.asarray(x), scale))
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        scale_factor=scale, mode="bilinear",
                        align_corners=True)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_grid_sample_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (2, 9, 13, 4)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, (2, 6, 7, 2)).astype(np.float32)
    ours = np.asarray(grid_sample_2d(jnp.asarray(x), jnp.asarray(grid)))
    ref = F.grid_sample(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        torch.from_numpy(grid), align_corners=True,
                        padding_mode="zeros")
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_borders_and_sentinels():
    """Exact border pixels, the half-open edge band, and the -2 sentinel the
    cost volume uses for behind-camera points (block-gather clamp paths)."""
    rng = np.random.default_rng(3)
    h, w = 5, 7
    x = rng.normal(0, 1, (1, h, w, 3)).astype(np.float32)
    # pixel-space targets incl. corners, edges, just-outside, far-outside
    pts = np.array([[0, 0], [w - 1, 0], [0, h - 1], [w - 1, h - 1],
                    [w - 1.5, h - 1.5], [-0.5, 2], [w - 0.5, 2],
                    [2, -0.5], [2, h - 0.5], [-40, -40], [200, 2],
                    [3.25, 1.75]], np.float32)
    gx = pts[:, 0] / (w - 1) * 2 - 1
    gy = pts[:, 1] / (h - 1) * 2 - 1
    grid = np.stack([gx, gy], -1).reshape(1, 1, -1, 2).astype(np.float32)
    grid = np.concatenate([grid, np.full_like(grid, -2.0)], axis=1)
    ours = np.asarray(grid_sample_2d(jnp.asarray(x), jnp.asarray(grid)))
    ref = F.grid_sample(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        torch.from_numpy(grid), align_corners=True,
                        padding_mode="zeros")
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)


def test_max_pool2_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (1, 8, 8, 3)).astype(np.float32)
    ours = np.asarray(max_pool2(jnp.asarray(x)))
    ref = F.max_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2)
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-6)


def test_resnet_stem_maxpool_matches_torch():
    """Stem maxpool(3, 2, pad 1) with -inf padding must equal torch."""
    from flax import linen as nn
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (1, 10, 10, 2)).astype(np.float32)
    padded = jnp.pad(jnp.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=-jnp.inf)
    ours = np.asarray(nn.max_pool(padded, (3, 3), strides=(2, 2)))
    ref = F.max_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), 3,
                       stride=2, padding=1)
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-6)
