"""Fused Pallas LayerNorm (ops/layer_norm.py) parity vs flax nn.LayerNorm.

The kernel replaces nn.LayerNorm in the Swin backbone for TPU inference
(nn/swin.py FusedLayerNorm); these tests pin (a) interpret-mode kernel
parity against nn.LayerNorm at Swin-B shapes, (b) the module fallback
path being numerically identical to nn.LayerNorm (it is the training
path), (c) param-tree compatibility so checkpoints convert unchanged.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from dhd_tpu.nn.swin import FusedLayerNorm
from dhd_tpu.ops.layer_norm import fused_layer_norm


def _ref_ln(x, scale, bias, eps=1e-6):
    mod = nn.LayerNorm(epsilon=eps, dtype=x.dtype)
    return mod.apply({"params": {"scale": scale, "bias": bias}}, x)


@pytest.mark.parametrize("shape,dtype", [
    ((6, 176, 512), jnp.bfloat16),     # DHD-L stage-2-like (rows, C)
    ((2, 77, 128), jnp.bfloat16),      # partial trailing block
    ((3, 40, 256), jnp.float32),
])
def test_kernel_matches_flax_ln(shape, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 2, shape), dtype)
    c = shape[-1]
    scale = jnp.asarray(rng.normal(1, 0.2, (c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.5, (c,)).astype(np.float32))
    ref = _ref_ln(x, scale, bias)
    out = fused_layer_norm(x, scale, bias, interpret=True)
    assert out.dtype == ref.dtype and out.shape == ref.shape
    if dtype == jnp.bfloat16:
        # identical op order; only the lane-reduction order may differ
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=0.02, atol=0.02)
        flips = np.mean(np.asarray(out) != np.asarray(ref))
        assert flips < 0.05, flips
    else:
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_module_fallback_identical_to_flax():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 3, (4, 33, 96)), jnp.bfloat16)
    mod = FusedLayerNorm(use_kernel=False, dtype=jnp.bfloat16)
    v = mod.init(jax.random.PRNGKey(0), x)
    v = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(0.5, 0.3, p.shape), p.dtype), v)
    ref = nn.LayerNorm(dtype=jnp.bfloat16).apply(v, x)
    out = jax.jit(mod.apply)(v, x)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


def test_param_tree_matches_nn_layer_norm():
    x = jnp.zeros((2, 8, 64), jnp.float32)
    a = FusedLayerNorm().init(jax.random.PRNGKey(0), x)["params"]
    b = nn.LayerNorm().init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(a) == jax.tree.structure(b)
    assert all(a[k].shape == b[k].shape for k in a)


def test_kernel_grad_not_required():
    """The Swin wiring only enables the kernel when not training; the
    fallback path must be differentiable."""
    x = jnp.ones((2, 16, 128), jnp.float32)
    mod = FusedLayerNorm(use_kernel=False)
    v = mod.init(jax.random.PRNGKey(0), x)
    g = jax.grad(lambda vv: jnp.sum(mod.apply(vv, x) ** 2))(v)
    assert jnp.all(jnp.isfinite(g["params"]["scale"]))
