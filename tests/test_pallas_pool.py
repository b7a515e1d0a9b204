"""Pallas segment-sum kernel vs jax.ops.segment_sum (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhd_tpu.ops.pallas_pool import (
    segment_sum_pooling, sorted_segment_sum_pallas)


def _case(p=3000, v=1000, c=64, seed=0, hot_frac=0.1):
    rng = np.random.default_rng(seed)
    vals = rng.normal(0, 1, (p, c)).astype(np.float32)
    seg = rng.integers(0, v, p)
    # a hot segment with many collisions + some dropped points
    seg[: int(p * hot_frac)] = v // 2
    seg[-5:] = v                     # out of range -> dropped
    return jnp.asarray(vals), jnp.asarray(seg.astype(np.int32)), v


def test_sorted_kernel_matches_segment_sum():
    vals, seg, v = _case()
    order = jnp.argsort(seg)
    out = sorted_segment_sum_pallas(
        jnp.take(vals, order, axis=0), jnp.take(seg, order), v,
        interpret=True)
    ref = jax.ops.segment_sum(vals, seg, num_segments=v + 1)[:-1]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_unsorted_entry_point():
    vals, seg, v = _case(seed=1)
    out = segment_sum_pooling(vals, seg, v, True)
    ref = jax.ops.segment_sum(vals, seg, num_segments=v + 1)[:-1]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_gradient_matches_xla_path():
    vals, seg, v = _case(p=800, v=300, c=16, seed=2)

    def loss_pallas(vals):
        return jnp.sum(segment_sum_pooling(vals, seg, v, True) ** 2)

    def loss_xla(vals):
        out = jax.ops.segment_sum(vals, seg, num_segments=v + 1)[:-1]
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss_pallas)(vals)
    g2 = jax.grad(loss_xla)(vals)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3)


def test_empty_and_full_blocks():
    # all points in one segment; many empty blocks
    c = 8
    vals = jnp.ones((1024, c), jnp.float32)
    seg = jnp.full((1024,), 513, jnp.int32)
    out = segment_sum_pooling(vals, seg, 1000, True)
    assert float(out[513, 0]) == 1024.0
    assert float(jnp.abs(out).sum()) == 1024.0 * c
