"""Numerically careful rigid-transform (SE3) composition helpers.

The reference computes key-ego alignment in double precision
(detectors/bevdet.py:72-74 `.double()`): nuScenes ego2global translations are
O(1000 m), and the temporal keyego2adjego composition subtracts near-equal
global poses, where naive fp32 `inv(A) @ B` loses ~cm of accuracy (the
inverse materializes a -R^T t term of magnitude ~1000 m before the
cancellation happens).

On TPU fp64 is unavailable/slow, so instead of emulating doubles we exploit
the SE3 structure: for rigid transforms

    inv(A) @ B = [Ra^T Rb | Ra^T (tb - ta)]

The translation difference ``tb - ta`` is computed *first* — the large
near-equal components cancel exactly in floating point (Sterbenz) — so the
result is accurate to the ulp of the *relative* motion (~1e-7 m for adjacent
nuScenes frames), not of the global position.  Host-side (data pipeline)
callers should still precompute in np.float64 where they can; these helpers
make the in-jit fallback paths safe.
"""
from __future__ import annotations

import jax.numpy as jnp


def rigid_inverse(a: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a rigid 4x4 transform: [R | t]^-1 = [R^T | -R^T t].

    Exact-structure alternative to ``jnp.linalg.inv`` (no LU roundoff, no
    garbage in the bottom row).  Supports arbitrary leading batch dims.
    """
    r = a[..., :3, :3]
    t = a[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", rt, t)
    return _compose(rt, ti, a.dtype)


def rigid_relative(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``inv(a) @ b`` for rigid transforms, cancellation-free.

    Accurate even when both translations are O(1000 m) but nearly equal
    (the nuScenes temporal case): ``tb - ta`` is formed before any rotation
    touches the large values.
    """
    ra = a[..., :3, :3]
    ta = a[..., :3, 3]
    rb = b[..., :3, :3]
    tb = b[..., :3, 3]
    rat = jnp.swapaxes(ra, -1, -2)
    r = jnp.einsum("...ij,...jk->...ik", rat, rb)
    t = jnp.einsum("...ij,...j->...i", rat, tb - ta)
    return _compose(r, t, a.dtype)


def _compose(r: jnp.ndarray, t: jnp.ndarray, dtype) -> jnp.ndarray:
    out = jnp.zeros(r.shape[:-2] + (4, 4), dtype)
    out = out.at[..., :3, :3].set(r)
    out = out.at[..., :3, 3].set(t)
    return out.at[..., 3, 3].set(1.0)
