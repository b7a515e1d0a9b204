"""Differentiable volume rendering (dvr.render) — the 4D-occ training path.

Reference: lib/dvr/dvr.cu:391-648 (render_cuda_kernel) + dvr.cpp:51-59.
The CUDA kernel ray-marches a density grid with 3D-DDA (Amanatides-Woo),
computes the expected ray termination distance

    exp_d = sum_i p_i * d_i + p_out * max_d,
    p_i   = exp(-csd_{i-1}) - exp(-csd_i),  csd_i = sum_{k<=i} sigma_k dt_k,
    p_out = exp(-csd_last),

and hand-writes the gradient d(loss)/d(sigma) ("option 2: cap at the
boundary", dvr.cu:603-648).  That capped gradient is algebraically exactly
the autodiff gradient of exp_d as written (the boundary term's derivative
cancels because d_last == max_d), so the TPU-native design is simply a pure
JAX forward expressed with gathers under ``lax.scan`` — reverse-mode AD
reproduces the reference grad_sigma as a scatter-add, deterministically
(the CUDA kernel notes its own gradient race, dvr.cu:629).

Shapes follow the reference API: sigma (N, T, Z, Y, X); origin (N, T, 3)
and points (N, M, 3) in *voxel units* with (x, y, z) component order;
tindex (N, M) with t < 0 marking padded rays.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_LOSSES = ("l1", "l2", "absrel")


@partial(jax.jit, static_argnums=(3, 5))
def render_rays(sigma_flat: jnp.ndarray, origins: jnp.ndarray,
                endpts: jnp.ndarray, zyx: Tuple[int, int, int],
                base: jnp.ndarray | None = None,
                max_steps: int = 448
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Expected-depth render of M rays through a density grid (differentiable
    in ``sigma_flat``).

    Args:
      sigma_flat: (S,) flattened nonnegative densities; a ray's voxel
        (x, y, z) reads ``sigma_flat[base + (z * Y + y) * X + x]``.
      origins: (M, 3) per-ray origins, voxel units, (x, y, z).
      endpts: (M, 3) per-ray endpoints (the lidar returns).
      zyx: static grid extent (Z, Y, X).
      base: (M,) int32 flat offset per ray (selects the (n, t) slice);
        zeros when omitted.
      max_steps: DDA traversal budget (>= X+Y+Z+slack for in-grid origins).

    Returns:
      exp_d: (M,) expected termination distance (voxel units); 0 for rays
        that never enter the grid.
      gt_cap: (M,) ||endpt - origin|| capped at the last in-grid exit
        distance (the reference's gt_d capping, dvr.cu:594).
      entered: (M,) bool — ray visited >= 1 in-grid voxel (count > 0).
      truncated: (M,) bool — ray was still traversing in-grid when the
        ``max_steps`` scan budget ran out (its exp_d is partially
        accumulated; raise ``max_steps`` or mask such rays).  Rays that
        never reached the grid within the budget report
        ``entered=False`` instead.
    """
    vz, vy, vx = zyx
    sizes = jnp.asarray([vx, vy, vz], jnp.int32)
    m = endpts.shape[0]
    if base is None:
        base = jnp.zeros((m,), jnp.int32)
    rv = endpts - origins
    gt_d = jnp.linalg.norm(rv, axis=-1)
    dirs = rv / jnp.maximum(gt_d[:, None], 1e-12)
    step = jnp.where(dirs >= 0, 1, -1).astype(jnp.int32)
    v0 = origins.astype(jnp.int32)
    next_bound = v0 + (step > 0).astype(jnp.int32)
    big = jnp.float32(1e30)
    safe = jnp.where(dirs == 0, 1.0, dirs)
    tmax0 = jnp.where(dirs == 0, big, (next_bound - origins) / safe)
    tdelta = jnp.where(dirs == 0, big, step / safe)

    def body(carry, _):
        v, tmax, last_d, was_inside, done, csd, exp_d, max_d, entered = carry
        inside = jnp.all((v >= 0) & (v < sizes[None, :]), axis=-1)
        new_done = done | (was_inside & ~inside) | (~was_inside & ~inside
                                                    & (last_d > gt_d))
        # advance one voxel border (CUDA tie-break order, dvr.cu:533-553)
        pick_x = (tmax[:, 0] < tmax[:, 1]) & (tmax[:, 0] < tmax[:, 2])
        pick_y = ~(tmax[:, 0] < tmax[:, 1]) & (tmax[:, 1] < tmax[:, 2])
        axis = jnp.where(pick_x, 0, jnp.where(pick_y, 1, 2))
        _d = jnp.take_along_axis(tmax, axis[:, None], axis=1)[:, 0]
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        new_v = v + step * onehot
        new_tmax = tmax + jnp.take_along_axis(
            tdelta, axis[:, None], axis=1) * onehot.astype(tmax.dtype)

        # accumulate the voxel just exited (only while active + inside)
        active = inside & ~done
        vc = jnp.clip(v, 0, sizes[None, :] - 1)
        flat = base + (vc[:, 2] * vy + vc[:, 1]) * vx + vc[:, 0]
        sig = sigma_flat[flat]
        delta = jnp.maximum(0.0, _d - last_d)
        sd = jnp.where(active, sig * delta, 0.0)
        new_csd = csd + sd
        p = jnp.exp(-csd) - jnp.exp(-new_csd)         # 0 where sd == 0
        new_exp_d = exp_d + jnp.where(active, p * _d, 0.0)
        new_max_d = jnp.where(active, _d, max_d)

        upd = ~done
        carry = (jnp.where(upd[:, None], new_v, v),
                 jnp.where(upd[:, None], new_tmax, tmax),
                 jnp.where(upd, _d, last_d),
                 was_inside | inside,
                 new_done,
                 new_csd,
                 new_exp_d,
                 new_max_d,
                 entered | inside)
        return carry, None

    init = (v0, tmax0, jnp.zeros((m,), jnp.float32),
            jnp.zeros((m,), bool), jnp.zeros((m,), bool),
            jnp.zeros((m,), jnp.float32), jnp.zeros((m,), jnp.float32),
            jnp.zeros((m,), jnp.float32), jnp.zeros((m,), bool))
    (v_f, _, _, _, done_f, csd, exp_d, max_d, entered), _ = jax.lax.scan(
        body, init, None, length=max_steps)

    # rays still walking in-grid at the budget's end were truncated
    inside_f = jnp.all((v_f >= 0) & (v_f < sizes[None, :]), axis=-1)
    truncated = ~done_f & inside_f

    # imaginary sample at the boundary (dvr.cu:590-595)
    exp_d = exp_d + jnp.exp(-csd) * max_d
    exp_d = jnp.where(entered, exp_d, 0.0)
    gt_cap = jnp.where(entered, jnp.minimum(gt_d, max_d), gt_d)
    return exp_d, gt_cap, entered, truncated


def _flatten_rays(sigma, origin, points, tindex):
    n, t, vz, vy, vx = sigma.shape
    m = points.shape[1]
    ti = tindex.astype(jnp.int32)
    tc = jnp.clip(ti, 0, t - 1)
    ts = jnp.zeros_like(tc) if t == 1 else tc
    bidx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, m))
    base = (bidx * t + ts) * (vz * vy * vx)
    origins = jnp.take_along_axis(
        origin, tc[..., None], axis=1)              # (N, M, 3) via t
    return (sigma.reshape(-1), origins.reshape(-1, 3),
            points.reshape(-1, 3), base.reshape(-1), ti.reshape(-1) >= 0,
            (vz, vy, vx), (n, m))


def render_expected_depth(sigma: jnp.ndarray, origin: jnp.ndarray,
                          points: jnp.ndarray, tindex: jnp.ndarray,
                          max_steps: int = 448):
    """Differentiable core of dvr.render: (pred_dist, gt_dist, valid).

    pred_dist/gt_dist are -1 for padded (tindex < 0) or never-inside rays,
    matching the reference's output init (dvr.cu:664-665).  Gradients of any
    function of ``pred_dist`` flow to ``sigma``.  Rays whose DDA walk was
    truncated by ``max_steps`` while still in-grid are reported invalid
    (-1) rather than returning a partially accumulated depth.
    """
    sflat, origins, endpts, base, unpadded, zyx, (n, m) = _flatten_rays(
        sigma, origin, points, tindex)
    exp_d, gt_cap, entered, truncated = render_rays(sflat, origins, endpts,
                                                    zyx, base, max_steps)
    valid = unpadded & entered & ~truncated
    pred = jnp.where(valid, exp_d, -1.0).reshape(n, m)
    gt = jnp.where(valid, gt_cap, -1.0).reshape(n, m)
    return pred, gt, valid.reshape(n, m)


@partial(jax.jit, static_argnums=(4, 5))
def render(sigma: jnp.ndarray, origin: jnp.ndarray, points: jnp.ndarray,
           tindex: jnp.ndarray, loss_name: str = "l1",
           max_steps: int = 448):
    """dvr.render parity wrapper -> (pred_dist, gt_dist, grad_sigma).

    grad_sigma is d(sum of per-ray losses)/d(sigma) for loss_name in
    {'l1', 'l2', 'absrel'} (dvr.cu:617-625; l2 means the gradient is
    (pred - gt), i.e. the 0.5*(pred-gt)^2 loss).  Computed by reverse-mode
    AD through the renderer — bit-comparable to the reference's hand-written
    backward, but deterministic.
    """
    if loss_name not in _LOSSES:
        raise ValueError(f"loss_name must be one of {_LOSSES}")

    def total_loss(s):
        pred, gt, valid = render_expected_depth(s, origin, points, tindex,
                                                max_steps)
        diff = pred - gt
        if loss_name == "l1":
            per = jnp.abs(diff)
        elif loss_name == "l2":
            per = 0.5 * diff * diff
        else:
            per = jnp.abs(diff) / jnp.maximum(gt, 1e-12)
        return jnp.sum(jnp.where(valid, per, 0.0)), (pred, gt)

    (_, (pred, gt)), grad_sigma = jax.value_and_grad(
        total_loss, has_aux=True)(sigma)
    return pred, gt, grad_sigma
