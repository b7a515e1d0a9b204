"""Pallas TPU kernel for the stereo matching cost volume.

The reference computes, for every (camera, depth-bin, stereo pixel), a
bilinear sample of the previous frame's stereo features and accumulates the
per-channel absolute difference against the current features
(model_utils/depthnet.py:310-361, F.grid_sample over 4-channel groups).  The
XLA port (ops/cost_volume.py) expresses the warp as a gather; on TPU the
gather floor is ~165 ms for DHD-M (see README) because each of the
B*N*D*Hs*Ws sample points moves only a few taps of data per gather row.

This kernel reformulates the warp for the MXU.  The source feature map is
near-identity-warped per depth plane (epipolar displacement + small
rotation), so for one 128-wide output tile of row ``h`` at depth ``d`` the
contributing taps lie in a narrow window of the source: 4 rows x Wc columns
(Wc = min(Ws, 192); the stride-4 stereo features move ~1 source column per
output column, plus disparity/rotation slack).  Bilinear interpolation over
that window is a matmul with a 2-tap-separable weight matrix built in-kernel
from an iota compare:

    warp(x, c) = sum_r  wrow(x, r) * [ wcol(x, :) @ prev(r0+r, c0:c0+Wc, c) ]
    wrow(x, r) = relu(1 - |r - (vf(x) - r0)|)        # 2 non-zeros over rows
    wcol(x, i) = relu(1 - |i - (uf(x) - c0)|)        # 2 non-zeros over cols

which is exactly zero-padded ``align_corners=True`` bilinear sampling
whenever every non-zero-weight tap falls inside the window (taps outside the
*image* contribute 0 on both sides — that IS the zero padding).

Granularity: one grid step owns one (camera, row, 128-wide tile) and sweeps
every depth bin in an in-kernel ``fori_loop`` — the previous frame's full
feature map stays VMEM-resident per camera (5.8 MB for DHD-M, 11.5 MB for
DHD-L in bf16), the current tile is fetched once per step, and each depth
iteration runs 4 (128, Wc) x (Wc, C) MXU matmuls fused with the
|curr - warp| channel reduction.  This amortizes grid/pipeline overhead over
D * 4 matmuls per step (a per-(d,h,t) grid was measured overhead-bound).

The window origins (r0, c0) and the fractional source coordinates (uf, vf)
are geometry-only — a "cv plan" computed in XLA from the frustum and the
inter-frame pose, the same split as the voxel-pooling plan.  Tiles whose tap
span overflows the window (pathological inter-frame rotation) lose their
outermost taps and fall toward the invalid-bias path; the plan's ``span``
reports the worst span so a serving rig can be validated once against Wc.

The result feeds softmax(-cost) and is a constant under autodiff
(stop_gradient), mirroring the reference's @no_grad.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cost_volume import stereo_reproject_grid

WIN_ROWS = 4
TILE_W = 128


def _kernel(rc0_ref, prev_hbm_ref, curr_ref, uf_ref, vf_ref, out_ref,
            prev_ref, copy_sem, *,
            n_d: int, n_h: int, n_t: int, wc: int, bias: float):
    bn = pl.program_id(0)
    h = pl.program_id(1)
    t = pl.program_id(2)

    # The previous frame's full feature map must be VMEM-resident for the
    # in-kernel depth sweep (arbitrary 4-row windows per depth), but at
    # DHD-L scale it is 11.5 MB — Pallas's pipelined double-buffering
    # would need 2x and OOM the ~16 MB VMEM.  So it lives in HBM (ANY)
    # and is DMA'd once per camera into a single-buffered scratch.
    @pl.when(jnp.logical_and(h == 0, t == 0))
    def _load_prev():
        pltpu.make_async_copy(prev_hbm_ref.at[bn], prev_ref,
                              copy_sem).start()
        pltpu.make_async_copy(prev_hbm_ref.at[bn], prev_ref,
                              copy_sem).wait()

    curr = curr_ref[0, 0].astype(jnp.float32)                  # (128, C)
    # one (128, 4*Wc) weight matrix per depth — the 4 window rows are
    # contiguous in the scratch, so the whole bilinear warp is a single
    # K=4*Wc MXU matmul (4 separate K=Wc dots were measured MXU-bound at
    # ~17% on DHD-L shapes)
    lin4 = jax.lax.broadcasted_iota(jnp.int32, (TILE_W, WIN_ROWS * wc), 1)
    colw = (lin4 % wc).astype(jnp.float32)
    roww = (lin4 // wc).astype(jnp.float32)

    # Unroll several depths per fori_loop iteration and batch the
    # dynamic-index memory traffic per group (one (U, 128) uf/vf load and
    # one (U, 128) out store instead of U of each): ablation on DHD-L
    # shapes showed ~100 of 135 ms was loop-iteration overhead + dynamic
    # single-row loads/stores, NOT the weight build (~0 ms) or the warp
    # matmul (~35 ms).  Unrolling is numerically identical.
    unroll = 8
    while n_d % unroll:
        unroll //= 2

    def body(i, carry):
        d0 = i * unroll
        uf8 = uf_ref[0, 0, 0, pl.ds(d0, unroll), :]         # (U, 128)
        vf8 = vf_ref[0, 0, 0, pl.ds(d0, unroll), :]
        rows = []
        for j in range(unroll):
            d = d0 + j
            lin = ((bn * n_d + d) * n_h + h) * n_t + t
            # r0/c0 packed as (r0 << 16 | c0): the whole scalar-prefetch
            # array must fit SMEM (1 MB), and DHD-L's BN*D*H*T is 203k
            rc0 = rc0_ref[lin]
            r0 = jax.lax.shift_right_logical(rc0, 16)
            # the plan aligns c0 to 8 (sublane granularity); Mosaic needs
            # the proof spelled out for the dynamic sublane-dim slice
            c0 = pl.multiple_of(jax.lax.bitwise_and(rc0, 0xFFFF), 8)
            uf = uf8[j] - c0.astype(jnp.float32)             # (128,)
            vf = vf8[j] - r0.astype(jnp.float32)
            w = (jnp.maximum(1.0 - jnp.abs(colw - uf[:, None]), 0.0)
                 * jnp.maximum(1.0 - jnp.abs(roww - vf[:, None]), 0.0))
            src = prev_ref[pl.ds(r0, WIN_ROWS), pl.ds(c0, wc), :] \
                .reshape(WIN_ROWS * wc, curr.shape[-1])
            acc = jnp.dot(w.astype(src.dtype), src,
                          preferred_element_type=jnp.float32)
            cost = jnp.sum(jnp.abs(curr - acc), axis=-1)     # (128,)
            # invalid where the warp sampled outside / behind the camera:
            # every tap weight is zero there, so the fp32 accumulator is
            # exactly 0 (channel-0 quirk, depthnet.py:354-356)
            invalid = acc[:, 0] == 0.0
            rows.append(jnp.where(invalid, cost + bias, cost))
        out_ref[0, 0, 0, pl.ds(d0, unroll), :] = jnp.stack(rows, axis=0)
        return carry

    jax.lax.fori_loop(0, n_d // unroll, body, 0)


def build_cv_plan(frustum: jnp.ndarray, k2s_sensor: jnp.ndarray,
                  intrins: jnp.ndarray, post_rots: jnp.ndarray,
                  post_trans: jnp.ndarray, hs: int, ws: int,
                  window_cols: int) -> dict:
    """Geometry-only warp plan: fractional source coords + window origins.

    Returns dict with
      uf, vf: (BN, D, H, Wpad) f32 source coords in stereo-grid units
        (align_corners=True unnormalization of gen_grid's [-1, 1] output);
        invalid / padded lanes hold -1e4 so every tap weight is zero.
      rc0:    (BN*D*H*T,) int32 packed (r0 << 16 | c0) clamped window
              starts: r0 = 4-row window start, c0 = 8-aligned Wc-column
              window start (zero when Wc == Ws).  Packed so the kernel's
              scalar-prefetch stays within the 1 MB SMEM at DHD-L scale.
      span:   () f32 worst-case column tap span (diagnostic; must be
              <= Wc - 9 for the windowed warp to be exact).
    """
    b, n = k2s_sensor.shape[:2]
    d = frustum.shape[0]
    img_h, img_w = hs * 4, ws * 4
    grid = stereo_reproject_grid(frustum, k2s_sensor, intrins, post_rots,
                                 post_trans, img_h, img_w)   # (B,N,D,H,W,2)
    px, py = grid[..., 0], grid[..., 1]
    # grid_sample(align_corners=True) over the (Hs, Ws) feature map
    uf = (px + 1.0) * 0.5 * (ws - 1)
    vf = (py + 1.0) * 0.5 * (hs - 1)
    invalid = px <= -2.0
    uf = jnp.where(invalid, -1e4, uf).reshape(b * n, d, hs, ws)
    vf = jnp.where(invalid, -1e4, vf).reshape(b * n, d, hs, ws)

    n_t = -(-ws // TILE_W)
    wpad = n_t * TILE_W
    pad = [(0, 0)] * 3 + [(0, wpad - ws)]
    uf = jnp.pad(uf, pad, constant_values=-1e4)
    vf = jnp.pad(vf, pad, constant_values=-1e4)

    # per-tile window origins from the finite coords (invalid -> +inf for
    # the min so all-invalid tiles land at origin 0)
    def tile_min(x):
        x = jnp.where(x <= -1e3, jnp.inf, x)
        m = jnp.min(x.reshape(b * n, d, hs, n_t, TILE_W), axis=-1)
        return jnp.where(jnp.isfinite(m), m, 0.0)

    r0 = jnp.clip(jnp.floor(tile_min(vf)).astype(jnp.int32),
                  0, max(hs - WIN_ROWS, 0))
    wc = min(window_cols, wpad)
    if wc >= ws:
        wc = ws
        c0 = jnp.zeros_like(r0)
    else:
        c0 = jnp.floor(tile_min(uf)).astype(jnp.int32)
        c0 = jnp.clip((c0 // 8) * 8, 0, ws - wc)

    u_fin = jnp.where(uf <= -1e3, jnp.nan, uf) \
        .reshape(b * n, d, hs, n_t, TILE_W)
    span = jnp.nanmax(
        jnp.nanmax(u_fin, axis=-1) - jnp.nanmin(u_fin, axis=-1))
    # row-direction analogue: the 4-row window clips taps when the
    # epipolar line tilts more than ~2 rows across a 128-wide tile
    # (in-plane rotation); must be <= WIN_ROWS - 2 for exactness.  The
    # XLA fallback (cv_method='xla') is exact for any geometry.
    v_fin = jnp.where(vf <= -1e3, jnp.nan, vf) \
        .reshape(b * n, d, hs, n_t, TILE_W)
    rspan = jnp.nanmax(
        jnp.nanmax(v_fin, axis=-1) - jnp.nanmin(v_fin, axis=-1))
    rc0 = jax.lax.shift_left(r0, 16) | c0
    return {"uf": uf, "vf": vf, "rc0": rc0.reshape(-1),
            "span": span, "rspan": rspan, "wc": wc, "wpad": wpad}


@functools.partial(jax.jit, static_argnames=("bias", "window_cols",
                                             "interpret"))
def stereo_cost_volume_pallas(prev_feat: jnp.ndarray, curr_feat: jnp.ndarray,
                              frustum: jnp.ndarray, k2s_sensor: jnp.ndarray,
                              intrins: jnp.ndarray, post_rots: jnp.ndarray,
                              post_trans: jnp.ndarray, bias: float = 0.0,
                              window_cols: int = 192,
                              interpret: bool = False) -> jnp.ndarray:
    """MXU cost volume; drop-in for ops.cost_volume.stereo_cost_volume.

    Args/returns as stereo_cost_volume: (B, N, Hs, Ws, C) features ->
    (B, N, D, Hs, Ws) softmaxed depth probabilities (stop-gradient).
    """
    b, n, hs, ws, c = curr_feat.shape
    d = frustum.shape[0]
    plan = build_cv_plan(frustum, k2s_sensor, intrins, post_rots, post_trans,
                         hs, ws, window_cols)
    cost = cv_cost_pallas(prev_feat.reshape(b * n, hs, ws, c),
                          curr_feat.reshape(b * n, hs, ws, c),
                          plan, bias=bias, interpret=interpret)
    prob = jax.nn.softmax(-cost[..., :ws].astype(jnp.float32), axis=1)
    return jax.lax.stop_gradient(prob.reshape(b, n, d, hs, ws))


def cv_cost_pallas(prev: jnp.ndarray, curr: jnp.ndarray, plan: dict, *,
                   bias: float, interpret: bool = False) -> jnp.ndarray:
    """Raw (BN, D, Hs, Wpad) f32 matching cost from a prebuilt cv plan."""
    bn, hs, ws, c = prev.shape
    uf, vf = plan["uf"], plan["vf"]
    d, n_h, wpad = uf.shape[1], uf.shape[2], uf.shape[3]
    n_t = wpad // TILE_W
    wc = plan["wc"]
    curr_p = jnp.pad(curr, [(0, 0), (0, 0), (0, wpad - ws), (0, 0)])
    # (BN, D, H, Wpad) -> (BN, H, T, D, 128): the per-step uf/vf/out blocks
    # sweep all of D, so D must sit in the (sublane-divisible) second-minor
    # block dim — a (1, D, 1, 128) block of the natural layout is rejected
    # by the Mosaic tiling rules
    def to_kernel_layout(x):
        return jnp.transpose(x.reshape(bn, d, n_h, n_t, TILE_W),
                             (0, 2, 3, 1, 4))

    kernel = functools.partial(_kernel, n_d=d, n_h=n_h, n_t=n_t, wc=wc,
                               bias=bias)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bn, n_h, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 1, TILE_W, c),
                         lambda bi, hi, ti, rc0: (bi, hi, ti, 0)),
            pl.BlockSpec((1, 1, 1, d, TILE_W),
                         lambda bi, hi, ti, rc0: (bi, hi, ti, 0, 0)),
            pl.BlockSpec((1, 1, 1, d, TILE_W),
                         lambda bi, hi, ti, rc0: (bi, hi, ti, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, d, TILE_W),
                               lambda bi, hi, ti, rc0: (bi, hi, ti, 0, 0)),
        scratch_shapes=[pltpu.VMEM((hs, ws, c), prev.dtype),
                        pltpu.SemaphoreType.DMA],
    )
    cost = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bn, n_h, n_t, d, TILE_W),
                                       jnp.float32),
        interpret=interpret,
    )(plan["rc0"], prev, curr_p,
      to_kernel_layout(uf), to_kernel_layout(vf))
    return jnp.transpose(cost, (0, 3, 1, 2, 4)).reshape(bn, d, n_h, wpad)
