"""Pallas TPU kernel for the stereo matching cost volume.

The reference computes, for every (camera, depth-bin, stereo pixel), a
bilinear sample of the previous frame's stereo features and accumulates the
per-channel absolute difference against the current features
(model_utils/depthnet.py:310-361, F.grid_sample over 4-channel groups).  The
XLA port (ops/cost_volume.py) expresses the warp as a gather; on TPU the
gather floor is ~165 ms for DHD-M (see README) because each of the
B*N*D*Hs*Ws sample points moves only a few taps of data per gather row.

This kernel reformulates the warp for the MXU.  Bilinear sampling is
2-tap-separable, so for one 128-wide output tile of row ``h`` at depth ``d``

    warp(c, x) = sum_r wrow(x, r) * [ prev(r0+r, c, :) @ wcol(:, x) ]
    wcol(i, x) = relu(1 - |i - uf(x)|)     # 2 non-zeros over source cols
    wrow(x, r) = relu(1 - |r - (vf(x) - r0)|)   # 2 non-zeros over rows

i.e. ``win_rows`` MXU matmuls over the full source width sharing ONE
column-weight matrix, combined with scalar row weights on the VPU.  This is
exactly zero-padded ``align_corners=True`` bilinear sampling whenever every
in-image tap falls inside the row window (out-of-image taps contribute 0 on
both sides — that IS the zero padding — and are excluded from the
window-fit requirement by clamping them to a far sentinel in the plan).

Everything is laid out TRANSPOSED — channels on sublanes, output pixels on
lanes — which v2 ablations showed is worth ~2x: the |curr - warp| channel
reduction becomes a sublane reduction (cross-LANE reductions cost ~7
shuffle-ops per vreg and dominated v2 at ~30 of 77 ms on DHD-L), the
column-weight build happens once per depth on (Ws, 128) instead of once per
window row, and the per-depth uf/vf rows load with pixels on lanes.

Columns are NOT windowed: a 128-wide output tile of a near-depth plane
legitimately reads up to ~2x its width of source columns (radial stretch),
so per-depth column windows either clip valid taps — v1's wc=192 silently
clipped DHD-L tiles whose in-image span measured 254 columns on a plain
0.5 m-forward-motion rig — or save too little matmul K to pay for their
dynamic sublane-dim slices.  Row windows stay: ``win_rows=2`` suffices for
rigs with no in-plane inter-frame rotation (nuScenes), each extra row
tolerates one more row of tap drift across a tile (~0.45 deg of roll), and
``validate_cv_plan`` checks the plan's required window against the compiled
value once at serving setup instead of silently clipping (the XLA fallback
is exact for any geometry).

Granularity: one grid step owns one (camera, row, 128-wide tile) and sweeps
every depth bin in an in-kernel ``fori_loop`` — the previous frame's full
feature map stays VMEM-resident per camera (transposed: 12.6 MB for DHD-L
in bf16 with lane padding), the current tile is fetched once per step, and
each depth iteration runs win_rows (C, Ws) x (Ws, 128) MXU matmuls fused
with the cost reduction.  This amortizes grid/pipeline overhead over D
matmuls per step (a per-(d,h,t) grid was measured overhead-bound).

The row-window origins r0 and the fractional source coordinates (uf, vf)
are geometry-only — a "cv plan" computed in XLA from the frustum and the
inter-frame pose, the same split as the voxel-pooling plan.

The result feeds softmax(-cost) and is a constant under autodiff
(stop_gradient), mirroring the reference's @no_grad.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cost_volume import stereo_reproject_grid

TILE_W = 128


def _kernel(r0_ref, prev_hbm_ref, curr_ref, uf_ref, vf_ref, out_ref,
            prev_ref, copy_sem, *,
            n_d: int, n_h: int, n_t: int, wr: int, ws: int, bias: float):
    bn = pl.program_id(0)
    h = pl.program_id(1)
    t = pl.program_id(2)

    # The previous frame's full (transposed) feature map must be
    # VMEM-resident for the in-kernel depth sweep (arbitrary row windows
    # per depth), but at DHD-L scale it is ~12.6 MB — Pallas's pipelined
    # double-buffering would need 2x and OOM the ~16 MB VMEM.  So it
    # lives in HBM (ANY) and is DMA'd once per camera into a
    # single-buffered scratch.
    @pl.when(jnp.logical_and(h == 0, t == 0))
    def _load_prev():
        pltpu.make_async_copy(prev_hbm_ref.at[bn], prev_ref,
                              copy_sem).start()
        pltpu.make_async_copy(prev_hbm_ref.at[bn], prev_ref,
                              copy_sem).wait()

    curr = curr_ref[0, 0, 0].astype(jnp.float32)               # (C, 128)
    # source-column index, sublane-major: wcol below is (Wpad, 128).  The
    # source is zero-padded to Wpad columns, so a tap at column Ws (uf just
    # inside the right edge) reads zeros — exactly grid_sample's padding.
    coli = jax.lax.broadcasted_iota(jnp.int32, (ws, TILE_W), 0) \
        .astype(jnp.float32)

    # Unroll several depths per fori_loop iteration and batch the
    # dynamic-index memory traffic per group (one (U, 128) uf/vf load and
    # one (U, 128) out store instead of U of each).  Unrolling is
    # numerically identical.
    unroll = 8
    while n_d % unroll:
        unroll //= 2

    def body(i, carry):
        d0 = pl.multiple_of(i * unroll, unroll)
        uf8 = uf_ref[0, 0, 0, pl.ds(d0, unroll), :]         # (U, 128)
        vf8 = vf_ref[0, 0, 0, pl.ds(d0, unroll), :]
        rows = []
        for j in range(unroll):
            d = d0 + j
            r0 = r0_ref[((bn * n_d + d) * n_h + h) * n_t + t]
            uf = uf8[j]                                      # (128,) lanes
            vf = vf8[j] - r0.astype(jnp.float32)
            # ONE column-weight build per depth, shared by all window rows
            wcol = jnp.maximum(1.0 - jnp.abs(coli - uf[None, :]), 0.0)
            wcol = wcol.astype(prev_ref.dtype)               # (Ws, 128)
            acc = jnp.zeros((curr.shape[0], TILE_W), jnp.float32)
            for r in range(wr):
                src = prev_ref[r0 + r]                       # (C, Ws)
                wrow = jnp.maximum(1.0 - jnp.abs(vf - r), 0.0)
                # HIGHEST keeps f32 operands at f32 MXU precision (the
                # default is one bf16 pass — 2% cost drift vs the XLA
                # path); Mosaic rejects it for bf16 operands (native mode
                # is already exact products + f32 accumulate)
                prec = (jax.lax.Precision.HIGHEST
                        if src.dtype == jnp.float32 else None)
                acc += wrow[None, :] * jnp.dot(
                    src, wcol, preferred_element_type=jnp.float32,
                    precision=prec)
            # channel reduction on SUBLANES (C-major layout)
            cost = jnp.sum(jnp.abs(curr - acc), axis=0)      # (128,)
            # invalid where the warp sampled outside / behind the camera:
            # every tap weight is zero there, so the fp32 accumulator is
            # exactly 0 (channel-0 quirk, depthnet.py:354-356)
            invalid = acc[0] == 0.0
            rows.append(jnp.where(invalid, cost + bias, cost))
        out_ref[0, 0, 0, pl.ds(d0, unroll), :] = jnp.stack(rows, axis=0)
        return carry

    jax.lax.fori_loop(0, n_d // unroll, body, 0)


def build_cv_plan(frustum: jnp.ndarray, k2s_sensor: jnp.ndarray,
                  intrins: jnp.ndarray, post_rots: jnp.ndarray,
                  post_trans: jnp.ndarray, hs: int, ws: int,
                  win_rows: int = 2) -> dict:
    """Geometry-only warp plan: fractional source coords + window origins.

    Returns dict with
      uf, vf: (BN, D, H, Wpad) f32 source coords in stereo-grid units
        (align_corners=True unnormalization of gen_grid's [-1, 1] output);
        behind-camera / fully-out-of-image / padded lanes hold -1e4 so
        every tap weight is zero (== grid_sample zero padding).
      r0:     (BN*D*H*T,) int32 clamped win_rows-row window starts (scalar
              prefetch; DHD-L's BN*D*H*T is 203k -> 812 KB of 1 MB SMEM).
      wr_req: () f32 worst-case required row window over in-image taps;
              the kernel is exact iff wr_req <= win_rows.
      wr, wpad: static ints actually compiled.
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
    # behind-camera AND fully-out-of-image samples contribute exactly zero
    # (grid_sample zero padding); sending them to the sentinel keeps them
    # out of the row-window-fit requirement (a near-depth plane pushes
    # taps far outside the image — windows must not be sized for those)
    invalid = ((px <= -2.0) | (uf <= -1.0) | (uf >= ws)
               | (vf <= -1.0) | (vf >= hs))
    uf = jnp.where(invalid, -1e4, uf).reshape(b * n, d, hs, ws)
    vf = jnp.where(invalid, -1e4, vf).reshape(b * n, d, hs, ws)

    n_t = -(-ws // TILE_W)
    wpad = n_t * TILE_W
    pad = [(0, 0)] * 3 + [(0, wpad - ws)]
    uf = jnp.pad(uf, pad, constant_values=-1e4)
    vf = jnp.pad(vf, pad, constant_values=-1e4)

    # in-image row-tap extents per tile: lo = first row with nonzero
    # weight, hi = last (floor(v) and floor(v)+1, clamped to the image)
    fin = vf > -1e3
    lo = jnp.where(fin, jnp.maximum(jnp.floor(vf), 0.0), jnp.inf)
    hi = jnp.where(fin, jnp.minimum(jnp.floor(vf) + 1.0, hs - 1.0), -jnp.inf)
    lo = jnp.min(lo.reshape(b * n, d, hs, n_t, TILE_W), axis=-1)
    hi = jnp.max(hi.reshape(b * n, d, hs, n_t, TILE_W), axis=-1)
    ok = jnp.isfinite(lo)
    lo = jnp.where(ok, lo, 0.0)
    hi = jnp.where(ok, hi, 0.0)

    wr = int(win_rows)
    r0 = jnp.clip(lo.astype(jnp.int32), 0, max(hs - wr, 0))
    wr_req = jnp.max(hi - lo) + 1.0
    return {"uf": uf, "vf": vf, "r0": r0.reshape(-1),
            "wr_req": wr_req, "wr": wr, "wpad": wpad}


def build_cv_static(frustum: jnp.ndarray, intrins: jnp.ndarray,
                    post_rots: jnp.ndarray, post_trans: jnp.ndarray,
                    hs: int, ws: int) -> dict:
    """Rig-static half of the cv plan (streaming serving).

    The warp grid math splits at the perspective step: everything BEFORE
    the inter-frame pose — undo image aug, unproject to (u*d, v*d, d) — is
    geometry of the *current* rig only, and everything AFTER composes into
    ONE projective 3x4 per camera (intrins @ rots @ inv(intrins) folded
    with the aug re-apply and the pixel->stereo-grid scaling).  So the
    per-frame plan cost drops from the full grid pipeline (~15 ms at DHD-L
    shapes, several 286 MB intermediates) to one fused elementwise pass
    over 4 static planes (~2 ms): xyw = Q @ [P0; 1], uf = x/w, vf = y/w.

    Returns {p0: (4, BN, H, T, D, 128) fp32 static homogeneous points in
    KERNEL layout (padded lanes are all-zero -> w=0 -> invalid), fold: the
    (B, N, 2, 3) aug+scale fold matrix [S@A2 | S@b2], plus shapes}.
    Padded lanes hold zeros so the per-frame compose marks them invalid.
    """
    hp = jax.lax.Precision.HIGHEST
    b, n = intrins.shape[:2]
    d = frustum.shape[0]
    # steps 1-3 of stereo_reproject_grid: aug-undo + unprojection
    pts = frustum[None, None] - post_trans[:, :, None, None, None, :]
    pts = jnp.einsum("bnij,bndhwj->bndhwi", jnp.linalg.inv(post_rots), pts,
                     precision=hp)
    pts = jnp.concatenate([pts[..., :2] * pts[..., 2:3], pts[..., 2:3]],
                          axis=-1)                       # (B,N,D,H,W,3)
    n_t = -(-ws // TILE_W)
    wpad = n_t * TILE_W
    p0 = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    p0 = jnp.pad(p0.reshape(b * n, d, hs, ws, 4),
                 [(0, 0), (0, 0), (0, 0), (0, wpad - ws), (0, 0)])
    # kernel layout (BN, H, T, D, 128) with the 4 homogeneous components
    # stacked on a LEADING axis (a minor dim of 4 would pad to a 128-lane
    # tile: 32x the memory)
    p0 = jnp.transpose(p0.reshape(b * n, d, hs, n_t, TILE_W, 4),
                       (5, 0, 2, 3, 1, 4))
    # fold of steps 7-8: uv' = A2 @ (xy/w) + b2, then pixel->grid units
    # uf = (px+1)/2*(ws-1) with px = uv'.x/(img_w-1)*2-1
    img_h, img_w = hs * 4.0, ws * 4.0
    sx = (ws - 1.0) / (img_w - 1.0)
    sy = (hs - 1.0) / (img_h - 1.0)
    a2 = post_rots[:, :, :2, :2].astype(jnp.float32)
    b2 = post_trans[:, :, :2].astype(jnp.float32)
    scale = jnp.asarray([[sx], [sy]], jnp.float32)       # (2,1)
    fold = jnp.concatenate([a2, b2[..., None]], axis=-1) * scale  # (B,N,2,3)
    return {"p0": p0, "fold": fold,
            "intrins": intrins.astype(jnp.float32),
            "hs": hs, "ws": ws, "wpad": wpad, "d": d, "b": b, "n": n}


def cv_plan_from_static(static: dict, k2s_sensor: jnp.ndarray,
                        win_rows: int = 2) -> dict:
    """Per-frame cv plan from :func:`build_cv_static` + the inter-frame
    pose.  Same keys as :func:`build_cv_plan` plus layout='kernel' (uf/vf
    already in (BN, H, T, D, 128) kernel layout — no transposes).

    fp32-equivalent to build_cv_plan (the projective chain is composed
    into one 3x4 instead of applied step-by-step, so coordinates differ
    by ~1 ulp; the XLA fallback remains the exactness oracle)."""
    hp = jax.lax.Precision.HIGHEST
    b, n = k2s_sensor.shape[:2]
    # static shapes come from the arrays (the dict's int fields turn into
    # tracers when the dict rides through a jit boundary); ws is only used
    # in value comparisons, so a traced scalar is fine
    hs, wpad = static["p0"].shape[2], static["p0"].shape[3] * TILE_W
    ws = static["ws"]
    intr = static["intrins"]
    rots = k2s_sensor[:, :, :3, :3].astype(jnp.float32)
    trans = k2s_sensor[:, :, :3, 3].astype(jnp.float32)
    # Q = [K R K^-1 | K t]  (3x4); row 3 stays [0,0,1|t_z]-composed since
    # K's third row is [0,0,1]
    m = jnp.einsum("bnij,bnjk,bnkl->bnil", intr, rots, jnp.linalg.inv(intr),
                   precision=hp)
    t = jnp.einsum("bnij,bnj->bni", intr, trans, precision=hp)
    q = jnp.concatenate([m, t[..., None]], axis=-1)      # (B,N,3,4)
    # fold the post-division aug+scale (fold: (B,N,2,3) over [x,y,w]) into
    # the projective rows: uf = (fold @ [Qx p, Qy p, Qw p]) / (Qw p)
    qf = jnp.einsum("bnij,bnjk->bnik", static["fold"], q,
                    precision=hp)                        # (B,N,2,4)
    q = jnp.concatenate([qf, q[:, :, 2:3]], axis=2)
    q = q.reshape(b * n, 3, 4)

    p0 = static["p0"]                                    # (4,BN,H,T,D,128)

    # xyw_i = sum_j q[bn,i,j] * p0[j] — one fused elementwise pass over the
    # 4 static planes (per-camera scalars broadcast over (H,T,D,128))
    def comp(i):
        return (q[:, i, 0, None, None, None, None] * p0[0]
                + q[:, i, 1, None, None, None, None] * p0[1]
                + q[:, i, 2, None, None, None, None] * p0[2]
                + q[:, i, 3, None, None, None, None] * p0[3])

    x = comp(0)
    y = comp(1)
    w = comp(2)                                          # (BN,H,T,D,128)
    uf = x / w
    vf = y / w
    invalid = ((w < 1e-3) | (uf <= -1.0) | (uf >= ws)
               | (vf <= -1.0) | (vf >= hs))
    uf = jnp.where(invalid, -1e4, uf)
    vf = jnp.where(invalid, -1e4, vf)

    fin = vf > -1e3
    lo = jnp.where(fin, jnp.maximum(jnp.floor(vf), 0.0), jnp.inf)
    hi = jnp.where(fin, jnp.minimum(jnp.floor(vf) + 1.0, hs - 1.0),
                   -jnp.inf)
    lo = jnp.min(lo, axis=-1)                            # (BN,H,T,D)
    hi = jnp.max(hi, axis=-1)
    ok = jnp.isfinite(lo)
    lo = jnp.where(ok, lo, 0.0)
    hi = jnp.where(ok, hi, 0.0)
    wr = int(win_rows)
    r0 = jnp.clip(lo.astype(jnp.int32), 0, max(int(hs) - wr, 0))
    # scalar-prefetch order is (bn, d, h, t)
    r0 = jnp.transpose(r0, (0, 3, 1, 2)).reshape(-1)
    wr_req = jnp.max(hi - lo) + 1.0
    return {"uf": uf, "vf": vf, "r0": r0, "wr_req": wr_req, "wr": wr,
            "wpad": wpad, "layout": "kernel"}


def validate_cv_plan(plan: dict) -> dict:
    """Host-side exactness check for a built plan (serving-setup guard).

    Returns {"ok": bool, "wr_req": int}.  ok=False means the compiled
    win_rows would clip in-image taps for this geometry — raise
    cv_win_rows, or use cv_method='xla' (exact for any geometry).
    """
    wr_req = int(float(plan["wr_req"]))
    return {"ok": wr_req <= plan["wr"], "wr_req": wr_req}


@functools.partial(jax.jit, static_argnames=("bias", "win_rows",
                                             "interpret", "out_layout"))
def stereo_cost_volume_pallas(prev_feat: jnp.ndarray, curr_feat: jnp.ndarray,
                              frustum: jnp.ndarray, k2s_sensor: jnp.ndarray,
                              intrins: jnp.ndarray, post_rots: jnp.ndarray,
                              post_trans: jnp.ndarray, bias: float = 0.0,
                              win_rows: int = 2,
                              interpret: bool = False,
                              static: Optional[dict] = None,
                              out_layout: str = "ndhw") -> jnp.ndarray:
    """MXU cost volume; drop-in for ops.cost_volume.stereo_cost_volume.

    Args/returns as stereo_cost_volume: (B, N, Hs, Ws, C) features ->
    (B, N, D, Hs, Ws) softmaxed depth probabilities (stop-gradient), or
    (B*N, Hs, Ws, D) with ``out_layout='hwd'`` (what DepthNet consumes —
    the softmax runs in kernel layout and ONE transpose replaces two).

    ``static`` (:func:`build_cv_static`) switches the per-frame plan to
    the composed projective form (streaming serving; ~1 ulp coordinate
    difference vs build_cv_plan, see cv_plan_from_static).
    """
    b, n, hs, ws, c = curr_feat.shape
    d = frustum.shape[0]
    # the kernel's single-buffered prev-frame scratch is (hs, c, wpad) in
    # the feature dtype; beyond ~15 MiB it cannot fit the 16 MiB VMEM
    # scoped limit (fp32 DHD-M measures 16.0 MiB + 344 KiB of blocks).
    # Fall back to the exact XLA path instead of failing at compile.
    wpad_guard = -(-ws // TILE_W) * TILE_W
    scratch = hs * c * wpad_guard * jnp.dtype(prev_feat.dtype).itemsize
    if scratch > 15 * 2 ** 20:
        import logging

        from .cost_volume import stereo_cost_volume
        logging.getLogger(__name__).warning(
            "cost-volume: prev-frame VMEM scratch %.1f MiB exceeds the "
            "16 MiB budget at dtype %s — using the exact XLA path",
            scratch / 2 ** 20, prev_feat.dtype)
        return stereo_cost_volume(prev_feat, curr_feat, frustum, k2s_sensor,
                                  intrins, post_rots, post_trans, bias=bias,
                                  method="xla", out_layout=out_layout)
    if static is not None:
        plan = cv_plan_from_static(static, k2s_sensor, win_rows=win_rows)
    else:
        plan = build_cv_plan(frustum, k2s_sensor, intrins, post_rots,
                             post_trans, hs, ws, win_rows=win_rows)
    cost = cv_cost_pallas(prev_feat.reshape(b * n, hs, ws, c),
                          curr_feat.reshape(b * n, hs, ws, c),
                          plan, bias=bias, interpret=interpret,
                          raw_layout=out_layout == "hwd")
    if out_layout == "hwd":
        # cost is (BN, H, T, D, 128): softmax over D on the sublane dim,
        # then one transpose into the consumer's (BN, H, W, D)
        n_t = cost.shape[2]
        prob = jax.nn.softmax(-cost.astype(jnp.float32), axis=3)
        prob = jnp.transpose(prob, (0, 1, 2, 4, 3)).reshape(
            b * n, hs, n_t * TILE_W, d)[:, :, :ws]
        return jax.lax.stop_gradient(prob)
    prob = jax.nn.softmax(-cost[..., :ws].astype(jnp.float32), axis=1)
    return jax.lax.stop_gradient(prob.reshape(b, n, d, hs, ws))


def cv_cost_pallas(prev: jnp.ndarray, curr: jnp.ndarray, plan: dict, *,
                   bias: float, interpret: bool = False,
                   raw_layout: bool = False) -> jnp.ndarray:
    """Raw matching cost from a prebuilt cv plan: (BN, D, Hs, Wpad) f32,
    or the kernel-native (BN, Hs, T, D, 128) when ``raw_layout``."""
    bn, hs, ws, c = prev.shape
    uf, vf = plan["uf"], plan["vf"]
    if plan.get("layout") == "kernel":                 # (BN, H, T, D, 128)
        d, n_h = uf.shape[3], uf.shape[1]
        wpad = uf.shape[2] * TILE_W
    else:
        d, n_h, wpad = uf.shape[1], uf.shape[2], uf.shape[3]
    n_t = wpad // TILE_W
    wr = plan["wr"]
    # transposed layouts: channels on sublanes, pixels on lanes (see module
    # docstring) — one-time XLA transposes, fused/cheap next to the sweep.
    # prev is zero-padded to Wpad source columns: the DMA's minor dim must
    # be 128-aligned, and the padding doubles as grid_sample zero padding
    # for right-edge taps.
    prev_t = jnp.pad(jnp.transpose(prev, (0, 1, 3, 2)),
                     [(0, 0), (0, 0), (0, 0), (0, wpad - ws)])
    curr_p = jnp.pad(curr, [(0, 0), (0, 0), (0, wpad - ws), (0, 0)])
    curr_t = jnp.transpose(curr_p.reshape(bn, n_h, n_t, TILE_W, c),
                           (0, 1, 2, 4, 3))          # (BN, H, T, C, 128)

    # (BN, D, H, Wpad) -> (BN, H, T, D, 128): the per-step uf/vf/out blocks
    # sweep all of D, so D must sit in the (sublane-divisible) second-minor
    # block dim — a (1, D, 1, 128) block of the natural layout is rejected
    # by the Mosaic tiling rules.  Kernel-layout plans (cv_plan_from_static)
    # arrive pre-transposed.
    def to_kernel_layout(x):
        if plan.get("layout") == "kernel":
            return x
        return jnp.transpose(x.reshape(bn, d, n_h, n_t, TILE_W),
                             (0, 2, 3, 1, 4))

    kernel = functools.partial(_kernel, n_d=d, n_h=n_h, n_t=n_t,
                               wr=wr, ws=wpad, bias=bias)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bn, n_h, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 1, 1, c, TILE_W),
                         lambda bi, hi, ti, r0: (bi, hi, ti, 0, 0)),
            pl.BlockSpec((1, 1, 1, d, TILE_W),
                         lambda bi, hi, ti, r0: (bi, hi, ti, 0, 0)),
            pl.BlockSpec((1, 1, 1, d, TILE_W),
                         lambda bi, hi, ti, r0: (bi, hi, ti, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, d, TILE_W),
                               lambda bi, hi, ti, r0: (bi, hi, ti, 0, 0)),
        scratch_shapes=[pltpu.VMEM((hs, c, wpad), prev.dtype),
                        pltpu.SemaphoreType.DMA],
    )
    cost = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bn, n_h, n_t, d, TILE_W),
                                       jnp.float32),
        interpret=interpret,
    )(plan["r0"], prev_t, curr_t,
      to_kernel_layout(uf), to_kernel_layout(vf))
    if raw_layout:
        return cost
    return jnp.transpose(cost, (0, 3, 1, 2, 4)).reshape(bn, d, n_h, wpad)
