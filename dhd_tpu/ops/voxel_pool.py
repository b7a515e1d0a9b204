"""Frustum -> voxel pooling (BEVPoolv2) as TPU-native segment reductions.

The reference implements this with a CUDA scatter kernel over sorted point
ranks (ops/bev_pool_v2/src/bev_pool_cuda.cu:21-142) and builds the index
arrays with a dynamic-shape filter + argsort on device
(lss_heightmap.py:303-371).  On TPU we keep *static* shapes: every frustum
point exists, out-of-grid points are routed to one extra dummy segment that is
sliced off, and the scatter-add is a ``jax.ops.segment_sum`` whose transpose
(a gather) gives the backward pass for free — matching the CUDA backward
(bev_pool_cuda.cu:69-123) without a hand-written kernel.

The MGHS trick (4 pooling passes: full z-collapsed grid + 3 height-band slabs,
lss_heightmap.py:407-459) is fused here into TWO segment-sums sharing one
coordinate computation:

* the *BEV* pass pools ``depth * feat`` into the z-collapsed (Dz=1) grid;
* the *voxel* pass pools into the fine 16-layer grid with a per-point gate
  ``band_mask[pixel, band(z_voxel)]`` — algebraically identical to the
  reference's three masked pooling passes, because a point lands in exactly
  one fine z-voxel, which belongs to exactly one height band, and the band
  masks gate features per-pixel.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dhd_tpu.config import ViewTransformConfig


def _trunc_index(coord: jnp.ndarray, lower: float, interval: float
                 ) -> jnp.ndarray:
    """Voxelize with round-toward-zero semantics.

    The reference uses torch ``.long()`` (truncation), so values in
    (lower - interval, lower) also map to index 0 and pass the >= 0 bound
    check (lss_heightmap.py:331-348).  jnp ``astype(int32)`` truncates the
    same way; we replicate rather than 'fix' this for bit-parity.
    """
    return ((coord - lower) / interval).astype(jnp.int32)


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=("seg_bev", "seg_vox", "key", "band"),
                   meta_fields=("num_seg_bev", "num_seg_vox"))
@dataclasses.dataclass(frozen=True)
class PoolIndices:
    """Static-shape pooling indices for one batch of frustum geometry.

    All arrays are flattened over (B, N, D, fH, fW) points.
    ``seg_*`` index into the flattened output grid of the respective pass,
    with the value ``num_seg_*`` (one past the end) marking dropped points.

    The fine-voxel layout is **z-minor** (seg = pillar * Dz + z): on TPU
    this makes pooled outputs come out as (B, Dy, Dx, Dz, C), so the slab
    z-collapse downstream is a free reshape instead of a 164 MB transpose,
    and sorting by voxel id also sorts by BEV pillar (pillar = seg // Dz) —
    one sort feeds both pooling passes of the Pallas path.
    """
    seg_bev: jnp.ndarray      # (P,) int32 into [0, B*Dy*Dx]
    seg_vox: jnp.ndarray      # (P,) int32 into [0, B*Dy*Dx*Dz]
    key: jnp.ndarray          # (P,) int32 sort key: z-clipped voxel id for
    #                           every BEV-valid point, num_seg_vox otherwise
    band: jnp.ndarray         # (P,) int32 in [0, 2], band of the point's z voxel
    num_seg_bev: int
    num_seg_vox: int


def compute_pool_indices(coords: jnp.ndarray, vt: ViewTransformConfig
                         ) -> PoolIndices:
    """Build segment ids for the fused MGHS pooling.

    Args:
      coords: (B, N, D, fH, fW, 3) ego-frame xyz from
        :func:`dhd_tpu.geometry.frustum_to_ego`.
      vt: grid geometry.
    Returns:
      :class:`PoolIndices` with flattened (P,) segment ids.
    """
    b = coords.shape[0]
    dx, dy = vt.x.size, vt.y.size
    dz_fine = vt.z_fine.size
    s1, s2, _ = vt.slab_sizes

    x = coords[..., 0]
    y = coords[..., 1]
    z = coords[..., 2]
    xi = _trunc_index(x, vt.x.lower, vt.x.interval)
    yi = _trunc_index(y, vt.y.lower, vt.y.interval)
    zi_full = _trunc_index(z, vt.z_full.lower, vt.z_full.interval)
    zi_fine = _trunc_index(z, vt.z_fine.lower, vt.z_fine.interval)

    in_xy = (xi >= 0) & (xi < dx) & (yi >= 0) & (yi < dy)
    ok_bev = in_xy & (zi_full >= 0) & (zi_full < vt.z_full.size)
    ok_vox = in_xy & (zi_fine >= 0) & (zi_fine < dz_fine)

    batch_idx = jnp.arange(b, dtype=jnp.int32).reshape(
        (b,) + (1,) * (coords.ndim - 2))
    # the reference sorts by rank ((b*Dz + z)*Dy + y)*Dx + x and emits
    # (B, Dz, Dy, Dx, C) (lss_heightmap.py:351-354); we use the z-minor
    # pillar-major rank instead — same set of voxels, TPU-friendlier layout
    # (see PoolIndices docstring).
    num_seg_bev = b * vt.z_full.size * dy * dx
    num_seg_vox = b * dy * dx * dz_fine
    pillar = (batch_idx * dy + yi) * dx + xi
    zi_c = jnp.clip(zi_fine, 0, dz_fine - 1)
    seg_bev = pillar * vt.z_full.size + zi_full
    seg_vox = pillar * dz_fine + zi_fine
    key = pillar * dz_fine + zi_c
    seg_bev = jnp.where(ok_bev, seg_bev, num_seg_bev)
    seg_vox = jnp.where(ok_vox, seg_vox, num_seg_vox)
    key = jnp.where(ok_bev, key, num_seg_vox)

    band = jnp.where(zi_c < s1, 0, jnp.where(zi_c < s1 + s2, 1, 2))

    return PoolIndices(
        seg_bev=seg_bev.reshape(-1),
        seg_vox=seg_vox.reshape(-1),
        key=key.reshape(-1),
        band=band.reshape(-1).astype(jnp.int32),
        num_seg_bev=num_seg_bev,
        num_seg_vox=num_seg_vox,
    )


def mghs_pool(depth: jnp.ndarray, feat: jnp.ndarray, band_mask: jnp.ndarray,
              idx: PoolIndices, vt: ViewTransformConfig
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused MGHS pooling: one BEV splat + one height-gated fine-voxel splat.

    Equivalent to the reference's 4 bev_pool_v2 passes in
    MGHS.view_transform (lss_heightmap.py:407-459) — see module docstring for
    the fusion argument.

    Args:
      depth: (B, N, D, fH, fW) softmaxed depth distribution.
      feat: (B, N, fH, fW, C) context features (channels-last).
      band_mask: (B, N, fH, fW, 3) per-pixel height-band gate in {0, 1}.
      idx: precomputed :class:`PoolIndices`.
      vt: grid geometry.
    Returns:
      bev: (B, Dy, Dx, C) z-collapsed splat.
      vox: (B, Dy, Dx, Dz_fine, C) height-gated fine splat (z-minor).
    """
    b, n, d, fh, fw = depth.shape
    c = feat.shape[-1]
    dx, dy, dz = vt.x.size, vt.y.size, vt.z_fine.size

    # Outer product depth (x) feat, materialized once and shared by both
    # passes (XLA fuses the gate multiply).  (B, N, D, fH, fW, C)
    vals = depth[..., None] * feat[:, :, None]
    vals = vals.reshape(-1, c)

    # Per-point gate: the band mask of the point's *voxel* z band.  One-hot
    # compare-sum instead of take_along_axis — lowers to fused VPU selects
    # rather than a per-element gather over the (B,N,D,fH,fW) grid.
    bg = idx.band.reshape(b, n, d, fh, fw)
    bm = band_mask[:, :, None]                       # (B, N, 1, fH, fW, 3)
    gate = ((bg == 0) * bm[..., 0] + (bg == 1) * bm[..., 1]
            + (bg == 2) * bm[..., 2])
    gate = gate.reshape(-1, 1).astype(vals.dtype)

    # ONE scatter serves both passes (scatter-add cost on TPU is per-row
    # latency, so 2C-wide rows cost ~what C-wide rows do — the two separate
    # scatters measured 11.9 + 10.9 ms/step at B=4):
    # both halves scatter by the *z-clipped* voxel key (valid for every
    # BEV-valid point); the BEV grid is the z-sum of the ungated half
    # (exactly the Dz=1 collapse, since ok_vox implies ok_bev and the
    # z-slot a clipped point lands in sums out), and the gated half zeroes
    # points whose true z voxel is out of range.
    assert vt.z_full.size == 1, "main DHD grid is z-collapsed (Dz=1)"
    gate_eff = gate * (idx.seg_vox != idx.num_seg_vox
                       ).reshape(-1, 1).astype(vals.dtype)
    both = jnp.concatenate([vals, vals * gate_eff], axis=-1)
    out = jax.ops.segment_sum(both, idx.key,
                              num_segments=idx.num_seg_vox + 1)
    out = out[:-1].reshape(b, dy, dx, dz, 2 * c)
    bev = jnp.sum(out[..., :c], axis=3)
    vox = out[..., c:]
    return bev, vox


def build_pool_plan(idx: PoolIndices, vt: ViewTransformConfig,
                    cams_shape: Tuple[int, int, int, int, int]) -> dict:
    """Precompute the geometry-only half of the Pallas pooling: sort order,
    sorted ids, and kernel visit tables.

    The reference's 'accelerate' serving mode caches exactly this
    (lss_heightmap.py:374-378, tools/analysis_tools/benchmark.py:83-84):
    geometry depends only on calibration + augmentation, so a fixed camera
    rig reuses one plan across every frame and pooling degenerates to
    gathers + the kernel.

    Args:
      cams_shape: (B, N, D, fH, fW) of the depth tensor.
    """
    from dhd_tpu.ops.pallas_pool import (DEFAULT_BLOCK_V, DEFAULT_CHUNK_P,
                                         dual_visit_tables)

    b, n, d, fh, fw = cams_shape
    dz = vt.z_fine.size
    num_vox = idx.num_seg_vox
    p = idx.key.shape[0]
    key_s, order = jax.lax.sort(
        [idx.key, jnp.arange(p, dtype=jnp.int32)], num_keys=1)
    pixel = jnp.broadcast_to(
        (jnp.arange(b * n * fh * fw, dtype=jnp.int32)
         .reshape(b * n, 1, fh * fw)), (b * n, d, fh * fw)).reshape(-1)
    pixel_s = jnp.take(pixel, order)
    # depth-bin index of each sorted point ((B,N,D,fH,fW) flattening), and
    # the same point's id in *pixel-major* (B,N,fH,fW,D) flattening — the
    # layout the per-frame row gather reads (see mghs_pool_pallas)
    bin_s = (order // (fh * fw)) % d
    segv_s = jnp.take(idx.seg_vox, order)
    segb_s = jnp.where(key_s < num_vox, key_s // dz, idx.num_seg_bev)
    # chunk-padded copies for the fused kernel (v4): one whole-chunk
    # round-up plus one trailing all-padding chunk (the no-op visit
    # target).  Padding rows gather pixel 0 (garbage values); their
    # out-of-range segment ids drop them inside the kernel.
    chunk_p, block_v = DEFAULT_CHUNK_P, DEFAULT_BLOCK_V
    p_pad = ((p + chunk_p - 1) // chunk_p) * chunk_p + chunk_p
    v_pad = ((num_vox + block_v - 1) // block_v) * block_v
    nct = p_pad // chunk_p
    return {
        "order": order,
        "key_s": key_s,
        "segv_s": segv_s,
        "segb_s": segb_s,
        "band_s": jnp.take(idx.band, order),
        "pixel_s": pixel_s,
        "bin_s": bin_s,
        "pixel_pad": jnp.zeros((p_pad,), jnp.int32).at[:p].set(pixel_s),
        # every per-point table is lane-oriented (nct, 1, chunk_p): the
        # kernel transposes loaded rows in-VMEM for its per-row masks.
        # Column-shaped s32[nct, chunk_p, 1] plan entries are NOT free:
        # XLA assigns them {1,2,0:T(1,128)} and inserts a 1.2 ms relayout
        # copy per step per table at DHD-L scale (round-5 device trace).
        "bin_rows": jnp.zeros((p_pad,), jnp.int32).at[:p].set(bin_s)
        .reshape(nct, 1, chunk_p),
        "segv_rows": jnp.full((p_pad,), v_pad, jnp.int32).at[:p].set(segv_s)
        .reshape(nct, 1, chunk_p),
        "segb_rows": jnp.full((p_pad,), v_pad // dz, jnp.int32)
        .at[:p].set(segb_s).reshape(nct, 1, chunk_p),
        "band_grid": jnp.transpose(
            idx.band.reshape(b, n, d, fh, fw), (0, 1, 3, 4, 2)),
        "tables": dual_visit_tables(key_s, num_vox),
    }


def mghs_pool_pallas(depth: jnp.ndarray, feat: jnp.ndarray,
                     band_mask: jnp.ndarray, idx: Optional[PoolIndices],
                     vt: ViewTransformConfig,
                     interpret: bool = False,
                     plan: Optional[dict] = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused MGHS pooling on the Pallas TPU kernel (inference path).

    Numerically equivalent to :func:`mghs_pool` but runs the scatter as the
    sorted one-hot-matmul kernel (ops/pallas_pool.py): ONE sort by the
    z-minor voxel key feeds a dual-output kernel producing the fine voxel
    grid and the BEV grid in a single pass over the points.  The height
    gate is folded into the segment ids (a gated-off point simply becomes a
    dropped id), so no gate multiply happens anywhere.

    With ``plan`` (see :func:`build_pool_plan`) the sort and visit tables
    are reused across frames — the reference's 'accelerate' serving mode —
    and the per-frame cost is ONE row gather plus the kernel.  Training
    keeps :func:`mghs_pool` — XLA's segment_sum backward is a pure gather,
    while this path would need an extra scatter.

    Args:
      depth: (B, N, fH, fW, D) softmaxed depth distribution in *pixel-major*
        layout (the natural softmax output; the point-major transpose the
        XLA path wants is pure extra traffic here).

    Returns:
      bev: (B, Dy, Dx, C); vox: (B, Dy, Dx, Dz, C) in feat.dtype.
    """
    from dhd_tpu.ops.pallas_pool import mghs_pool_sorted_dual_fused

    b, n, fh, fw, d = depth.shape
    c = feat.shape[-1]
    dx, dy, dz = vt.x.size, vt.y.size, vt.z_fine.size
    assert vt.z_full.size == 1, "main DHD grid is z-collapsed (Dz=1)"
    if plan is None:
        plan = build_pool_plan(idx, vt, (b, n, d, fh, fw))
    num_vox = b * dy * dx * dz

    # Per-frame work: ONE row gather into sorted-point order, then the
    # kernel.  TPU gather throughput is row-count-bound, not byte-bound: a
    # per-point SCALAR gather of the gated depth measured 10.6 ms at DHD-L
    # scale (P=1.49M; ~150M elem/s is the TPU scalar-gather floor), and
    # pre-expanded (P, C+1) depth*feat rows from a P-row table 15.8 ms.
    # We gather [feat row | gated-depth row] in one pass from the SMALL
    # per-pixel table (B*N*fH*fW = 17k rows, C+D lanes); the depth-bin
    # one-hot select (exactly one nonzero, so it is exact), the gate
    # decode, the |depth| x feat multiply and the lane packing all run
    # INSIDE the kernel (pallas_pool v4) — as XLA ops they were five more
    # elementwise passes over (P, C)-class tensors, 7.6 ms at DHD-L.
    # The height gate rides in the depth's SIGN (sign = gate,
    # |.| = depth): band_mask is {0,1} (argmax bands), softmax depth is
    # >= 0, and a gated-off point whose bf16-cast depth underflowed to +0
    # contributes exactly 0 either way, so dropping it keeps bit-exactness
    # (bf16 shares f32's exponent range — only f32 values < 2^-133 round
    # to zero — and bf16(|x|) == |bf16(x)|, so casting the table to the
    # feature dtype BEFORE the gather leaves the products bit-identical).
    dt = feat.dtype
    bg = plan["band_grid"]                        # (B,N,fH,fW,D) int32
    gate = ((bg == 0) * band_mask[..., 0:1]
            + (bg == 1) * band_mask[..., 1:2]
            + (bg == 2) * band_mask[..., 2:3])
    dep = depth.astype(jnp.float32)
    dgg = jnp.where(gate > 0, dep, -dep)          # (B,N,fH,fW,D) f32
    table = jnp.concatenate(
        [feat.reshape(-1, c), dgg.astype(dt).reshape(-1, d)], axis=-1)
    # mode='clip': the plan's pixel ids are in [0, B*N*fH*fW) by
    # construction, so clamping is a no-op on the (P,) index vector; the
    # default 'fill' mode instead adds a full select pass over the
    # gathered (P, C+D) tensor (2.3 ms at DHD-L scale)
    gath = jnp.take(table, plan["pixel_pad"], axis=0,
                    mode="clip")                         # (P_pad, C+D)

    vox, bev = mghs_pool_sorted_dual_fused(
        gath, plan["bin_rows"], plan["segv_rows"],
        plan["segb_rows"], plan["tables"], num_vox, dz, c,
        interpret=interpret, out_dtype=feat.dtype)
    return (bev.reshape(b, dy, dx, c),
            vox.reshape(b, dy, dx, dz, c))


def bev_pool(feats: jnp.ndarray, coords: jnp.ndarray, b: int, dz: int,
             dy: int, dx: int, pool: str = "sum") -> jnp.ndarray:
    """Legacy LSS-style bev_pool (v1) API parity.

    The reference op (ops/bev_pool/bev_pool.py:6-126, bev_sum_pool_cuda.cu /
    bev_max_pool_cuda.cu) takes already-multiplied point features and integer
    voxel coords and sum- or max-pools per pillar.  Registered but unused by
    the DHD model path; provided for completeness.

    Args:
      feats: (P, C) point features.
      coords: (P, 4) int (x, y, z, batch) voxel coordinates; out-of-grid
        points must be pre-filtered or carry coords outside [0, size).
    Returns:
      (B, C, Dz, Dy, Dx) pooled grid (reference output layout).
    """
    c = feats.shape[-1]
    x, y, z, bi = (coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3])
    valid = ((x >= 0) & (x < dx) & (y >= 0) & (y < dy)
             & (z >= 0) & (z < dz) & (bi >= 0) & (bi < b))
    num_seg = b * dz * dy * dx
    seg = ((bi * dz + z) * dy + y) * dx + x
    seg = jnp.where(valid, seg, num_seg)
    if pool == "sum":
        out = jax.ops.segment_sum(feats, seg, num_segments=num_seg + 1)
    elif pool == "max":
        out = jax.ops.segment_max(feats, seg, num_segments=num_seg + 1)
        out = jnp.where(jnp.isneginf(out), 0.0, out)
    else:
        raise ValueError(pool)
    out = out[:-1].reshape(b, dz, dy, dx, c)
    return jnp.transpose(out, (0, 4, 1, 2, 3))


def bev_pool_v2(depth: jnp.ndarray, feat: jnp.ndarray,
                ranks_depth: jnp.ndarray, ranks_feat: jnp.ndarray,
                ranks_bev: jnp.ndarray,
                bev_feat_shape: Tuple[int, int, int, int, int]) -> jnp.ndarray:
    """API-parity port of the reference ``bev_pool_v2`` wrapper.

    out[ranks_bev[i]] += depth.flat[ranks_depth[i]] * feat.flat_rows[ranks_feat[i]]
    (ops/bev_pool_v2/bev_pool.py:86-106, bev_pool_cuda.cu:39-49).  Unlike the
    CUDA op this needs no interval_starts/lengths: segment_sum handles
    duplicate ranks, and autodiff provides the depth/feat gradients.

    Args:
      depth: (B, N, D, fH, fW); feat: (B, N, fH, fW, C).
      ranks_*: (P,) int32 index arrays (need not be sorted).
      bev_feat_shape: (B, Dz, Dy, Dx, C).
    Returns:
      (B, Dz, Dy, Dx, C) pooled grid (channels-last; callers can transpose).
    """
    b, dz, dy, dx, c = bev_feat_shape
    num_seg = b * dz * dy * dx
    d_flat = depth.reshape(-1)
    f_flat = feat.reshape(-1, feat.shape[-1])
    vals = d_flat[ranks_depth, None] * f_flat[ranks_feat]
    out = jax.ops.segment_sum(vals, ranks_bev, num_segments=num_seg)
    return out.reshape(b, dz, dy, dx, c)
