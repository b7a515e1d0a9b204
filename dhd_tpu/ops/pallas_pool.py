"""Pallas TPU kernel for the frustum->voxel pooling segment-sum.

The CUDA reference assigns one thread per (pillar, channel) and walks its
sorted point interval (bev_pool_cuda.cu:21-50).  The TPU-native analogue
reshapes the problem for the MXU: points are sorted by output segment, the
output grid is processed in blocks of ``block_v`` pillars, and each block
accumulates ``onehot(local_seg) @ vals`` — a (block_v x chunk_p) x
(chunk_p x C) matmul per point chunk.

v3 design (what finally beats XLA's scatter):

* **visit grid** — the grid iterates over (output block, point chunk)
  *visits*, precomputed host-side from a searchsorted over the sorted ids
  (the interval_starts analogue, lss_heightmap.py:360-368).  Input chunks
  and output blocks are ordinary pipelined BlockSpecs whose index_map reads
  the prefetched visit tables, so Mosaic's own pipeline machinery
  double-buffers the chunk DMAs *across block boundaries* — v1/v2 issued
  DMAs inside the kernel body and paid ~2 us of exposed latency per block
  (most blocks touch a single chunk, so in-block double buffering hid
  nothing).
* **revisiting accumulation** — consecutive visits of one output block keep
  it resident in VMEM (the standard reduction-grid pattern); a prefetched
  ``first``-flag zeroes the fp32 accumulator.
* **two-pillar lane packing** — with C <= 64 channels, pillar 2r rides in
  lanes [0:64) and pillar 2r+1 in lanes [64:128) of output row r (packed
  host-side where XLA fuses it into the padding copy), halving output
  traffic, matmul FLOPs and one-hot build work.
* **bf16 matmul, fp32 accumulation** — the model path is bf16; fp32 vals
  stay exact (fp32 MXU passes).

Empty blocks get one forced visit that writes zeros.  The backward pass of
a segment-sum is a gather, so the public entry point carries a custom_vjp
and training works identically to the XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_V = 1024   # pillars per output block (rows of the onehot matmul)
DEFAULT_CHUNK_P = 256    # points per pipelined chunk


def _kernel(cof_ref, bof_ref, first_ref, pad_ref, vals_ref, seg_ref, out_ref,
            acc_ref, *, block_v: int, chunk_p: int, c: int, pack: int):
    v = pl.program_id(0)
    base = bof_ref[v] * block_v
    rows_v = block_v // pack

    @pl.when(first_ref[v] == 1)
    def _():
        acc_ref[:] = jnp.zeros((rows_v, c), jnp.float32)
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)

    # trailing no-op visits (static grid padding) skip all compute; their
    # input block index repeats, so the pipeline doesn't even re-fetch it
    @pl.when(cof_ref[v] != pad_ref[0])
    def _():
        seg = seg_ref[0, 0, :]                          # (chunk_p,) int32
        local = seg - base
        if pack == 2:
            # vals were lane-packed host-side by pillar parity; two pillars
            # fold onto one output row.  Arithmetic >> keeps negatives
            # negative: no spurious row match for out-of-block points.
            local = jax.lax.shift_right_arithmetic(local, 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (rows_v, chunk_p), 0)
        vals = vals_ref[0]
        # out-of-block points (straddling chunks, dropped ids, padding)
        # match no row and vanish in the one-hot
        onehot = (local[None, :] == rows).astype(vals.dtype)
        acc_ref[:] += jnp.dot(onehot, vals,
                              preferred_element_type=jnp.float32)
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _visit_tables(seg_col: jnp.ndarray, n_chunks: int, chunk_p: int,
                  n_blocks: int, block_v: int):
    """Visit tables: block i owns point chunks [lo_i, hi_i) (empty blocks
    get one forced visit so their output block is still zero-initialized and
    written).  Static visit count; trailing no-op visits point at the
    all-padding chunk (index n_chunks)."""
    block_edges = jnp.arange(n_blocks + 1, dtype=jnp.int32) * block_v
    pt_starts = jnp.searchsorted(seg_col[:n_chunks * chunk_p], block_edges,
                                 side="left").astype(jnp.int32)
    chunk_lo = pt_starts[:-1] // chunk_p
    chunk_hi = jnp.maximum(-(-pt_starts[1:] // chunk_p), chunk_lo)
    n_vis = jnp.maximum(chunk_hi - chunk_lo, 1)
    s_static = n_chunks + 2 * n_blocks              # sum(n_vis) upper bound
    cum = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           jnp.cumsum(n_vis, dtype=jnp.int32)])
    vis_block = jnp.repeat(jnp.arange(n_blocks, dtype=jnp.int32), n_vis,
                           total_repeat_length=s_static)
    vis_idx = jnp.arange(s_static, dtype=jnp.int32)
    off = vis_idx - cum[vis_block]
    real = vis_idx < cum[-1]
    vis_chunk = jnp.where(real,
                          jnp.minimum(chunk_lo[vis_block] + off, n_chunks),
                          n_chunks)
    vis_first = ((off == 0) & real).astype(jnp.int32)
    return vis_chunk, vis_block, vis_first, s_static


def lane_pack2(vals_p: jnp.ndarray, seg_col: jnp.ndarray, c: int
               ) -> jnp.ndarray:
    """Lane-pack host-side (XLA fuses this into the padding copy): odd
    pillars live in the upper half-row, so the kernel folds pillar pairs
    onto one 128-lane output row with a plain shifted compare."""
    hi_half = jnp.concatenate(
        [jnp.zeros_like(vals_p[:, c // 2:]), vals_p[:, :c // 2]], axis=1)
    odd = jnp.bitwise_and(seg_col, 1)[:, None] == 1
    return jnp.where(odd, hi_half, vals_p)


def sorted_segment_sum_pallas(vals: jnp.ndarray, seg_sorted: jnp.ndarray,
                              num_segments: int,
                              interpret: bool = False,
                              block_v: int = DEFAULT_BLOCK_V,
                              chunk_p: int = DEFAULT_CHUNK_P,
                              out_dtype=jnp.float32) -> jnp.ndarray:
    """Segment-sum over points already sorted by segment id.

    Args:
      vals: (P, C) values (fp32 or bf16), sorted so seg_sorted is
        non-decreasing; rows whose segment is >= num_segments are ignored.
      seg_sorted: (P,) int32 non-decreasing.
      num_segments: V (padded to a block_v multiple internally).
    Returns:
      (V, C) sums in ``out_dtype`` (accumulation is always fp32).
    """
    p, c_in = vals.shape
    c = max(128, ((c_in + 127) // 128) * 128)
    # two pillars per 128-lane row when channels fit in half a row
    pack = 2 if c_in <= c // 2 and block_v % 2 == 0 else 1
    v_pad = ((num_segments + block_v - 1) // block_v) * block_v
    n_blocks = v_pad // block_v
    p_pad = ((p + chunk_p - 1) // chunk_p) * chunk_p
    n_chunks = p_pad // chunk_p
    # one extra all-padding chunk: the target of no-op padding visits
    p_pad += chunk_p
    n_chunks_t = n_chunks + 1

    vals_p = jnp.zeros((p_pad, c), vals.dtype).at[:p, :c_in].set(vals)
    # padding points get an id past every block's range
    seg_col = jnp.full((p_pad,), v_pad, jnp.int32).at[:p].set(seg_sorted)
    if pack == 2:
        vals_p = lane_pack2(vals_p, seg_col, c)
    vals_p = vals_p.reshape(n_chunks_t, chunk_p, c)
    seg_rows = seg_col.reshape(n_chunks_t, 1, chunk_p)

    vis_chunk, vis_block, vis_first, s_static = _visit_tables(
        seg_col, n_chunks, chunk_p, n_blocks, block_v)

    rows_v = block_v // pack
    pad_chunk = jnp.full((1,), n_chunks, jnp.int32)
    out = pl.pallas_call(
        functools.partial(_kernel, block_v=block_v, chunk_p=chunk_p, c=c,
                          pack=pack),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(s_static,),
            in_specs=[
                pl.BlockSpec((1, chunk_p, c),
                             lambda v, cof, bof, ff, pc: (cof[v], 0, 0)),
                pl.BlockSpec((1, 1, chunk_p),
                             lambda v, cof, bof, ff, pc: (cof[v], 0, 0)),
            ],
            out_specs=pl.BlockSpec((rows_v, c),
                                   lambda v, cof, bof, ff, pc: (bof[v], 0)),
            scratch_shapes=[
                pltpu.VMEM((rows_v, c), jnp.float32),   # fp32 accumulator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((v_pad // pack, c), out_dtype),
        interpret=interpret,
    )(vis_chunk, vis_block, vis_first, pad_chunk, vals_p, seg_rows)
    if pack == 2:
        # row r holds pillars (2r | lanes [0:64)) and (2r+1 | lanes [64:128))
        out = out.reshape(v_pad, c // 2)
    return out[:num_segments, :c_in]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def segment_sum_pooling(vals: jnp.ndarray, seg: jnp.ndarray,
                        num_segments: int,
                        interpret: bool = False,
                        block_v: int = DEFAULT_BLOCK_V,
                        chunk_p: int = DEFAULT_CHUNK_P) -> jnp.ndarray:
    """Drop-in segment_sum running on the Pallas kernel (unsorted input;
    ids >= num_segments are dropped).  Output dtype follows ``vals``
    (accumulation is fp32 inside the kernel either way)."""
    seg_s, order = jax.lax.sort(
        [seg, jnp.arange(seg.shape[0], dtype=jnp.int32)], num_keys=1)
    return sorted_segment_sum_pallas(
        jnp.take(vals, order, axis=0), seg_s, num_segments,
        interpret=interpret, block_v=block_v, chunk_p=chunk_p,
        out_dtype=vals.dtype)


def _fwd(vals, seg, num_segments, interpret, block_v, chunk_p):
    return (segment_sum_pooling(vals, seg, num_segments, interpret,
                                block_v, chunk_p), seg)


def _bwd(num_segments, interpret, block_v, chunk_p, seg, g):
    # transpose of a segment-sum is a gather; dropped rows get zero
    safe = jnp.clip(seg, 0, num_segments - 1)
    dvals = jnp.take(g, safe, axis=0)
    dvals = jnp.where((seg >= 0)[:, None] & (seg < num_segments)[:, None],
                      dvals, 0.0)
    return dvals.astype(g.dtype), None


segment_sum_pooling.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Fused dual-output MGHS pooling: one pass over the sorted points produces
# BOTH the fine voxel grid and the z-collapsed BEV grid.  With the z-minor
# segment layout (seg = pillar * Dz + z), sorting by voxel id also sorts by
# BEV pillar id (pillar = seg // Dz), so one sort and one chunk stream feed
# two accumulators — the TPU counterpart of the reference's 4 bev_pool_v2
# passes in MGHS.view_transform (lss_heightmap.py:407-459).
#
# v4: the per-point epilogue (depth-bin one-hot select, sign-gate decode,
# |depth| x feat multiply, lane packing, padding) moved INSIDE the kernel.
# As separate XLA ops these were five elementwise passes over the
# visit-major (P, C) tensors — at DHD-L scale (P = 1.49M) ~2.2 GB of HBM
# traffic and 7.6 ms of the streaming step (round-5 device trace; the ops
# were broadcast_select/reduce/slice_multiply/pad_slice/pad_select over
# bf16[1486848, 152]).  The kernel input is now the raw gathered
# [feat row | sign-gated depth row] chunk and the epilogue runs on VMEM
# tiles between the gather DMA and the one-hot matmul.
# ---------------------------------------------------------------------------


def _kernel_dual_fused(cof_ref, bof_ref, first_ref, pad_ref, gath_ref,
                       bin_ref, segv_ref, segb_ref,
                       outv_ref, outb_ref, accv_ref, accb_ref, *,
                       block_v: int, chunk_p: int, c: int, c_in: int,
                       d: int, pack: int, dz: int):
    # Mosaic layout note: computed 1-D bool vectors do not lower ("Invalid
    # relayout ... vector<256xi1>"), but a lane->sublane transpose of a
    # LOADED s32 (1, chunk_p) row does.  All per-point tables therefore
    # arrive lane-oriented as (1, chunk_p) rows — the layout XLA gives
    # s32[nct, 1, chunk_p] jit arguments for free (the earlier
    # column-shaped (nct, chunk_p, 1) inputs were relaid out
    # {1,2,0:T(1,128)} -> {2,1,0:T(8,128)} by a 1.2 ms copy EACH per step
    # at DHD-L scale) — and per-row (chunk_p, 1) masks are produced by an
    # in-kernel transpose of the loaded row.  Gating is float arithmetic
    # (sign/max), never a bool select.
    v = pl.program_id(0)
    base = bof_ref[v] * block_v
    rows_v = block_v // pack
    rows_b = block_v // dz

    @pl.when(first_ref[v] == 1)
    def _():
        accv_ref[:] = jnp.zeros((rows_v, c), jnp.float32)
        accb_ref[:] = jnp.zeros((rows_b, c), jnp.float32)
        outv_ref[:] = accv_ref[:].astype(outv_ref.dtype)
        outb_ref[:] = accb_ref[:].astype(outb_ref.dtype)

    @pl.when(cof_ref[v] != pad_ref[0])
    def _():
        g = gath_ref[0]                                  # (chunk_p, c_in+d)
        feat = g[:, :c_in]
        dgg = g[:, c_in:c_in + d]
        # the point's depth bin has exactly one one-hot match, so the
        # masked lane-reduce is exact in any dtype / reduction order
        bins = jnp.transpose(bin_ref[0], (1, 0))         # (chunk_p, 1) int32
        oh = (bins == jax.lax.broadcasted_iota(
            jnp.int32, (chunk_p, d), 1)).astype(g.dtype)
        dgg_s = jnp.sum(dgg * oh, axis=1, keepdims=True)   # (chunk_p, 1)
        vals_c = jnp.abs(dgg_s) * feat                   # (chunk_p, c_in)
        if pack == 2 and c == 2 * c_in:
            # lane_pack2 in-kernel: odd pillars ride the upper half-row
            # (float blend, not a bool select — see layout note above;
            # per-half multiplies beat blending two full-width tensors)
            oddf = jnp.bitwise_and(
                jnp.transpose(segv_ref[0], (1, 0)), 1).astype(vals_c.dtype)
            vals = jnp.concatenate(
                [vals_c * (1.0 - oddf), vals_c * oddf], axis=1)
        elif pack == 2:
            lo = jnp.concatenate(
                [vals_c, jnp.zeros((chunk_p, c - c_in), vals_c.dtype)],
                axis=1)
            hi = jnp.concatenate(
                [jnp.zeros((chunk_p, c // 2), vals_c.dtype),
                 lo[:, :c // 2]], axis=1)
            oddf = jnp.bitwise_and(
                jnp.transpose(segv_ref[0], (1, 0)), 1).astype(lo.dtype)
            vals = hi * oddf + lo * (1.0 - oddf)
        else:
            vals = vals_c if c == c_in else jnp.concatenate(
                [vals_c, jnp.zeros((chunk_p, c - c_in), vals_c.dtype)],
                axis=1)
        # sign decodes the height gate (voxel_pool.mghs_pool_pallas): a
        # gated-off point keeps its BEV contribution but contributes an
        # exact 0.0 to the fine-voxel accumulator (x + ±0.0 == x in fp,
        # so this equals the id-reroute drop the XLA prepass used)
        gate01 = jnp.maximum(jnp.sign(dgg_s.astype(jnp.float32)), 0.0
                             ).astype(vals.dtype)
        # fine voxel pass
        localv = segv_ref[0, 0, :] - base
        if pack == 2:
            localv = jax.lax.shift_right_arithmetic(localv, 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (rows_v, chunk_p), 0)
        onehot = (localv[None, :] == rows).astype(vals.dtype)
        accv_ref[:] += jnp.dot(onehot, vals * gate01,
                               preferred_element_type=jnp.float32)
        outv_ref[:] = accv_ref[:].astype(outv_ref.dtype)
        # BEV pass: pillar-id segments, UNGATED (|dgg| is the raw depth;
        # reference BEV pools every point).  Pillar sums land split across
        # the two packed lane halves and are folded by the caller.
        localb = segb_ref[0, 0, :] - base // dz
        rows_bi = jax.lax.broadcasted_iota(jnp.int32, (rows_b, chunk_p), 0)
        onehot_b = (localb[None, :] == rows_bi).astype(vals.dtype)
        accb_ref[:] += jnp.dot(onehot_b, vals,
                               preferred_element_type=jnp.float32)
        outb_ref[:] = accb_ref[:].astype(outb_ref.dtype)


def dual_visit_tables(key_sorted: jnp.ndarray, num_vox: int,
                      block_v: int = DEFAULT_BLOCK_V,
                      chunk_p: int = DEFAULT_CHUNK_P):
    """Precomputable visit tables for :func:`mghs_pool_sorted_dual`
    (geometry-only — the reference 'accelerate' mode caches the analogous
    sorted ranks + intervals, lss_heightmap.py:374-378)."""
    p = key_sorted.shape[0]
    v_pad = ((num_vox + block_v - 1) // block_v) * block_v
    n_blocks = v_pad // block_v
    p_pad = ((p + chunk_p - 1) // chunk_p) * chunk_p
    n_chunks = p_pad // chunk_p
    key_col = jnp.full((p_pad + chunk_p,), v_pad, jnp.int32
                       ).at[:p].set(key_sorted)
    vis_chunk, vis_block, vis_first, _ = _visit_tables(
        key_col, n_chunks, chunk_p, n_blocks, block_v)
    return vis_chunk, vis_block, vis_first


def mghs_pool_sorted_dual_fused(gath: jnp.ndarray, bin_rows: jnp.ndarray,
                                segv_rows: jnp.ndarray,
                                segb_rows: jnp.ndarray, tables,
                                num_vox: int, dz: int, c_in: int,
                                interpret: bool = False,
                                block_v: int = DEFAULT_BLOCK_V,
                                chunk_p: int = DEFAULT_CHUNK_P,
                                out_dtype=jnp.bfloat16):
    """Fused vox+bev pooling over gathered per-point rows.

    The caller provides the raw row gather (one XLA gather from the small
    per-pixel table — see voxel_pool.mghs_pool_pallas); the depth-bin
    select, sign-gate decode, |depth| x feat multiply and lane packing all
    run inside the kernel (v4 — no (P, C) intermediate ever hits HBM).

    Differentiable wrt ``gath`` via custom_vjp (the transpose of the dual
    segment-sum is two gathers, composed with the epilogue's product
    rule), so training with a precomputed pooling plan works — e.g. a pod
    host loader shipping plans with each batch.  pallas_call itself has no
    JVP rule; without the custom_vjp a train step through this path dies
    in linearization (the cost-volume kernel had exactly that bug).

    Args:
      gath: (P_pad, c_in + D) rows [feat | sign-gated depth] in sorted
        point order, already padded to a whole number of chunks PLUS one
        trailing all-padding chunk (the no-op visit target).  Padding rows
        may hold garbage — their segment ids drop them.
      bin_rows: (n_chunks_t, 1, chunk_p) int32 depth-bin of each point
        (lane-oriented like every other table — the kernel transposes
        loaded rows in-VMEM; column-shaped s32[..., chunk_p, 1] inputs
        cost a 1.2 ms relayout copy per step at DHD-L scale).
      segv_rows: (n_chunks_t, 1, chunk_p) int32 fine-voxel ids (z-minor),
        dropped points >= v_pad; the in-kernel sign gate zeroes gated-off
        points' fine-voxel contribution.
      segb_rows: (n_chunks_t, 1, chunk_p) int32 BEV pillar ids (ungated),
        dropped points >= num_vox // dz padded size.
      tables: :func:`dual_visit_tables` output for the sort key (same
        block_v/chunk_p).
      num_vox: fine grid size (B*Dy*Dx*Dz); must satisfy block_v % dz == 0.
    Returns:
      vox (num_vox, c_in), bev (num_vox // dz, c_in) in out_dtype.
    """
    return _dual_fused_vjp(gath, bin_rows, segv_rows, segb_rows,
                           tuple(tables), num_vox, dz, c_in, interpret,
                           block_v, chunk_p, out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _dual_fused_vjp(gath, bin_rows, segv_rows, segb_rows,
                    tables, num_vox, dz, c_in, interpret, block_v, chunk_p,
                    out_dtype):
    return _dual_fused_impl(gath, bin_rows, segv_rows,
                            segb_rows, tables, num_vox, dz, c_in,
                            interpret, block_v, chunk_p, out_dtype)


def _dual_fused_fwd(gath, bin_rows, segv_rows, segb_rows,
                    tables, num_vox, dz, c_in, interpret, block_v, chunk_p,
                    out_dtype):
    out = _dual_fused_vjp(gath, bin_rows, segv_rows, segb_rows,
                          tables, num_vox, dz, c_in, interpret, block_v,
                          chunk_p, out_dtype)
    return out, (gath, bin_rows, segv_rows, segb_rows)


def _dual_fused_bwd(num_vox, dz, c_in, interpret, block_v, chunk_p,
                    out_dtype, res, g):
    """Product-rule backward of the fused epilogue + dual segment-sum.

    Matches JAX's own grads of the former XLA prepass composition
    (onehot-select -> abs -> multiply -> gated segment-sum), so training
    through the plan path gives the XLA path's gradients
    (tests/test_voxel_pool.py::test_mghs_pool_pallas_grads_match_xla).
    """
    gath, bin_rows, segv_rows, segb_rows = res
    g_vox, g_bev = g
    p = gath.shape[0]
    d = gath.shape[1] - c_in
    num_bev = num_vox // dz
    bins = bin_rows.reshape(-1)[:p]
    segb = segb_rows.reshape(-1)[:p]
    feat = gath[:, :c_in]
    oh = (bins[:, None] == jax.lax.iota(jnp.int32, d)[None, :]
          ).astype(gath.dtype)
    dgg_s = jnp.sum(gath[:, c_in:] * oh, axis=-1)
    segv = jnp.where(dgg_s > 0, segv_rows.reshape(-1)[:p], num_vox)
    dvox = jnp.take(g_vox, jnp.clip(segv, 0, num_vox - 1), axis=0)
    dvox = jnp.where((segv < num_vox)[:, None], dvox, 0)
    dbev = jnp.take(g_bev, jnp.clip(segb, 0, num_bev - 1), axis=0)
    dbev = jnp.where((segb < num_bev)[:, None], dbev, 0)
    dvals = (dvox + dbev).astype(jnp.float32)            # d loss / d vals_c
    a = jnp.abs(dgg_s).astype(jnp.float32)
    d_feat = a[:, None] * dvals
    d_dgg_s = jnp.sign(dgg_s).astype(jnp.float32) \
        * jnp.sum(dvals * feat.astype(jnp.float32), axis=-1)
    d_gath = jnp.concatenate(
        [d_feat, d_dgg_s[:, None] * oh.astype(jnp.float32)], axis=-1)
    return (d_gath.astype(gath.dtype), None, None, None, None)


_dual_fused_vjp.defvjp(_dual_fused_fwd, _dual_fused_bwd)


def _dual_fused_impl(gath, bin_rows, segv_rows, segb_rows,
                     tables, num_vox: int, dz: int, c_in: int,
                     interpret: bool, block_v: int, chunk_p: int,
                     out_dtype):
    p_pad, cd = gath.shape
    d = cd - c_in
    c = max(128, ((c_in + 127) // 128) * 128)
    pack = 2 if c_in <= c // 2 and block_v % 2 == 0 else 1
    assert block_v % dz == 0, (block_v, dz)
    assert p_pad % chunk_p == 0, (p_pad, chunk_p)
    v_pad = ((num_vox + block_v - 1) // block_v) * block_v
    n_blocks = v_pad // block_v
    num_bev = num_vox // dz
    n_chunks_t = p_pad // chunk_p
    n_chunks = n_chunks_t - 1          # last chunk = the no-op visit target
    assert bin_rows.shape == (n_chunks_t, 1, chunk_p), bin_rows.shape

    vis_chunk, vis_block, vis_first = tables
    s_static = vis_chunk.shape[0]
    assert s_static == n_chunks + 2 * n_blocks, "tables built with " \
        "different block_v/chunk_p"

    rows_v = block_v // pack
    rows_b = block_v // dz
    pad_chunk = jnp.full((1,), n_chunks, jnp.int32)
    outv, outb = pl.pallas_call(
        functools.partial(_kernel_dual_fused, block_v=block_v,
                          chunk_p=chunk_p, c=c, c_in=c_in, d=d, pack=pack,
                          dz=dz),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(s_static,),
            in_specs=[
                pl.BlockSpec((1, chunk_p, cd),
                             lambda v, cof, bof, ff, pc: (cof[v], 0, 0)),
                pl.BlockSpec((1, 1, chunk_p),
                             lambda v, cof, bof, ff, pc: (cof[v], 0, 0)),
                pl.BlockSpec((1, 1, chunk_p),
                             lambda v, cof, bof, ff, pc: (cof[v], 0, 0)),
                pl.BlockSpec((1, 1, chunk_p),
                             lambda v, cof, bof, ff, pc: (cof[v], 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((rows_v, c),
                             lambda v, cof, bof, ff, pc: (bof[v], 0)),
                pl.BlockSpec((rows_b, c),
                             lambda v, cof, bof, ff, pc: (bof[v], 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((rows_v, c), jnp.float32),
                pltpu.VMEM((rows_b, c), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((v_pad // pack, c), out_dtype),
            jax.ShapeDtypeStruct((v_pad // dz, c), out_dtype),
        ),
        interpret=interpret,
    )(vis_chunk, vis_block, vis_first, pad_chunk,
      gath.reshape(n_chunks_t, chunk_p, cd), bin_rows,
      segv_rows, segb_rows)
    if pack == 2:
        vox = outv.reshape(v_pad, c // 2)[:num_vox, :c_in]
        # a pillar's sum is split across the two packed lane halves
        bev = (outb[:, :c // 2] + outb[:, c // 2:])[:num_bev, :c_in]
    else:
        vox = outv[:num_vox, :c_in]
        bev = outb[:num_bev, :c_in]
    return vox, bev
