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
# ---------------------------------------------------------------------------


def _kernel_dual(cof_ref, bof_ref, first_ref, pad_ref, vals_ref, segv_ref,
                 segb_ref, outv_ref, outb_ref, accv_ref, accb_ref, *,
                 block_v: int, chunk_p: int, c: int, pack: int, dz: int):
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
        vals = vals_ref[0]
        # fine voxel pass (height-gating is pre-folded into segv as drops)
        localv = segv_ref[0, 0, :] - base
        if pack == 2:
            localv = jax.lax.shift_right_arithmetic(localv, 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (rows_v, chunk_p), 0)
        onehot = (localv[None, :] == rows).astype(vals.dtype)
        accv_ref[:] += jnp.dot(onehot, vals,
                               preferred_element_type=jnp.float32)
        outv_ref[:] = accv_ref[:].astype(outv_ref.dtype)
        # BEV pass: pillar-id segments; pillar sums land split across the
        # two packed lane halves and are folded by the caller
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


def mghs_pool_sorted_dual(vals_sorted: jnp.ndarray, segv_sorted: jnp.ndarray,
                          segb_sorted: jnp.ndarray, key_sorted: jnp.ndarray,
                          num_vox: int, dz: int,
                          interpret: bool = False,
                          block_v: int = DEFAULT_BLOCK_V,
                          chunk_p: int = DEFAULT_CHUNK_P,
                          out_dtype=jnp.bfloat16,
                          tables=None):
    """Fused vox+bev pooling over points sorted by z-minor voxel key.

    Differentiable wrt ``vals_sorted`` via custom_vjp (the transpose of a
    dual segment-sum is two gathers), so training with a precomputed
    pooling plan works — e.g. a pod host loader shipping plans with each
    batch.  pallas_call itself has no JVP rule; without the custom_vjp a
    train step through this path dies in linearization (the cost-volume
    kernel had exactly that bug).

    Args:
      vals_sorted: (P, C) depth*feat products in sorted order.
      segv_sorted: (P,) int32 fine-voxel ids (z-minor: pillar*dz + z), with
        dropped/gated-off points >= the padded grid size.
      segb_sorted: (P,) int32 BEV pillar ids (= valid segv // dz), dropped
        points >= num_vox // dz padded size.
      key_sorted: (P,) int32 the sort key (segv before gating; defines the
        chunk->block ownership).
      num_vox: fine grid size (B*Dy*Dx*Dz); must satisfy block_v % dz == 0.
      tables: optional precomputed :func:`dual_visit_tables` output (must
        have been built with the same block_v/chunk_p).
    Returns:
      vox (num_vox, C), bev (num_vox // dz, C) in out_dtype.
    """
    if tables is None:
        tables = dual_visit_tables(key_sorted, num_vox, block_v, chunk_p)
    return _dual_vjp(vals_sorted, segv_sorted, segb_sorted, key_sorted,
                     tuple(tables), num_vox, dz, interpret, block_v,
                     chunk_p, out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _dual_vjp(vals_sorted, segv_sorted, segb_sorted, key_sorted, tables,
              num_vox, dz, interpret, block_v, chunk_p, out_dtype):
    return _dual_impl(vals_sorted, segv_sorted, segb_sorted, key_sorted,
                      num_vox, dz, interpret, block_v, chunk_p, out_dtype,
                      tables)


def _dual_fwd(vals_sorted, segv_sorted, segb_sorted, key_sorted, tables,
              num_vox, dz, interpret, block_v, chunk_p, out_dtype):
    out = _dual_vjp(vals_sorted, segv_sorted, segb_sorted, key_sorted,
                    tables, num_vox, dz, interpret, block_v, chunk_p,
                    out_dtype)
    return out, (segv_sorted, segb_sorted)


def _dual_bwd(num_vox, dz, interpret, block_v, chunk_p, out_dtype, res, g):
    segv, segb = res
    g_vox, g_bev = g
    num_bev = num_vox // dz
    dvox = jnp.take(g_vox, jnp.clip(segv, 0, num_vox - 1), axis=0)
    dvox = jnp.where((segv < num_vox)[:, None], dvox, 0)
    dbev = jnp.take(g_bev, jnp.clip(segb, 0, num_bev - 1), axis=0)
    dbev = jnp.where((segb < num_bev)[:, None], dbev, 0)
    return (dvox + dbev, None, None, None, None)


_dual_vjp.defvjp(_dual_fwd, _dual_bwd)


def _dual_impl(vals_sorted, segv_sorted, segb_sorted, key_sorted,
               num_vox: int, dz: int, interpret: bool, block_v: int,
               chunk_p: int, out_dtype, tables):
    p, c_in = vals_sorted.shape
    c = max(128, ((c_in + 127) // 128) * 128)
    pack = 2 if c_in <= c // 2 and block_v % 2 == 0 else 1
    assert block_v % dz == 0, (block_v, dz)
    v_pad = ((num_vox + block_v - 1) // block_v) * block_v
    n_blocks = v_pad // block_v
    num_bev = num_vox // dz
    p_pad = ((p + chunk_p - 1) // chunk_p) * chunk_p
    n_chunks = p_pad // chunk_p
    p_pad += chunk_p
    n_chunks_t = n_chunks + 1

    vals_p = jnp.zeros((p_pad, c), vals_sorted.dtype
                       ).at[:p, :c_in].set(vals_sorted)
    key_col = jnp.full((p_pad,), v_pad, jnp.int32).at[:p].set(key_sorted)
    segv_col = jnp.full((p_pad,), v_pad, jnp.int32).at[:p].set(segv_sorted)
    segb_col = jnp.full((p_pad,), v_pad // dz, jnp.int32
                        ).at[:p].set(segb_sorted)
    if pack == 2:
        vals_p = lane_pack2(vals_p, segv_col, c)
    vals_p = vals_p.reshape(n_chunks_t, chunk_p, c)
    segv_rows = segv_col.reshape(n_chunks_t, 1, chunk_p)
    segb_rows = segb_col.reshape(n_chunks_t, 1, chunk_p)

    if tables is not None:
        vis_chunk, vis_block, vis_first = tables
        s_static = vis_chunk.shape[0]
        assert s_static == n_chunks + 2 * n_blocks, "tables built with " \
            "different block_v/chunk_p"
    else:
        vis_chunk, vis_block, vis_first, s_static = _visit_tables(
            key_col, n_chunks, chunk_p, n_blocks, block_v)

    rows_v = block_v // pack
    rows_b = block_v // dz
    pad_chunk = jnp.full((1,), n_chunks, jnp.int32)
    outv, outb = pl.pallas_call(
        functools.partial(_kernel_dual, block_v=block_v, chunk_p=chunk_p,
                          c=c, pack=pack, dz=dz),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(s_static,),
            in_specs=[
                pl.BlockSpec((1, chunk_p, c),
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
    )(vis_chunk, vis_block, vis_first, pad_chunk, vals_p, segv_rows,
      segb_rows)
    if pack == 2:
        vox = outv.reshape(v_pad, c // 2)[:num_vox, :c_in]
        # a pillar's sum is split across the two packed lane halves
        bev = (outb[:, :c // 2] + outb[:, c // 2:])[:num_bev, :c_in]
    else:
        vox = outv[:num_vox, :c_in]
        bev = outb[:num_bev, :c_in]
    return vox, bev
