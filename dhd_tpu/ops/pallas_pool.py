"""Pallas TPU kernel for the frustum->voxel pooling segment-sum.

The CUDA reference assigns one thread per (pillar, channel) and walks its
sorted point interval (bev_pool_cuda.cu:21-50).  The TPU-native analogue
reshapes the problem for the MXU: points are sorted by output segment, the
output grid is processed in blocks of ``BLOCK_V`` pillars, and each block
accumulates ``onehot(local_seg) @ vals`` — a (BLOCK_V x CHUNK_P) x
(CHUNK_P x C) matmul per point chunk — with point chunks DMA'd from HBM.

Mosaic layout constraints shape the data plumbing: DMA slices must be
lane-tiled (last dim a 128 multiple) and chunk offsets must be provably
sublane-aligned, so channels are padded to 128, the segment id rides inside
``vals`` as an extra float32 channel (exact for ids < 2^24; the DHD grid has
640k pillars), and blocks iterate CHUNK_P-aligned chunks with out-of-block
points masked by the one-hot itself.

The backward pass of a segment-sum is a gather, so the public entry point
carries a custom_vjp and training works identically to the XLA path.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_V = 256      # pillars per output block (rows of the onehot matmul)
CHUNK_P = 512      # points per DMA'd chunk


def _kernel(chunks_ref, vals_ref, out_ref, vscr, sem_v, *, c: int):
    i = pl.program_id(0)
    chunk_lo = chunks_ref[2 * i]      # first CHUNK_P-aligned chunk touching
    chunk_hi = chunks_ref[2 * i + 1]  # one past the last (block i's range)
    base = i * BLOCK_V

    def body(k, acc):
        # chunk-aligned offsets keep the HBM slice provably tiled
        off = pl.multiple_of(k * CHUNK_P, CHUNK_P)
        cp_v = pltpu.make_async_copy(
            vals_ref.at[pl.ds(off, CHUNK_P)], vscr, sem_v)
        cp_v.start()
        cp_v.wait()
        # segment ids ride in the last channel (float32, exact)
        seg = vscr[:, c - 1]                               # (CHUNK_P,)
        local = seg - jnp.float32(base)
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (BLOCK_V, CHUNK_P), 0).astype(jnp.float32)
        # out-of-block points (incl. padding) match no row and vanish
        onehot = (local[None, :] == rows).astype(jnp.float32)
        return acc + jnp.dot(onehot, vscr[:],
                             preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(
        chunk_lo, chunk_hi, body, jnp.zeros((BLOCK_V, c), jnp.float32))
    out_ref[:] = acc


def sorted_segment_sum_pallas(vals: jnp.ndarray, seg_sorted: jnp.ndarray,
                              num_segments: int,
                              interpret: bool = False) -> jnp.ndarray:
    """Segment-sum over points already sorted by segment id.

    Args:
      vals: (P, C) values, sorted so seg_sorted is non-decreasing; rows whose
        segment is >= num_segments are ignored.
      seg_sorted: (P,) int32 non-decreasing.
      num_segments: V (padded to a BLOCK_V multiple internally).
    Returns:
      (V, C) float32 sums.
    """
    p, c_in = vals.shape
    # channels padded to the 128-lane tile; the last padded channel carries
    # the segment id as float32
    c = ((c_in + 1 + 127) // 128) * 128
    v_pad = ((num_segments + BLOCK_V - 1) // BLOCK_V) * BLOCK_V
    n_blocks = v_pad // BLOCK_V
    # pad points with an out-of-range segment; one extra CHUNK_P so a chunk
    # starting at the last real point never DMAs past the buffer
    p_pad = ((p + CHUNK_P - 1) // CHUNK_P) * CHUNK_P + CHUNK_P
    vals_p = jnp.zeros((p_pad, c), jnp.float32)
    vals_p = vals_p.at[:p, :c_in].set(vals.astype(jnp.float32))
    seg_col = jnp.full((p_pad,), v_pad, jnp.int32).at[:p].set(seg_sorted)
    vals_p = vals_p.at[:, c - 1].set(seg_col.astype(jnp.float32))

    # per-block chunk range (the interval_starts analogue,
    # lss_heightmap.py:360-368, at CHUNK_P-aligned granularity).  A block
    # boundary inside a chunk makes both neighbouring blocks visit that
    # chunk; out-of-block points vanish in the one-hot masking.
    block_edges = jnp.arange(n_blocks + 1, dtype=jnp.int32) * BLOCK_V
    pt_starts = jnp.searchsorted(seg_col, block_edges,
                                 side="left").astype(jnp.int32)
    chunk_lo = pt_starts[:-1] // CHUNK_P
    chunk_hi = jnp.maximum(-(-pt_starts[1:] // CHUNK_P), chunk_lo)
    # interleaved flat [lo0, hi0, lo1, hi1, ...] — 1-D to stay compact in SMEM
    starts = jnp.stack([chunk_lo, chunk_hi], axis=1).reshape(-1)
    starts = starts.astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(_kernel, c=c),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),     # vals (HBM)
            ],
            out_specs=pl.BlockSpec((BLOCK_V, c), lambda i, *_: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((CHUNK_P, c), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((v_pad, c), jnp.float32),
        interpret=interpret,
    )(starts, vals_p)
    return out[:num_segments, :c_in]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_sum_pooling(vals: jnp.ndarray, seg: jnp.ndarray,
                        num_segments: int,
                        interpret: bool = False) -> jnp.ndarray:
    """Drop-in segment_sum running on the Pallas kernel (unsorted input;
    ids >= num_segments are dropped)."""
    order = jnp.argsort(seg)
    return sorted_segment_sum_pallas(
        jnp.take(vals, order, axis=0), jnp.take(seg, order),
        num_segments, interpret=interpret)


def _fwd(vals, seg, num_segments, interpret):
    return segment_sum_pooling(vals, seg, num_segments, interpret), seg


def _bwd(num_segments, interpret, seg, g):
    # transpose of a segment-sum is a gather; dropped rows get zero
    safe = jnp.clip(seg, 0, num_segments - 1)
    dvals = jnp.take(g, safe, axis=0)
    dvals = jnp.where((seg >= 0)[:, None] & (seg < num_segments)[:, None],
                      dvals, 0.0)
    return dvals.astype(g.dtype), None


segment_sum_pooling.defvjp(_fwd, _bwd)
