"""Pallas TPU kernel for the frustum->voxel pooling segment-sum.

The CUDA reference assigns one thread per (pillar, channel) and walks its
sorted point interval (bev_pool_cuda.cu:21-50).  The TPU-native analogue
reshapes the problem for the MXU: points are sorted by output segment, the
output grid is processed in blocks of ``BLOCK_V`` pillars, and each block
accumulates ``onehot(local_seg) @ vals`` — a (BLOCK_V x CHUNK_P) x
(CHUNK_P x C) matmul per point chunk — with point chunks DMA'd from HBM.

The backward pass of a segment-sum is a gather, so the public entry point
carries a custom_vjp and training works identically to the XLA path.

Use ``sorted_segment_sum_pallas`` through ``segment_sum_pooling`` (which
sorts + pads) or flip ``use_pallas`` in ``mghs_pool`` call sites; the XLA
``jax.ops.segment_sum`` path remains the default until profiling on real
hardware says otherwise.
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


def _kernel(starts_ref, seg_ref, vals_ref, out_ref, vscr, sscr, sem_v,
            sem_s, *, c: int):
    i = pl.program_id(0)
    start = starts_ref[i]
    end = starts_ref[i + 1]
    base = i * BLOCK_V

    def body(k, acc):
        off = start + k * CHUNK_P
        cp_v = pltpu.make_async_copy(
            vals_ref.at[pl.ds(off, CHUNK_P)], vscr, sem_v)
        cp_s = pltpu.make_async_copy(
            seg_ref.at[pl.ds(off, CHUNK_P)], sscr, sem_s)
        cp_v.start()
        cp_s.start()
        cp_v.wait()
        cp_s.wait()
        seg = sscr[:, 0]                                   # (CHUNK_P,)
        pidx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK_P, 1), 0)[:, 0]
        valid = pidx < (end - off)
        local = seg - base
        rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_V, CHUNK_P), 0)
        onehot = ((local[None, :] == rows)
                  & valid[None, :]).astype(jnp.float32)
        return acc + jnp.dot(onehot, vscr[:].astype(jnp.float32),
                             preferred_element_type=jnp.float32)

    n_chunks = pl.cdiv(end - start, CHUNK_P)
    acc = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((BLOCK_V, c), jnp.float32))
    out_ref[:] = acc.astype(out_ref.dtype)


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
    p, c = vals.shape
    v_pad = ((num_segments + BLOCK_V - 1) // BLOCK_V) * BLOCK_V
    n_blocks = v_pad // BLOCK_V
    # pad points with an out-of-range segment; one extra CHUNK_P so a chunk
    # starting at the last real point never DMAs past the buffer
    p_pad = ((p + CHUNK_P - 1) // CHUNK_P) * CHUNK_P + CHUNK_P
    vals_p = jnp.zeros((p_pad, c), vals.dtype).at[:p].set(vals)
    seg_p = jnp.full((p_pad, 1), v_pad, jnp.int32).at[:p, 0].set(seg_sorted)

    # per-block first-point index (the interval_starts analogue,
    # lss_heightmap.py:360-368, but at block granularity)
    block_edges = jnp.arange(n_blocks + 1, dtype=jnp.int32) * BLOCK_V
    starts = jnp.searchsorted(seg_p[:, 0], block_edges,
                              side="left").astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(_kernel, c=c),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),     # seg (HBM)
                pl.BlockSpec(memory_space=pltpu.ANY),     # vals (HBM)
            ],
            out_specs=pl.BlockSpec((BLOCK_V, c), lambda i, *_: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((CHUNK_P, c), vals.dtype),
                pltpu.VMEM((CHUNK_P, 1), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((v_pad, c), jnp.float32),
        interpret=interpret,
    )(starts, seg_p, vals_p)
    return out[:num_segments]


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
