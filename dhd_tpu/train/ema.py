"""MEGVII-style EMA (core/hook/ema.py:17-117).

decay(t) = base_decay * (1 - exp(-t / 2000)) with the update counter
initialized at ``init_updates`` (10560 for DHD), applied to every float leaf
of params *and* batch_stats (torch state_dict semantics: BN running stats are
EMA'd too).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


class EmaState(struct.PyTreeNode):
    updates: jnp.ndarray          # int32 counter
    params: Any
    batch_stats: Any


def ema_init(params, batch_stats, init_updates: int) -> EmaState:
    # jnp.array(copy=True): the EMA must NOT alias the live buffers, or
    # donated train steps would donate the same buffer twice.
    return EmaState(
        updates=jnp.asarray(init_updates, jnp.int32),
        params=jax.tree.map(lambda x: jnp.array(x, copy=True), params),
        batch_stats=jax.tree.map(lambda x: jnp.array(x, copy=True),
                                 batch_stats),
    )


def ema_update(state: EmaState, params, batch_stats,
               base_decay: float = 0.999) -> EmaState:
    updates = state.updates + 1
    d = base_decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / 2000.0))

    def blend(e, p):
        return e * d + (1.0 - d) * p.astype(e.dtype)

    return EmaState(
        updates=updates,
        params=jax.tree.map(blend, state.params, params),
        batch_stats=jax.tree.map(blend, state.batch_stats, batch_stats),
    )
