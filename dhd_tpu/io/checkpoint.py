"""Orbax checkpointing (the mmcv checkpoint_config / EMA-save equivalent,
core/hook/ema.py:102-117, DHD-S.py:283)."""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state: Any, force: bool = True) -> None:
    """Save a pytree (TrainState or raw variables) to ``path``."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=force)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree saved with :func:`save_checkpoint`.

    ``target`` (a matching pytree of arrays/ShapeDtypeStructs) restores with
    exact structure; without it the raw saved tree is returned.
    """
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(path, target)
        return ckptr.restore(path)
