"""Orbax checkpoint save/restore round trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhd_tpu.config import get_config
from dhd_tpu.data import synthetic_batch
from dhd_tpu.io import load_checkpoint, save_checkpoint
from dhd_tpu.models import build_model
from dhd_tpu.train import create_train_state, make_optimizer


@pytest.mark.slow
def test_train_state_roundtrip(tmp_path):
    cfg = get_config("dhd_tiny")
    model = build_model(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, 1).items()}
    tx = make_optimizer(cfg.optim, 10)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch, tx)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, jax.device_get(state))

    # restore with target: exact pytree round trip
    restored = load_checkpoint(path, jax.device_get(state))
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.ema.updates) == int(state.ema.updates)

    # restore without target: raw tree with named fields (test CLI path)
    raw = load_checkpoint(path)
    assert "params" in raw and "batch_stats" in raw and "ema" in raw
    assert "params" in raw["ema"]
