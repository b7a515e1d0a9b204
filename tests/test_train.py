"""Train step: loss decreases when overfitting one tiny batch; EMA updates."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhd_tpu.config import get_config
from dhd_tpu.data import synthetic_batch
from dhd_tpu.models import DHDNet
from dhd_tpu.train import (
    create_train_state, make_eval_step, make_optimizer, make_train_step)


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("dhd_tiny")
    model = DHDNet(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, batch_size=1, seed=1).items()}
    tx = make_optimizer(cfg.optim, steps_per_epoch=10)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch, tx)
    return cfg, model, batch, state


@pytest.mark.slow
def test_train_step_runs_and_improves(setup):
    cfg, model, batch, state = setup
    step = make_train_step(cfg, donate=False)
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(6):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss_total"]))
    assert all(np.isfinite(losses))
    # overfitting one batch: loss must drop
    assert losses[-1] < losses[0]
    assert int(state.step) == 6
    # EMA counter advanced from init_updates
    assert int(state.ema.updates) == cfg.optim.ema_init_updates + 6


@pytest.mark.slow
def test_loss_components_present(setup):
    cfg, model, batch, state = setup
    step = make_train_step(cfg, donate=False)
    _, metrics = step(state, batch, jax.random.PRNGKey(2))
    for key in ("loss_height", "loss_occ", "loss_voxel_sem_scal",
                "loss_voxel_geo_scal", "grad_norm", "loss_total"):
        assert key in metrics and np.isfinite(float(metrics[key]))


def test_eval_step_outputs_classes(setup):
    cfg, model, batch, state = setup
    ev = make_eval_step(cfg)
    occ = ev(state, batch)
    assert occ.shape == (1, cfg.vt.x.size, cfg.vt.y.size, cfg.head_Dz)
    assert occ.dtype == jnp.uint8
    assert int(occ.max()) < cfg.num_classes
