"""Multi-device data-parallel training on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__
from dhd_tpu.eval import MIoUMetric, confusion_matrix, miou_from_confusion


def test_has_8_devices():
    assert jax.device_count() >= 8


@pytest.mark.slow
def test_dryrun_multichip_8():
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_multihost_two_processes():
    """REAL multi-process data parallelism: two OS processes, one CPU device
    each, connected by jax.distributed.initialize + gloo collectives.  Both
    report the same global train-step loss, and it matches a single-process
    run of the same global batch (dist_train.sh multi-node semantics:
    per-process loader shards + make_array_from_process_local_data)."""
    import os
    import re
    import socket
    import subprocess
    import sys

    # pick a free port for the coordinator
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["DHD_MH_PRESET"] = "dhd_micro_stereo"
    env["DHD_MH_BATCH"] = "2"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(os.path.dirname(worker)), env=env)
        for i in range(2)]
    outs = [p.communicate(timeout=3000)[0] for p in procs]
    losses = []
    for i, out in enumerate(outs):
        assert procs[i].returncode == 0, f"rank {i} failed:\n{out[-3000:]}"
        m = re.search(r"MULTIHOST_LOSS ([0-9.]+)", out)
        assert m, f"rank {i} printed no loss:\n{out[-3000:]}"
        losses.append(float(m.group(1)))
    assert losses[0] == losses[1], losses

    # single-process reference on the same global batch
    from dhd_tpu.config import get_config
    from dhd_tpu.data import synthetic_batch
    from dhd_tpu.models import build_model
    from dhd_tpu.parallel import make_mesh
    from dhd_tpu.parallel.mesh import replicate, shard_batch
    from dhd_tpu.train import (create_train_state, make_optimizer,
                               make_train_step)

    cfg = get_config("dhd_micro_stereo")
    model = build_model(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, batch_size=2).items()}
    tx = make_optimizer(cfg.optim, steps_per_epoch=10)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch, tx,
                               with_ema=False, jit_init=True)
    mesh = make_mesh(1)
    with jax.set_mesh(mesh):
        state = replicate(state, mesh)
        sb = shard_batch(batch, mesh)
        step = make_train_step(cfg, donate=False)
        _, metrics = step(state, sb, jax.random.PRNGKey(1))
        ref = float(metrics["loss_total"])
    np.testing.assert_allclose(losses[0], ref, rtol=1e-4)


@pytest.mark.slow
def test_dp_loss_matches_single_device():
    """8-device data-parallel train-step loss == the 1-device loss on the
    same global batch (GSPMD grad all-reduce + SyncBN are semantically a
    no-op vs single-device execution; dist_train.sh:10-20 equivalence)."""
    from dhd_tpu.config import get_config
    from dhd_tpu.data import synthetic_batch
    from dhd_tpu.models import build_model
    from dhd_tpu.parallel import make_mesh
    from dhd_tpu.parallel.mesh import replicate, shard_batch
    from dhd_tpu.train import (create_train_state, make_optimizer,
                               make_train_step)

    cfg = get_config("dhd_tiny")
    model = build_model(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, batch_size=8).items()}
    tx = make_optimizer(cfg.optim, steps_per_epoch=10)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch, tx,
                               with_ema=False, jit_init=True)

    losses = {}
    for n in (8, 1):
        mesh = make_mesh(n)
        with jax.set_mesh(mesh):
            st = replicate(state, mesh)
            sb = shard_batch(batch, mesh)
            step = make_train_step(cfg, donate=False)
            _, metrics = step(st, sb, jax.random.PRNGKey(1))
            losses[n] = float(metrics["loss_total"])
    np.testing.assert_allclose(losses[8], losses[1], rtol=1e-4)


def test_miou_metric():
    rng = np.random.default_rng(0)
    gt = rng.integers(0, 18, (2, 8, 8, 4))
    pred = gt.copy()
    flip = rng.random(pred.shape) < 0.3
    pred = np.where(flip, rng.integers(0, 18, pred.shape), pred)
    mask = (rng.random(pred.shape) < 0.7).astype(np.int32)

    metric = MIoUMetric()
    metric.add_batch(pred, gt, mask)
    miou, per_class = metric.compute()

    # numpy oracle
    cm = np.zeros((18, 18))
    sel = mask.astype(bool)
    for g, p in zip(gt[sel].ravel(), pred[sel].ravel()):
        cm[g, p] += 1
    diag = np.diag(cm)
    iou = diag / (cm.sum(0) + cm.sum(1) - diag)
    expect = np.nanmean(iou[:17])
    assert np.isclose(miou, expect)
    assert "===> mIoU" in metric.summary()


def test_miou_perfect_prediction():
    gt = np.tile(np.arange(18), 10).reshape(1, -1)
    metric = MIoUMetric()
    metric.add_batch(gt, gt, np.ones_like(gt))
    miou, _ = metric.compute()
    assert np.isclose(miou, 1.0)
