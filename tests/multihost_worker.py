"""Worker process for the 2-process multi-host data-parallel test.

Each process owns one virtual CPU device and one contiguous shard of the
global batch (the DistributedSampler equivalent,
/root/reference/tools/dist_train.sh:5-8 NNODES/MASTER_ADDR semantics).
Cross-process collectives ride gloo; the GSPMD train step is byte-identical
to the single-process one.

Usage: python tests/multihost_worker.py <process_id> <num_processes> <port>
Prints ``MULTIHOST_LOSS <loss>`` on success.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    import jax.numpy as jnp
    from dhd_tpu.config import get_config
    from dhd_tpu.data import synthetic_batch
    from dhd_tpu.models import build_model
    from dhd_tpu.parallel import make_mesh
    from dhd_tpu.parallel.mesh import (process_batch_slice, replicate,
                                       shard_batch)
    from dhd_tpu.train import (create_train_state, make_optimizer,
                               make_train_step)
    from dhd_tpu.utils import enable_persistent_cache
    enable_persistent_cache()

    cfg = get_config(os.environ.get("DHD_MH_PRESET", "dhd_micro_stereo"))
    global_b = int(os.environ.get("DHD_MH_BATCH", "2"))
    # every process builds the same global batch (same seed), then keeps
    # only its slice — exactly what the per-process data loader does
    batch_np = synthetic_batch(cfg, batch_size=global_b)
    sl = process_batch_slice(global_b)
    local = {k: jnp.asarray(v[sl]) for k, v in batch_np.items()}

    model = build_model(cfg)
    full = {k: jnp.asarray(v) for k, v in batch_np.items()}
    tx = make_optimizer(cfg.optim, steps_per_epoch=10)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), full, tx,
                               with_ema=False, jit_init=True)

    mesh = make_mesh()                      # all global devices
    with jax.set_mesh(mesh):
        state = replicate(state, mesh)
        sbatch = shard_batch(local, mesh)   # global array from local shards
        step = make_train_step(cfg, donate=False)
        _, metrics = step(state, sbatch, jax.random.PRNGKey(1))
        loss = float(metrics["loss_total"])
    print(f"MULTIHOST_LOSS {loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
