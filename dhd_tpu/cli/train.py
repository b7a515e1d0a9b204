"""Training CLI (the tools/train.py + dist_train.sh equivalent).

Single process drives all local devices through a data-parallel mesh — no
launcher needed (torch.distributed.launch's job is done by GSPMD).

  python -m dhd_tpu.cli.train --preset dhd_s --ann-file infos_train.pkl \
      --data-root data/nuscenes --work-dir work_dirs/dhd_s
  python -m dhd_tpu.cli.train --preset dhd_tiny --synthetic --steps 10
"""
from __future__ import annotations

import argparse
import json
import os
import time


def parse_args():
    p = argparse.ArgumentParser(description="Train a DHD-TPU model")
    p.add_argument("--preset", default="dhd_s")
    p.add_argument("--ann-file", default=None, help="bevdetv2 infos pkl")
    p.add_argument("--data-root", default="")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--batch-size", type=int, default=None,
                   help="global batch (default: reference per-GPU batch x "
                        "num devices)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--steps", type=int, default=None,
                   help="cap total steps (debug)")
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthetic data (smoke test)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--ckpt-interval", type=int, default=1,
                   help="epochs between checkpoints")
    p.add_argument("--resume-from", default=None)
    p.add_argument("--auto-resume", action="store_true",
                   help="resume from the newest epoch_* checkpoint in "
                        "--work-dir if one exists (preemption recovery)")
    p.add_argument("--temporal-start-epoch", type=int, default=None,
                   help="train without history frames until this epoch "
                        "(SequentialControlHook); default: always use them "
                        "(DHD configs do not enable the hook)")
    p.add_argument("--load-from", default=None,
                   help="warm-start .pth (converted) or orbax dir")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    # jax may be pre-imported by the interpreter; honor JAX_PLATFORMS anyway
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    from dhd_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    from dhd_tpu.config import get_config
    from dhd_tpu.data import synthetic_batch
    from dhd_tpu.models import build_model
    from dhd_tpu.parallel import make_mesh
    from dhd_tpu.parallel.mesh import replicate, shard_batch
    from dhd_tpu.train import (
        create_train_state, make_optimizer, make_train_step)

    from dhd_tpu.parallel.mesh import (initialize_distributed,
                                       process_batch_slice)
    multi_host = initialize_distributed()
    cfg = get_config(args.preset)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = build_model(cfg, dtype=dtype)
    n_dev = jax.device_count()                    # global devices
    n_proc = jax.process_count()
    if multi_host:
        print(f"multi-host: process {jax.process_index()}/{n_proc}, "
              f"{n_dev} global devices", flush=True)
    per_gpu = {"dhd_s": 4, "dhd_m": 3, "dhd_l": 2}.get(cfg.name, 1)
    batch_size = args.batch_size or per_gpu * n_dev    # GLOBAL batch
    epochs = args.epochs or cfg.optim.max_epochs
    # the batch axis must divide the mesh: use the largest divisor
    mesh_devices = n_dev
    while batch_size % mesh_devices or mesh_devices % n_proc:
        mesh_devices -= 1
    if mesh_devices != n_dev:
        print(f"batch {batch_size} not divisible by {n_dev} devices; "
              f"using a {mesh_devices}-device mesh", flush=True)
    mesh = make_mesh(None if mesh_devices == n_dev else mesh_devices)
    assert batch_size % n_proc == 0, (batch_size, n_proc)
    local_bs = batch_size // n_proc               # rows this process loads

    if args.synthetic or args.ann_file is None:
        n_samples = batch_size * 4

        def epoch_batches():
            for i in range(0, n_samples, batch_size):
                b = synthetic_batch(cfg, batch_size=batch_size,
                                    seed=args.seed + i)
                sl = process_batch_slice(batch_size)
                yield {k: v[sl] for k, v in b.items()}
        steps_per_epoch = n_samples // batch_size
    else:
        from dhd_tpu.data.loader import PrefetchLoader
        from dhd_tpu.data.nuscenes import NuScenesOccDataset
        from dhd_tpu.data.pipeline import SamplePipeline
        ds = NuScenesOccDataset(args.ann_file, args.data_root,
                                num_adj_frames=cfg.num_adj_frames,
                                stereo=cfg.stereo)
        pipe = SamplePipeline(cfg, is_train=True, data_root=args.data_root,
                              seed=args.seed)
        loader = PrefetchLoader(ds, pipe, local_bs, shuffle=True,
                                num_workers=8, prefetch=3, seed=args.seed,
                                shard=(jax.process_index(), n_proc))
        steps_per_epoch = len(loader)

        def epoch_batches():
            yield from loader

    tx = make_optimizer(cfg.optim, steps_per_epoch=steps_per_epoch)
    init_batch = {k: jnp.asarray(v) for k, v in next(epoch_batches()).items()}
    state = create_train_state(model, cfg, jax.random.PRNGKey(args.seed),
                               init_batch, tx)

    if args.load_from:
        from dhd_tpu.io import load_checkpoint
        from dhd_tpu.io.convert import load_torch_checkpoint
        if args.load_from.endswith(".pth"):
            variables = load_torch_checkpoint(args.load_from, cfg)
            state = state.replace(params=variables["params"],
                                  batch_stats=variables["batch_stats"])
        else:
            state = load_checkpoint(args.load_from, state)
    start_epoch = 0
    resume_path = args.resume_from
    if args.auto_resume and not resume_path and args.work_dir and \
            os.path.isdir(args.work_dir):
        cands = sorted(
            (d for d in os.listdir(args.work_dir)
             if d.startswith("epoch_") and d[6:].isdigit()),
            key=lambda d: int(d[6:]))
        if cands:
            resume_path = os.path.join(args.work_dir, cands[-1])
            start_epoch = int(cands[-1][6:])
            print(f"auto-resuming from {resume_path}", flush=True)
    if resume_path:
        from dhd_tpu.io import load_checkpoint
        state = load_checkpoint(resume_path, state)

    log_file = None
    if args.work_dir:
        os.makedirs(args.work_dir, exist_ok=True)
        log_file = open(os.path.join(args.work_dir, "metrics.jsonl"), "a")

    with jax.set_mesh(mesh):
        state = replicate(state, mesh)
        steps = {True: make_train_step(cfg)}
        if cfg.temporal and args.temporal_start_epoch is not None:
            steps[False] = make_train_step(cfg, with_prev=False)
        rng = jax.random.PRNGKey(args.seed + 1)
        step = int(state.step)
        t0 = time.perf_counter()
        for epoch in range(start_epoch, epochs):
            use_prev = (args.temporal_start_epoch is None
                        or epoch > args.temporal_start_epoch)
            train_step = steps[use_prev if False in steps else True]
            for batch in epoch_batches():
                sbatch = shard_batch(
                    {k: jnp.asarray(v) for k, v in batch.items()}, mesh)
                state, metrics = train_step(
                    state, sbatch, jax.random.fold_in(rng, step))
                step += 1
                if step % args.log_interval == 0 or args.steps:
                    m = {k: float(v) for k, v in metrics.items()}
                    dt = time.perf_counter() - t0
                    print(f"epoch {epoch} step {step} "
                          f"({dt / max(step, 1):.2f}s/it) "
                          + " ".join(f"{k}={v:.4f}" for k, v in
                                     sorted(m.items())), flush=True)
                    if log_file is not None:
                        log_file.write(json.dumps(
                            {"epoch": epoch, "step": step, **m}) + "\n")
                        log_file.flush()
                if args.steps and step >= args.steps:
                    break
            if args.work_dir and (epoch + 1) % args.ckpt_interval == 0:
                from dhd_tpu.io import save_checkpoint
                path = os.path.join(args.work_dir, f"epoch_{epoch + 1}")
                save_checkpoint(path, jax.device_get(state))
                print(f"saved checkpoint {path}", flush=True)
            if args.steps and step >= args.steps:
                break
    print("training done", flush=True)


if __name__ == "__main__":
    main()
