"""Evaluation CLI (the tools/test.py + dist_test.sh equivalent).

  python -m dhd_tpu.cli.test --preset dhd_s --ann-file infos_val.pkl \
      --checkpoint work_dirs/dhd_s/epoch_24 --eval miou
  python -m dhd_tpu.cli.test --preset dhd_tiny --synthetic   # smoke
"""
from __future__ import annotations

import argparse


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate a DHD-TPU model")
    p.add_argument("--preset", default="dhd_s")
    p.add_argument("--ann-file", default=None)
    p.add_argument("--data-root", default="")
    p.add_argument("--checkpoint", default=None,
                   help=".pth (converted on load) or orbax dir")
    p.add_argument("--eval", default="miou", choices=["miou", "ray-iou"])
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--use-ema", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--no-aavt", action="store_true",
                   help="do NOT align after view transformation for "
                        "temporal models (tools/test.py:235-237 forces "
                        "alignment at eval by default)")
    return p.parse_args()


def main():
    args = parse_args()
    import os
    import jax
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    from dhd_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    from dhd_tpu.config import get_config
    from dhd_tpu.eval import MIoUMetric
    from dhd_tpu.models import build_model

    cfg = get_config(args.preset)
    if cfg.temporal and not args.no_aavt:
        import dataclasses
        cfg = dataclasses.replace(cfg, align_after_view_transformation=True)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = build_model(cfg, dtype=dtype)

    # Every batch is yielded as (sample_indices, batch) so downstream
    # bookkeeping (ray-iou origins) cannot drift from what was evaluated.
    if args.synthetic or args.ann_file is None:
        from dhd_tpu.data import synthetic_batch
        bs = args.batch_size
        batches = [(list(range(i * bs, (i + 1) * bs)),
                    synthetic_batch(cfg, batch_size=bs, seed=i))
                   for i in range(2)]
        infos = None
    else:
        from dhd_tpu.data.nuscenes import NuScenesOccDataset
        from dhd_tpu.data.pipeline import SamplePipeline, collate
        ds = NuScenesOccDataset(args.ann_file, args.data_root,
                                num_adj_frames=cfg.num_adj_frames,
                                stereo=cfg.stereo)
        pipe = SamplePipeline(cfg, is_train=False, data_root=args.data_root)
        n = min(len(ds), args.limit or len(ds))

        def gen():
            # every sample is evaluated exactly once: the tail batch is
            # smaller (one extra jit specialization) instead of being
            # dropped (reference evaluates all of val, tools/test.py:286).
            for i in range(0, n, args.batch_size):
                idxs = list(range(i, min(i + args.batch_size, n)))
                yield idxs, collate([pipe(ds.get_sample(j)) for j in idxs])
        batches = gen()
        infos = ds.data_infos

    # peek the first batch without consuming it (generators are their own
    # iterators: next(iter(gen)) would silently skip batch 0)
    import itertools
    it = iter(batches)
    first = next(it)
    it = itertools.chain([first], it)
    example = {k: jnp.asarray(v) for k, v in first[1].items()}
    if cfg.stereo:
        # serving-setup guard: certify the Pallas cost-volume row window
        # against this rig's actual inter-frame geometry (falls back to
        # the exact XLA path instead of silently clipping taps)
        import dataclasses
        from dhd_tpu.models.dhd_stereo import resolve_cv_method
        cfg = dataclasses.replace(cfg,
                                  cv_method=resolve_cv_method(cfg, example))
        model = build_model(cfg, dtype=dtype)
    if args.checkpoint and args.checkpoint.endswith(".pth"):
        from dhd_tpu.io.convert import load_torch_checkpoint
        variables = load_torch_checkpoint(args.checkpoint, cfg)
    else:
        variables = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), example, train=False))()
        if args.checkpoint:
            from dhd_tpu.io import load_checkpoint
            restored = load_checkpoint(args.checkpoint)
            src = restored.get("ema") if args.use_ema and \
                restored.get("ema") else restored
            variables = {"params": src["params"],
                         "batch_stats": src["batch_stats"]}

    @jax.jit
    def eval_step(batch):
        out = model.apply({"params": variables["params"],
                           "batch_stats": variables["batch_stats"]},
                          batch, train=False)
        return jnp.argmax(out["occ_logits"], axis=-1).astype(jnp.uint8)

    # sharded eval (the multi_gpu_test equivalent, tools/test.py:263-268):
    # batches whose size divides the device count are sharded over a data
    # mesh — GSPMD splits the forward, confusion matrices are added on host
    from dhd_tpu.parallel import make_mesh
    from dhd_tpu.parallel.mesh import batch_sharding
    n_dev = jax.device_count()
    mesh = make_mesh() if n_dev > 1 else None

    def put(jbatch):
        bs = jbatch["imgs"].shape[0]
        if mesh is None or bs % n_dev:
            return jbatch
        sh = batch_sharding(mesh)
        return {k: jax.device_put(v, sh) for k, v in jbatch.items()}

    metric = MIoUMetric()
    preds_list, gts_list, token_idx = [], [], []
    n_eval = 0
    for idxs, batch in it:
        n_eval += len(idxs)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        occ = np.asarray(eval_step(put(jbatch)))
        metric.add_batch(occ, batch["voxel_semantics"],
                         batch["mask_camera"])
        if args.eval == "ray-iou":
            preds_list.extend(list(occ))
            gts_list.extend(list(batch["voxel_semantics"]))
            token_idx.extend(idxs)

    if args.eval == "ray-iou" and infos is not None:
        from dhd_tpu.eval import rayiou_from_outputs, scene_origins
        # origins are looked up by the exact sample indices that were
        # evaluated, in evaluation order (regression guard for the
        # batch/origin alignment)
        print("rayiou-samples: "
              + " ".join(infos[i]["token"] for i in token_idx))
        origins = [scene_origins(infos, i) for i in token_idx]
        vt = cfg.vt
        pc_range = (vt.x.lower, vt.y.lower, vt.z_fine.lower,
                    vt.x.upper, vt.y.upper, vt.z_fine.upper)
        res = rayiou_from_outputs(preds_list, gts_list, origins,
                                  pc_range, vt.x.interval)
        for k in ("RayIoU", "RayIoU@1", "RayIoU@2", "RayIoU@4"):
            print(f"{k}: {res[k]:.4f}")
    print(f"evaluated {n_eval} samples")
    print(metric.summary(), flush=True)


if __name__ == "__main__":
    main()
