"""AOT model export (the tools/convert_bevdet_to_TRT.py analogue).

Instead of ONNX->TensorRT engines, the TPU-native deployment artifact is a
serialized StableHLO program via jax.export: compile once, ship the bytes,
run anywhere with a matching runtime.

By default the artifact is the idiomatic TPU serving split: a SMALL
StableHLO program taking the weights as ARGUMENTS, plus a sibling
``<out>.weights.pkl`` of numpy arrays (weights stay device-resident across
calls; the program recompiles in seconds on any topology).  TRT bakes
weights into the engine because engines are per-GPU binaries; on TPU a
baked 600 MB module also exceeds remote-compile payload limits.  Pass
``--bake-weights`` for a self-contained single-file artifact.

``--int8`` adds the TRT-int8 analogue (convert_bevdet_to_TRT.py:42-120):
calibrate per-tensor activation scales for the image-encoder convs on a
few batches, then export with those convs running int8 on the MXU
(dhd_tpu/nn/quant.py).  Time the artifact with
``python -m dhd_tpu.cli.benchmark --what exported --artifact <file>``.

  python -m dhd_tpu.cli.export --preset dhd_s --out dhd_s.stablehlo --bf16
  python -m dhd_tpu.cli.export --preset dhd_s --out dhd_s_int8.stablehlo \
      --bf16 --int8
"""
from __future__ import annotations

import argparse

QUANT_PREFIXES = ("img_encoder/backbone",)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="dhd_s")
    p.add_argument("--out", required=True)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--int8", action="store_true",
                   help="quantize the image-encoder convs to int8 "
                        "(per-tensor activation scales calibrated on "
                        "--calib-batches batches: real data when "
                        "--ann-file is given, synthetic otherwise)")
    p.add_argument("--calib-batches", type=int, default=2)
    p.add_argument("--bake-weights", action="store_true",
                   help="embed weights as program constants (single-file "
                        "artifact) instead of the program+weights split")
    p.add_argument("--ann-file", default=None,
                   help="infos .pkl for real-data int8 calibration (the "
                        "analogue of convert_bevdet_to_TRT.py's HDF5 "
                        "calibration set, :42-120)")
    p.add_argument("--data-root", default="")
    args = p.parse_args()

    import os
    import jax
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp
    from jax import export as jexport

    from dhd_tpu.config import get_config
    from dhd_tpu.data import synthetic_batch
    from dhd_tpu.models import build_model

    cfg = get_config(args.preset)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = build_model(cfg, dtype=dtype)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, args.batch_size,
                                         with_gt=False).items()}
    if args.checkpoint and args.checkpoint.endswith(".pth"):
        from dhd_tpu.io.convert import load_torch_checkpoint
        variables = load_torch_checkpoint(args.checkpoint, cfg)
        variables = jax.tree.map(jnp.asarray, variables)
    else:
        variables = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), batch, train=False))()

    if args.bake_weights:
        def infer(batch):
            out = model.apply(variables, batch, train=False)
            return jnp.argmax(out["occ_logits"], axis=-1).astype(jnp.uint8)
    else:
        def infer(variables, batch):
            out = model.apply(variables, batch, train=False)
            return jnp.argmax(out["occ_logits"], axis=-1).astype(jnp.uint8)

    if args.int8:
        import dataclasses

        from dhd_tpu.nn.quant import calibrate_int8, quantize_fn

        # calibration needs a remat-free model (amax recording leaks
        # tracers under nn.remat — see calibrate_int8); remat is
        # output-invariant so the scales transfer to the exported model
        calib_model = build_model(
            dataclasses.replace(cfg, backbone_remat=False), dtype=dtype)

        def infer_calib(v, b):
            out = calib_model.apply(v, b, train=False)
            return jnp.argmax(out["occ_logits"], axis=-1).astype(jnp.uint8)
        if args.ann_file:
            # real-data calibration (convert_bevdet_to_TRT.py:42-120 reads
            # an HDF5 calib set; here the eval pipeline feeds real samples)
            from dhd_tpu.data.nuscenes import NuScenesOccDataset
            from dhd_tpu.data.pipeline import SamplePipeline, collate
            ds = NuScenesOccDataset(args.ann_file, args.data_root,
                                    num_adj_frames=cfg.num_adj_frames,
                                    stereo=cfg.stereo)
            pipe = SamplePipeline(cfg, is_train=False,
                                  data_root=args.data_root)
            n = min(len(ds), args.calib_batches * args.batch_size)
            raw = [collate([pipe(ds.get_sample(j)) for j in
                            range(i, min(i + args.batch_size, n))])
                   for i in range(0, n, args.batch_size)]
            # calibration batches must match the export batch size (one
            # program specialization); drop a short tail batch
            raw = [b for b in raw
                   if b["imgs"].shape[0] == args.batch_size]
            calib = [{k: jnp.asarray(v) for k, v in b.items()
                      if k in batch} for b in raw]
            src = f"real ({args.ann_file})"
        else:
            calib = [{k: jnp.asarray(v) for k, v in synthetic_batch(
                cfg, args.batch_size, with_gt=False, seed=100 + i).items()}
                for i in range(args.calib_batches)]
            src = "synthetic"
        scales = calibrate_int8(infer_calib, calib, QUANT_PREFIXES,
                                variables=variables)
        print(f"calibrated {len(scales)} conv activation scales "
              f"({len(calib)} {src} batches, prefixes={QUANT_PREFIXES})")
        infer = quantize_fn(infer, scales, QUANT_PREFIXES)

    if args.bake_weights:
        exported = jexport.export(jax.jit(infer))(batch)
    else:
        exported = jexport.export(jax.jit(infer))(variables, batch)
        import pickle
        wfile = args.out + ".weights.pkl"
        with open(wfile, "wb") as f:
            pickle.dump(jax.device_get(variables), f,
                        protocol=pickle.HIGHEST_PROTOCOL)
        print(f"weights -> {wfile} "
              f"({os.path.getsize(wfile) / 1e6:.1f} MB)")
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {args.preset}{' int8' if args.int8 else ''} -> "
          f"{args.out} ({len(blob) / 1e6:.1f} MB, "
          f"platforms={exported.platforms})")


if __name__ == "__main__":
    main()
