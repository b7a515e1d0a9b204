"""AOT model export (the tools/convert_bevdet_to_TRT.py analogue).

Instead of ONNX->TensorRT engines, the TPU-native deployment artifact is a
serialized StableHLO program via jax.export: compile once, ship the bytes,
run anywhere with a matching runtime.

  python -m dhd_tpu.cli.export --preset dhd_s --out dhd_s.stablehlo --bf16
"""
from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="dhd_s")
    p.add_argument("--out", required=True)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--checkpoint", default=None)
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

    def infer(batch):
        out = model.apply(variables, batch, train=False)
        return jnp.argmax(out["occ_logits"], axis=-1).astype(jnp.uint8)

    exported = jexport.export(jax.jit(infer))(batch)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {args.preset} -> {args.out} "
          f"({len(blob) / 1e6:.1f} MB, platforms={exported.platforms})")


if __name__ == "__main__":
    main()
