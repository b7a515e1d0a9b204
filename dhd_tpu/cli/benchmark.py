"""Benchmark / analysis CLI (tools/analysis_tools/{benchmark,
benchmark_view_transformer, get_flops}.py equivalents).

All timings chain iterations (input perturbed by a scalar from the previous
output) and end in a host read, so async device transports cannot fake them.

  python -m dhd_tpu.cli.benchmark --preset dhd_s --what full --bf16
  python -m dhd_tpu.cli.benchmark --preset dhd_s --what stages
  python -m dhd_tpu.cli.benchmark --preset dhd_s --what flops
"""
from __future__ import annotations

import argparse
import time


def _print_profile(prof, module_substr, n_ops):
    """Per-module device time + top-op table from a trace_device() result."""
    from dhd_tpu.profiling import module_ms, top_ops
    for name, durs in sorted(prof["modules"].items()):
        if len(durs) > 1:
            mean = sum(durs[1:]) / len(durs[1:])
        else:
            mean = durs[0]
        print(f"[profile] module {name}: {mean:.2f} ms/exec "
              f"x{len(durs)}")
    dev = module_ms(prof, module_substr, drop_first=1)
    if dev is not None:
        print(f"[profile] device time ({module_substr}): {dev:.2f} ms")
    print(f"[profile] top ops by device time:")
    hlo = prof.get("op_hlo") or {}
    for name, ms, cnt in top_ops(prof, n_ops):
        print(f"  {ms:10.3f} ms  x{cnt:<5d} {name}")
        if name in hlo:
            # the HLO text (shapes/layouts/operands) attributes the op
            print(f"        {hlo[name][:240]}")


def chained_time(step, iters: int = 20, *args):
    """step: jitted fn(carry, *args)->carry.  Returns seconds/iter.

    Extra operands go through ``args`` (jit arguments, not closure
    constants — closed-over batches blow up the compile payload).
    """
    import jax.numpy as jnp
    c = jnp.zeros((), jnp.float32)
    c = step(c, *args)
    _ = float(c)                      # force compile + completion
    t0 = time.perf_counter()
    for _ in range(iters):
        c = step(c, *args)
    _ = float(c)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="dhd_s")
    p.add_argument("--what", default="full",
                   choices=["full", "stream", "stages", "flops", "train",
                            "pool", "cv", "exported"])
    p.add_argument("--artifact", default=None,
                   help="serialized jax.export artifact for --what "
                        "exported (see cli/export.py)")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--fp32", dest="bf16", action="store_false")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--profile", action="store_true",
                   help="after timing, capture a jax.profiler device trace "
                        "and print per-module device ms + the top ops")
    p.add_argument("--profile-ops", type=int, default=25)
    p.add_argument("--profile-detail", action="store_true",
                   help="keep individual op identities in the profile "
                        "(fusion.123 stays distinct) + print their "
                        "source/metadata stats for attribution")
    p.add_argument("--pool-plan", action="store_true",
                   help="--what train only: ship a precomputed pooling "
                        "plan with the batch (a pod loader's option), "
                        "routing training through the fused Pallas pool "
                        "kernel + its custom_vjp instead of XLA "
                        "scatter/gather.  Single-frame presets only.")
    args = p.parse_args()

    import os
    import jax
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    from dhd_tpu.utils import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from dhd_tpu.config import get_config
    from dhd_tpu.data import synthetic_batch
    from dhd_tpu.models import build_model

    cfg = get_config(args.preset)
    dt = jnp.bfloat16 if args.bf16 else jnp.float32

    if args.what == "exported":
        # time the DESERIALIZED deployment artifact (the benchmark_trt.py
        # analogue: the engine as shipped, not the live model)
        from jax import export as jexport
        if not args.artifact:
            raise SystemExit("--what exported needs --artifact")
        with open(args.artifact, "rb") as f:
            exported = jexport.deserialize(bytearray(f.read()))
        fn = jax.jit(exported.call)
        ebatch = {k: jnp.asarray(v)
                  for k, v in synthetic_batch(cfg, args.batch_size,
                                              with_gt=False).items()}

        wfile = args.artifact + ".weights.pkl"
        if os.path.exists(wfile):
            # program+weights split artifact (the export default): weights
            # ride as call arguments — device-resident arrays, not compile
            # payload (a baked 600 MB module breaks remote-compile limits)
            import pickle
            with open(wfile, "rb") as f:
                wvars = jax.tree.map(jnp.asarray, pickle.load(f))
            call = lambda b, w: exported.call(w, b)       # noqa: E731
        else:
            wvars = {}
            call = lambda b, w: exported.call(b)          # noqa: E731

        # all iterations inside ONE on-device fori_loop: the artifact's
        # weight tree is ~800 leaves, and per-call argument marshalling
        # through the device tunnel costs ~1.5 ms/leaf — a per-iter python
        # loop measured 1.2 s/iter for a 12.5 ms program
        @jax.jit
        def run(batch, wvars, n):
            def body(_, c):
                b = dict(batch)
                b["imgs"] = batch["imgs"] + c.astype(batch["imgs"].dtype)
                occ = call(b, wvars)         # (B, Dx, Dy, Dz) uint8
                return jnp.tanh(jnp.sum(occ.astype(jnp.float32)) * 1e-9)
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        _ = float(run(ebatch, wvars, 1))     # compile + warm
        t0 = time.perf_counter()
        _ = float(run(ebatch, wvars, args.iters))
        dt_s = (time.perf_counter() - t0) / args.iters
        print(f"{args.preset} exported artifact: {dt_s * 1e3:.2f} ms/iter "
              f"= {args.batch_size / dt_s:.1f} samples/s")
        return

    model = build_model(cfg, dtype=dt)

    if args.what == "stream":
        # temporal serving: the streaming cache mode (the reference's
        # benchmark_sequential.py — prev-frame features cached, only the
        # key frame recomputed each step).  Much smaller program than the
        # full F-frame forward, and the honest deployment configuration.
        if not cfg.temporal:
            raise SystemExit("--what stream needs a temporal preset")
        tb = {k: jnp.asarray(v)
              for k, v in synthetic_batch(cfg, args.batch_size,
                                          with_gt=False).items()}
        if cfg.stereo:
            # serving-setup guard: certify the Pallas cost-volume window
            # against the rig's inter-frame geometry (ADVICE r3) — falls
            # back to the exact XLA path instead of silently clipping
            import dataclasses
            from dhd_tpu.models.dhd_stereo import resolve_cv_method
            cfg = dataclasses.replace(cfg,
                                      cv_method=resolve_cv_method(cfg, tb))
            model = build_model(cfg, dtype=dt)
        sbatch = {"imgs": tb["imgs"][:, 0],
                  "sensor2ego": tb["sensor2ego"][:, 0],
                  "ego2global": tb["ego2global"][:, 0],
                  "intrins": tb["intrins"][:, 0],
                  "post_rots": tb["post_rots"][:, 0],
                  "post_trans": tb["post_trans"][:, 0],
                  "bda": tb["bda"]}
        variables = jax.jit(lambda rng, b: model.init(
            rng, b, train=False, cache={}))(jax.random.PRNGKey(0), sbatch)
        _ = float(jnp.sum(jax.tree.leaves(variables)[0]
                          .astype(jnp.float32)))
        # fixed-rig serving: precompute the pooling plan + the rig-static
        # half of the stereo warp plan once (the 'accelerate' mode)
        from dhd_tpu.models.dhd_stereo import (build_stream_cv_static,
                                               build_stream_pool_plan)
        sbatch["pool_plan"] = jax.jit(
            lambda b: build_stream_pool_plan(cfg, b))(sbatch)
        if cfg.stereo and cfg.cv_method == "pallas":
            sbatch["cv_static"] = jax.jit(
                lambda b: build_stream_cv_static(cfg, b))(sbatch)
        # one bootstrap step to get a steady-state cache structure
        _, cache = jax.jit(lambda v, b: model.apply(
            v, b, train=False, cache={}))(variables, sbatch)

        @jax.jit
        def step(c, batch, cache, variables):
            # variables ride as jit arguments: closure constants would be
            # inlined into the remote-compile payload and exceed the device
            # tunnel's request limit for the larger presets
            b = dict(batch)
            b["imgs"] = batch["imgs"] + c.astype(batch["imgs"].dtype)
            out, new_cache = model.apply(variables, b, train=False,
                                         cache=cache)
            return (jnp.tanh(jnp.mean(out["occ_logits"].astype(
                jnp.float32))) * 1e-6, new_cache)

        c = jnp.zeros((), jnp.float32)
        c, cache = step(c, sbatch, cache, variables)
        _ = float(c)                       # force compile + completion
        t0 = time.perf_counter()
        for _ in range(args.iters):
            c, cache = step(c, sbatch, cache, variables)
        _ = float(c)
        dt_s = (time.perf_counter() - t0) / args.iters
        print(f"{args.preset} streaming inference: {dt_s * 1e3:.2f} "
              f"ms/iter = {args.batch_size / dt_s:.1f} samples/s")
        if args.profile:
            from dhd_tpu.profiling import trace_device
            n_prof = min(args.iters, 6)

            def run():
                nonlocal c, cache
                for _ in range(n_prof):
                    c, cache = step(c, sbatch, cache, variables)
                _ = float(c)
            _print_profile(trace_device(run, collapse=not args.profile_detail), "step", args.profile_ops)
        return

    if args.what == "train":
        # the whole-model train benchmark: no eval-mode param copy (it
        # would sit in HBM for the entire run), donated state so params/
        # opt/EMA update in place — what cli/train.py actually does.
        from dhd_tpu.train import (
            create_train_state, make_optimizer, make_train_step)
        tbatch = {k: jnp.asarray(v)
                  for k, v in synthetic_batch(cfg, args.batch_size,
                                              with_gt=True).items()}
        if args.pool_plan:
            if cfg.temporal:
                raise SystemExit("--pool-plan: single-frame presets only "
                                 "(temporal training pools each frame "
                                 "with its own geometry)")
            from dhd_tpu.models.dhd import build_batch_pool_plan
            tbatch["pool_plan"] = jax.jit(
                lambda b: build_batch_pool_plan(cfg, b))(tbatch)
            print("train batch ships a precomputed pool plan "
                  "(fused-kernel path)")
        tx = make_optimizer(cfg.optim, steps_per_epoch=1000)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   tbatch, tx)
        step_fn = make_train_step(cfg, donate=True)
        rng = jax.random.PRNGKey(1)
        state, m = step_fn(state, tbatch, rng)
        _ = float(m["loss_total"])                 # force compile + run
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, m = step_fn(state, tbatch, jax.random.fold_in(rng, i))
        _ = float(m["loss_total"])                 # chained via state
        dt_s = (time.perf_counter() - t0) / args.iters
        print(f"{args.preset} train step: {dt_s * 1e3:.2f} ms/iter = "
              f"{args.batch_size / dt_s:.2f} samples/s")
        try:
            # XLA-cost-analysis FLOPs of the compiled train step -> MFU
            # (wall-clock based; the profiler device time is ~1-2 ms less
            # through the tunnel). 197 bf16 TFLOP/s = v5e public peak.
            ca = step_fn.lower(state, tbatch, rng).compile().cost_analysis()
            fl = float(ca.get("flops", float("nan")))
            dev = str(jax.devices()[0])
            peak = 197e12 if "v5 lite" in dev else float("nan")
            print(f"train flops {fl / 1e12:.2f} T (XLA cost analysis); "
                  f"MFU {100 * fl / (dt_s * peak):.1f}% wall-clock "
                  f"on {dev}")
        except Exception as e:              # pragma: no cover
            print(f"cost_analysis failed: {e}")
        if args.profile:
            from dhd_tpu.profiling import trace_device
            n_prof = min(args.iters, 4)

            def run():
                nonlocal state, m
                for i in range(n_prof):
                    state, m = step_fn(state, tbatch,
                                       jax.random.fold_in(rng, 100 + i))
                _ = float(m["loss_total"])
            _print_profile(trace_device(run, collapse=not args.profile_detail), "train_step",
                           args.profile_ops)
        return

    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, args.batch_size,
                                         with_gt=False).items()}
    variables = jax.jit(
        lambda rng, b: model.init(rng, b, train=False))(
        jax.random.PRNGKey(0), batch)
    _ = float(jnp.sum(jax.tree.leaves(variables)[0].astype(jnp.float32)))

    def full_step_factory():
        @jax.jit
        def step(c, batch, variables):
            # variables as jit args, not closure constants (tunnel payload)
            b = dict(batch)
            b["imgs"] = batch["imgs"] + c.astype(batch["imgs"].dtype)
            out = model.apply(variables, b, train=False)["occ_logits"]
            return jnp.tanh(jnp.mean(out)) * 1e-6
        return step

    if args.what == "flops":
        fwd = jax.jit(lambda v, b: model.apply(v, b, train=False)
                      ["occ_logits"])
        compiled = fwd.lower(variables, batch).compile()
        ca = compiled.cost_analysis()
        print(f"forward flops: {ca.get('flops', float('nan')) / 1e9:.1f} G")
        print(f"bytes accessed: "
              f"{ca.get('bytes accessed', float('nan')) / 1e9:.2f} GB")
        n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
        print(f"params: {n_params / 1e6:.1f} M")
        return

    if args.what == "cv":
        # stereo cost volume decomposition at this preset's shapes:
        # (a) plan build (reproject grid + window origins, geometry-only),
        # (b) kernel from a prebuilt plan (incl. layout transposes),
        # (c) the full fused call the model runs (plan + kernel + softmax)
        import numpy as np
        from dhd_tpu.geometry import create_frustum
        from dhd_tpu.ops.cost_volume import stereo_cost_volume
        from dhd_tpu.ops.cost_volume_pallas import (build_cv_plan,
                                                    cv_cost_pallas)
        if not cfg.stereo:
            raise SystemExit("--what cv needs a stereo preset")
        vt = cfg.vt
        b, n = args.batch_size, cfg.num_cams
        hs, ws = vt.input_size[0] // 4, vt.input_size[1] // 4
        # stereo feature channel width: stage-0 backbone output
        cs = {"dhd_m": 256, "dhd_l": 128}.get(args.preset, 64)
        rng = np.random.default_rng(0)
        frustum = create_frustum(vt.depth, vt.input_size, downsample=4,
                                 sid=vt.sid)
        k2s = np.broadcast_to(np.eye(4, dtype=np.float32),
                              (b, n, 4, 4)).copy()
        k2s[..., 0, 3] = 0.3
        k2s[..., 2, 3] = -0.5                       # 0.5 m forward motion
        intr = np.asarray(batch["intrins"][:, 0] if batch["intrins"].ndim
                          == 5 else batch["intrins"], np.float32)
        prot = np.asarray(batch["post_rots"][:, 0] if
                          batch["post_rots"].ndim == 5
                          else batch["post_rots"], np.float32)
        ptra = np.asarray(batch["post_trans"][:, 0] if
                          batch["post_trans"].ndim == 4
                          else batch["post_trans"], np.float32)
        prev = jnp.asarray(rng.normal(0, 1, (b, n, hs, ws, cs)), dt)
        curr = jnp.asarray(rng.normal(0, 1, (b, n, hs, ws, cs)), dt)

        plan_fn = jax.jit(lambda k: build_cv_plan(
            frustum, k, jnp.asarray(intr), jnp.asarray(prot),
            jnp.asarray(ptra), hs=hs, ws=ws, win_rows=cfg.cv_win_rows))

        @jax.jit
        def plan_step(c, k2s):
            k = k2s.at[:, :, 0, 3].add(c)
            p = build_cv_plan(frustum, k, jnp.asarray(intr),
                              jnp.asarray(prot), jnp.asarray(ptra),
                              hs=hs, ws=ws, win_rows=cfg.cv_win_rows)
            return jnp.tanh(jnp.sum(p["uf"]) * 1e-9 + p["wr_req"] * 0.0)

        print(f"plan build: "
              f"{chained_time(plan_step, args.iters, jnp.asarray(k2s)) * 1e3:.2f} ms",
              flush=True)

        plan = jax.block_until_ready(plan_fn(jnp.asarray(k2s)))

        @jax.jit
        def kern_step(c, prev, curr):
            cost = cv_cost_pallas(
                (prev + c.astype(prev.dtype)).reshape(b * n, hs, ws, cs),
                curr.reshape(b * n, hs, ws, cs), plan,
                bias=cfg.depthnet_cfg.bias)
            return jnp.tanh(jnp.sum(cost) * 1e-9)

        print(f"kernel+layout (prebuilt plan): "
              f"{chained_time(kern_step, args.iters, prev, curr) * 1e3:.2f}"
              f" ms", flush=True)

        @jax.jit
        def full_step(c, prev, curr):
            p = stereo_cost_volume(
                prev + c.astype(prev.dtype), curr, frustum,
                jnp.asarray(k2s), jnp.asarray(intr), jnp.asarray(prot),
                jnp.asarray(ptra), bias=cfg.depthnet_cfg.bias,
                method=cfg.cv_method, win_rows=cfg.cv_win_rows)
            return jnp.tanh(jnp.sum(p.astype(jnp.float32)) * 1e-9)

        print(f"full stereo_cost_volume (plan+kernel+softmax): "
              f"{chained_time(full_step, args.iters, prev, curr) * 1e3:.2f}"
              f" ms", flush=True)
        return

    if args.what == "pool":
        # the full MGHS pooling stage at this preset's scale: XLA
        # segment-sums vs the Pallas dual kernel (in-jit sort) vs the Pallas
        # kernel with a precomputed plan (serving / 'accelerate' mode)
        import numpy as np
        from dhd_tpu.geometry import create_frustum, frustum_to_ego
        from dhd_tpu.ops import (build_pool_plan, compute_pool_indices,
                                 mghs_pool, mghs_pool_pallas)
        from dhd_tpu.ops.pallas_pool import segment_sum_pooling
        vt = cfg.vt
        fh, fw = vt.feat_size
        b, n = args.batch_size, cfg.num_cams
        c = vt.out_channels
        rng = np.random.default_rng(0)
        geom = {k: batch[k] for k in ("sensor2keyego", "intrins",
                                      "post_rots", "post_trans", "bda")}
        if cfg.temporal:
            # temporal batches carry a frames dim after B: pool the key frame
            geom = {k: (v[:, 0] if k != "bda" else v)
                    for k, v in geom.items()}
        coords = frustum_to_ego(
            create_frustum(vt.depth, vt.input_size, vt.downsample, vt.sid),
            geom["sensor2keyego"], geom["intrins"], geom["post_rots"],
            geom["post_trans"], geom["bda"])
        idx = jax.jit(lambda co: compute_pool_indices(co, vt))(coords)
        depth = jnp.asarray(jax.nn.softmax(jnp.asarray(
            rng.normal(0, 1, (b, n, vt.D, fh, fw)), jnp.float32), axis=2),
            dt)
        feat = jnp.asarray(rng.normal(0, 1, (b, n, fh, fw, c)), dt)
        bmask = jnp.asarray(
            rng.integers(0, 2, (b, n, fh, fw, 3)).astype(np.float32), dt)
        interp = jax.devices()[0].platform != "tpu"
        plan = jax.jit(lambda i: build_pool_plan(i, vt, depth.shape))(idx)

        def timed(name, fn, depth_arg=None):
            @jax.jit
            def step(carry, depth, feat):
                bev, vox = fn(depth, feat + carry.astype(feat.dtype))
                return jnp.tanh(jnp.sum(bev.astype(jnp.float32))
                                + jnp.sum(vox.astype(jnp.float32))) * 1e-9
            d = depth if depth_arg is None else depth_arg
            print(f"{name}: "
                  f"{chained_time(step, args.iters, d, feat) * 1e3:.2f}"
                  f" ms", flush=True)

        depth_px = jnp.transpose(depth, (0, 1, 3, 4, 2))  # pixel-major
        timed("mghs_pool xla segment_sum",
              lambda d, f: mghs_pool(d, f, bmask, idx, vt))
        tag = " [interpret]" if interp else ""
        timed(f"mghs_pool pallas (in-jit sort){tag}",
              lambda d, f: mghs_pool_pallas(d, f, bmask, idx, vt, interp),
              depth_arg=depth_px)
        timed(f"mghs_pool pallas + plan (serving){tag}",
              lambda d, f: mghs_pool_pallas(d, f, bmask, None, vt, interp,
                                            plan=plan), depth_arg=depth_px)
        # raw scatter primitive comparison (the CUDA-kernel analogue)
        p_pts = b * n * vt.D * fh * fw
        v = vt.z_fine.size * vt.y.size * vt.x.size * b
        vals = jnp.asarray(rng.normal(0, 1, (p_pts, c)), dt)
        seg = jnp.asarray(rng.integers(0, int(v * 1.5), p_pts)
                          .astype(np.int32))

        @jax.jit
        def s1(carry, vals):
            out = jax.ops.segment_sum(vals + carry.astype(vals.dtype), seg,
                                      num_segments=v + 1)
            return jnp.tanh(jnp.sum(out.astype(jnp.float32))) * 1e-9

        @jax.jit
        def s2(carry, vals):
            out = segment_sum_pooling(vals + carry.astype(vals.dtype), seg,
                                      v, interp)
            return jnp.tanh(jnp.sum(out.astype(jnp.float32))) * 1e-9

        print(f"raw xla segment_sum: "
              f"{chained_time(s1, args.iters, vals) * 1e3:.2f} ms")
        print(f"raw pallas segment_sum (sorts inside){tag}: "
              f"{chained_time(s2, args.iters, vals) * 1e3:.2f} ms")
        return

    if args.what == "full":
        step = full_step_factory()
        dt_s = chained_time(step, args.iters, batch, variables)
        fps = args.batch_size / dt_s
        print(f"{args.preset} end-to-end: {dt_s * 1e3:.2f} ms/iter "
              f"= {fps:.1f} samples/s")
        if args.profile:
            from dhd_tpu.profiling import trace_device
            n_prof = min(args.iters, 6)

            def run():
                c = jnp.zeros((), jnp.float32)
                for _ in range(n_prof):
                    c = step(c, batch, variables)
                _ = float(c)
            _print_profile(trace_device(run, collapse=not args.profile_detail), "step", args.profile_ops)
        return

    # stages: time the full model and the model minus the view transform by
    # swapping submodule outputs is intrusive; instead time standalone
    # submodule applications with representative shapes.
    from dhd_tpu.models.dhd import BEVEncoder, ImageEncoder, MGHSTransform
    from dhd_tpu.nn import UNet

    b = args.batch_size
    n = cfg.num_cams
    h, w = cfg.vt.input_size
    fh, fw = cfg.vt.feat_size

    def time_mod(name, mod, x, apply=None, init=None):
        ini = init or (lambda: mod.init(jax.random.PRNGKey(0), *x))
        v = jax.jit(ini)()
        _ = float(jnp.sum(jax.tree.leaves(v)[0].astype(jnp.float32)))
        ap = apply or (lambda v, *x: mod.apply(v, *x))

        @jax.jit
        def step(c, v):
            xs = (x[0] + c.astype(x[0].dtype),) + tuple(x[1:])
            out = ap(v, *xs)
            leaf = jax.tree.leaves(out)[0]
            return jnp.tanh(jnp.mean(leaf.astype(jnp.float32))) * 1e-6
        print(f"{name}: {chained_time(step, args.iters, v) * 1e3:.2f} ms",
              flush=True)

    time_mod("img_encoder", ImageEncoder(cfg, dtype=dt),
             (jnp.ones((b * n, h, w, 3), dt),),
             apply=lambda v, x: ImageEncoder(cfg, dtype=dt).apply(v, x)[0])
    # temporal presets carry frames-major (B, F, ...) geometry — the view
    # transform sees one frame's worth
    f0 = (lambda x: x[:, 0]) if cfg.temporal else (lambda x: x)
    geom = {k: f0(batch[k]) for k in ("sensor2keyego", "intrins",
                                      "post_rots", "post_trans")}
    geom["bda"] = batch["bda"]
    vtm = MGHSTransform(cfg, dtype=dt)
    feat = jnp.ones((b, n, fh, fw, cfg.vt.in_channels), dt) * 0.01
    if cfg.stereo:
        cv = jnp.full((b * n, 4 * fh, 4 * fw, cfg.vt.D), 1.0 / cfg.vt.D, dt)
        time_mod("view_transform", vtm, (feat, geom),
                 apply=lambda v, f, g: vtm.apply(v, f, g,
                                                 cost_volume=cv)["vox"],
                 init=lambda: vtm.init(jax.random.PRNGKey(0), feat, geom,
                                       cost_volume=cv))
    else:
        time_mod("view_transform", vtm, (feat, geom),
                 apply=lambda v, f, g: vtm.apply(v, f, g)["vox"])
    dy, dx = cfg.vt.y.size, cfg.vt.x.size
    time_mod("bev_encoder", BEVEncoder(cfg, dtype=dt),
             (jnp.ones((b, dy, dx, cfg.vt.out_channels), dt) * 0.01,))
    s1, s2, s3 = cfg.vt.slab_sizes
    for i, slab in enumerate((s1, s2, s3)):
        cin = slab * cfg.vt.out_channels
        time_mod(f"voxel_encoder{i} (unet {cin}->"
                 f"{cfg.voxel_encoder_out[i]})",
                 UNet(n_classes=cfg.voxel_encoder_out[i], dtype=dt),
                 (jnp.ones((b, dy, dx, cin), dt) * 0.01,))


if __name__ == "__main__":
    main()
