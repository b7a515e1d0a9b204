"""DHD temporal + stereo model (DHD-M / DHD-L).

Re-creates ``DHD_stereo`` (detectors/DHD_model.py:245-667) on top of the
BEVDet4D/BEVStereo4D frame protocol (detectors/bevdet4d.py:208-288,
bevstereo4d.py:13-275):

* F = 1 key + num_adj history + 1 extra stereo ref frame.
* frames processed newest-history-first; the extra-ref frame contributes only
  its stride-4 stage-0 feature for the stereo cost volume; every non-key
  frame is under stop_gradient (the torch.no_grad rule).
* each processed frame runs the full MGHS transform with a stereo cost
  volume against the *previous* frame's stereo features, followed by the
  pre-process CustomResNets (collapse z -> 1-layer resnet -> restore z).
* frame BEV/voxel grids are concatenated along channels (optionally after a
  BEV-space warp when align_after_view_transformation), then the usual
  bev-encoder / slab-UNet / SFA / head stack runs.

Batch layout (our native API, cleaner than the reference's mixed
camera-major/frame-major packing): every per-view tensor is (B, F, N, ...)
frames-major; imgs is (B, F, N, H, W, 3).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dhd_tpu.config import ModelConfig
from dhd_tpu.geometry import (create_frustum, get_mlp_input, rigid_inverse,
                              rigid_relative)
from dhd_tpu.ops import grid_sample_2d
from dhd_tpu.ops.cost_volume import stereo_cost_volume
from dhd_tpu.nn import CustomResNet, OccHead, SFA, UNet
from .dhd import BEVEncoder, ImageEncoder, MGHSTransform, collapse_z

Dtype = Any


def uncollapse_z(x: jnp.ndarray, dz: int) -> jnp.ndarray:
    """(B, Dy, Dx, Dz*C) -> (B, Dy, Dx, Dz, C): inverse of collapse_z,
    matching torch.stack(torch.chunk(x, Dz, 1), 2) (DHD_model.py:366-367).
    A free reshape under the z-minor voxel layout."""
    b, dy, dx, zc = x.shape
    return x.reshape(b, dy, dx, dz, zc // dz)


def shift_grid(dy: int, dx: int, curr_s2k: jnp.ndarray, prev_s2k: jnp.ndarray,
               bda: jnp.ndarray, x_grid, y_grid) -> jnp.ndarray:
    """Normalized BEV warp grid aligning a prev-frame BEV map to the key ego
    frame (bevdet4d.py:43-116).

    curr_s2k/prev_s2k: (B, 4, 4) cam-front sensor->keyego of the two frames.
    Returns (B, Dy, Dx, 2) in [-1, 1].
    """
    hp = jax.lax.Precision.HIGHEST
    b = curr_s2k.shape[0]
    bda4 = jnp.zeros((b, 4, 4), curr_s2k.dtype)
    bda4 = bda4.at[:, :3, :3].set(bda).at[:, 3, 3].set(1.0)
    curr = jnp.einsum("bij,bjk->bik", bda4, curr_s2k, precision=hp)
    prev = jnp.einsum("bij,bjk->bik", bda4, prev_s2k, precision=hp)
    keyego2adjego = jnp.einsum("bij,bjk->bik", curr, jnp.linalg.inv(prev),
                               precision=hp)
    # drop the z row/col: BEV is 2D (bevdet4d.py:93)
    keep = jnp.asarray([0, 1, 3])
    k2a = keyego2adjego[:, keep][:, :, keep]            # (B, 3, 3)
    feat2bev = jnp.asarray(
        [[x_grid.interval, 0.0, x_grid.lower],
         [0.0, y_grid.interval, y_grid.lower],
         [0.0, 0.0, 1.0]], curr_s2k.dtype)
    tf = jnp.einsum("ij,bjk,kl->bil", jnp.linalg.inv(feat2bev), k2a,
                    feat2bev, precision=hp)
    xs = jnp.arange(dx, dtype=jnp.float32)
    ys = jnp.arange(dy, dtype=jnp.float32)
    grid = jnp.stack(
        [jnp.broadcast_to(xs[None, :], (dy, dx)),
         jnp.broadcast_to(ys[:, None], (dy, dx)),
         jnp.ones((dy, dx), jnp.float32)], axis=-1)      # (Dy, Dx, 3)
    warped = jnp.einsum("bij,hwj->bhwi", tf, grid, precision=hp)
    norm = jnp.asarray([dx - 1.0, dy - 1.0], jnp.float32)
    return warped[..., :2] / norm * 2.0 - 1.0


def prepare_stereo_inputs(batch):
    """Key-ego alignment + cur->adj sensor transforms
    (bevdet4d.py:208-288), frames-major layout.

    The reference does this in fp64 (bevdet.py:72-74 `.double()`).  The
    pipeline precomputes both transforms host-side in np.float64
    (data/pipeline.py) and ships them as batch keys; when a caller feeds
    raw poses instead, the in-jit fallback uses the cancellation-free
    SE3 composition (geometry/rigid.py) so fp32 stays accurate despite
    O(1000 m) nuScenes global translations.
    """
    if "sensor2keyego" in batch and "curr2adjsensor" in batch:
        return (batch["sensor2keyego"].astype(jnp.float32),
                batch["curr2adjsensor"].astype(jnp.float32))
    hp = jax.lax.Precision.HIGHEST
    s2e = batch["sensor2ego"].astype(jnp.float32)     # (B, F, N, 4, 4)
    e2g = batch["ego2global"].astype(jnp.float32)
    keyego2global = jnp.broadcast_to(
        e2g[:, 0, 0][:, None, None], e2g.shape)       # (B, F, N, 4, 4)
    # inv(keyego2global) @ e2g, large translations cancelled first
    g2k_e2g = rigid_relative(keyego2global, e2g)
    s2k = jnp.einsum("bfnij,bfnjk->bfnik", g2k_e2g, s2e, precision=hp)
    # curr2adjsensor[f]: frame-f camera -> frame-(f+1) camera.
    # inv(e2g[f+1] s2e[f+1]) @ (e2g[f] s2e[f]) — the large global poses
    # meet only inside rigid_relative; everything else is O(metres).
    e2g_rel = rigid_relative(e2g[:, 1:], e2g[:, :-1])
    c2a = jnp.einsum("bfnij,bfnjk,bfnkl->bfnil",
                     rigid_inverse(s2e[:, 1:]), e2g_rel, s2e[:, :-1],
                     precision=hp)
    return s2k, c2a


def resolve_cv_method(cfg: ModelConfig, batch, backend: str = None) -> str:
    """Serving-setup guard for the Pallas cost-volume row window.

    Builds the geometry-only cv plan for every adjacent frame pair in
    ``batch`` (a frames-major temporal batch) and certifies that the
    compiled ``cfg.cv_win_rows`` row window holds every in-image tap
    (ops.cost_volume_pallas.validate_cv_plan).  Returns the method the
    serving entry points should run: 'pallas' when certified, otherwise
    'xla' (exact for any geometry) — instead of silently clipping taps on
    a rig with in-plane inter-frame rotation.  An explicit cfg.cv_method
    ('xla'/'pallas') always wins.
    """
    if cfg.cv_method != "auto":
        return cfg.cv_method
    if not cfg.stereo:
        return "xla"
    if (backend or jax.default_backend()) != "tpu":
        return "xla"
    from dhd_tpu.geometry import create_frustum
    from dhd_tpu.ops.cost_volume_pallas import (build_cv_plan,
                                                validate_cv_plan)
    vt = cfg.vt
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    _, c2a = prepare_stereo_inputs(batch)             # (B, F-1, N, 4, 4)
    frustum = create_frustum(vt.depth, vt.input_size, downsample=4,
                             sid=vt.sid)
    hs, ws = vt.input_size[0] // 4, vt.input_size[1] // 4
    b, fm1, n = c2a.shape[:3]

    def fold(x):  # fold the frame axis into batch: one plan build
        return x.reshape((b * fm1,) + x.shape[2:])

    intr = batch["intrins"].astype(jnp.float32)
    prot = batch["post_rots"].astype(jnp.float32)
    ptra = batch["post_trans"].astype(jnp.float32)
    plan = jax.jit(functools.partial(build_cv_plan, hs=hs, ws=ws,
                                     win_rows=cfg.cv_win_rows))(
        frustum, fold(c2a), fold(intr[:, :fm1]), fold(prot[:, :fm1]),
        fold(ptra[:, :fm1]))
    v = validate_cv_plan(plan)
    if not v["ok"]:
        import logging
        logging.getLogger(__name__).warning(
            "cost-volume: compiled win_rows=%d < required %d for this "
            "geometry — using the exact XLA path (raise cv_win_rows to "
            "re-enable the Pallas kernel)", cfg.cv_win_rows, v["wr_req"])
        return "xla"
    return "pallas"


class DHDStereoNet(nn.Module):
    """Temporal + stereo DHD (DHD-M/L)."""
    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    def _prepare_inputs(self, batch):
        return prepare_stereo_inputs(batch)

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False,
                 with_prev: bool = True,
                 cache: Optional[Dict[str, jnp.ndarray]] = None):
        """``with_prev=False`` reproduces the SequentialControlHook's early
        epochs (core/hook/sequentialcontrol.py + bevstereo4d.py:247-262):
        history frames are skipped, the key frame sees a zero cost volume,
        and the prev-BEV channels are zero-filled.

        ``cache`` switches to *streaming* inference (the TPU-native
        extract_img_feat_sequential + 'accelerate' serving mode,
        bevstereo4d.py:104-153): ``batch`` holds only the current frame
        (imgs (B, N, H, W, 3), sensor2ego/ego2global (B, N, 4, 4)) and the
        previous frame's stereo features + BEV/voxel grids come from the
        cache; returns (outputs, new_cache).  Pass ``cache={}`` for the
        first frame of a stream.
        """
        if cache is not None:
            return self._streaming(batch, cache, train)
        cfg = self.cfg
        vt = cfg.vt
        num_frames = cfg.num_frames                   # key + adj + extra ref
        b, f, n = batch["imgs"].shape[:3]
        assert f == num_frames, (f, num_frames)
        h_in, w_in = batch["imgs"].shape[3:5]
        bda = batch["bda"]

        s2k, c2a = self._prepare_inputs(batch)

        img_encoder = ImageEncoder(cfg, dtype=self.dtype, name="img_encoder")
        vt_mod = MGHSTransform(cfg, dtype=self.dtype, name="vt")
        pre2d = CustomResNet(num_channels=(vt.out_channels,),
                             num_layer=(1,), stride=(1,), dtype=self.dtype,
                             name="pre_process") if cfg.pre_process else None
        dz = vt.z_fine.size
        pre3d = CustomResNet(num_channels=(vt.out_channels * dz,),
                             num_layer=(1,), stride=(1,), dtype=self.dtype,
                             name="pre_process_3d") if cfg.pre_process else None

        cv_frustum = create_frustum(vt.depth, vt.input_size, downsample=4,
                                    sid=vt.sid)

        bev_list: List[Optional[jnp.ndarray]] = []
        vox_list: List[Optional[jnp.ndarray]] = []
        depth_key = height_key = None
        feat_prev_iv = None

        # frames newest-history first: fid = F-1 (extra ref) ... 0 (key)
        for fid in range(num_frames - 1, -1, -1):
            key_frame = fid == 0
            extra_ref = cfg.stereo and fid == num_frames - 1
            if not with_prev and not key_frame:
                continue
            imgs_f = batch["imgs"][:, fid].astype(self.dtype)
            imgs_flat = imgs_f.reshape(b * n, h_in, w_in, 3)

            if extra_ref:
                sfeat = img_encoder(imgs_flat, train, stage0_only=True)[0]
                feat_prev_iv = jax.lax.stop_gradient(sfeat)
                continue

            geom = {
                "sensor2keyego": s2k[:, fid],
                "mlp_sensor2keyego": s2k[:, 0],
                "intrins": batch["intrins"][:, fid],
                "post_rots": batch["post_rots"][:, fid],
                "post_trans": batch["post_trans"][:, fid],
                "bda": bda,
            }
            if cfg.align_after_view_transformation:
                geom["sensor2keyego"] = s2k[:, 0]

            x, sfeat = img_encoder(imgs_flat, train, stereo=cfg.stereo)
            fh, fw = x.shape[1:3]
            x = x.reshape(b, n, fh, fw, x.shape[-1])

            cost_volume = None
            if cfg.stereo:
                hs, ws = sfeat.shape[1:3]
                cs = sfeat.shape[-1]
                if feat_prev_iv is None:
                    # with_prev=False: zero cost volume
                    # (depthnet.py:396-403)
                    cost_volume = jnp.zeros((b * n, hs, ws, vt.D),
                                            self.dtype)
                else:
                    # DepthNet's cost_volumn_net consumes (B*N, Hs, Ws, D)
                    cv = stereo_cost_volume(
                        feat_prev_iv.reshape(b, n, hs, ws, cs),
                        sfeat.reshape(b, n, hs, ws, cs),
                        cv_frustum, c2a[:, fid],
                        batch["intrins"][:, fid],
                        batch["post_rots"][:, fid],
                        batch["post_trans"][:, fid],
                        bias=cfg.depthnet_cfg.bias,
                        method=cfg.cv_method,
                        win_rows=cfg.cv_win_rows, out_layout="hwd")
                    cost_volume = cv.astype(self.dtype)

            out = vt_mod(x, geom, train, cost_volume=cost_volume)
            bev, vox = out["bev"], out["vox"]

            if cfg.pre_process:
                bev = pre2d(bev, train)[0]
                vox = uncollapse_z(pre3d(collapse_z(vox), train)[0], dz)

            if key_frame:
                depth_key, height_key = out["depth"], out["height"]
            else:
                bev = jax.lax.stop_gradient(bev)
                vox = jax.lax.stop_gradient(vox)
                feat_prev_iv = jax.lax.stop_gradient(sfeat)

            bev_list.append(bev)
            vox_list.append(vox)

        if not with_prev:
            n_prev = num_frames - (1 if cfg.stereo else 0) - 1
            zeros_bev = jnp.zeros(
                bev_list[0].shape[:-1] + (bev_list[0].shape[-1] * n_prev,),
                bev_list[0].dtype)
            zeros_vox = jnp.zeros(
                vox_list[0].shape[:-1] + (vox_list[0].shape[-1] * n_prev,),
                vox_list[0].dtype)
            bev_list = [zeros_bev] + bev_list
            vox_list = [zeros_vox] + vox_list

        # loop appended newest-history-first then key: [prev..., key] —
        # same channel order as the reference concat (DHD_model.py:517-518).
        if cfg.align_after_view_transformation:
            dy_, dx_ = vt.y.size, vt.x.size
            for i in range(len(bev_list) - 1):
                src_fid = len(bev_list) - 1 - i    # frame id of bev_list[i]
                grid = shift_grid(dy_, dx_, s2k[:, 0, 0], s2k[:, src_fid, 0],
                                  bda, vt.x, vt.y)
                bev_list[i] = grid_sample_2d(bev_list[i], grid)
                v = vox_list[i]
                vz = collapse_z(v)
                vox_list[i] = uncollapse_z(grid_sample_2d(vz, grid), dz)

        bev_cat = jnp.concatenate(bev_list, axis=-1)       # (B, Dy, Dx, F'*C)
        vox_cat = jnp.concatenate(vox_list, axis=-1)       # (B, Dz, Dy, Dx, F'*C)

        occ5, occ_flat = self._fuse_and_predict(bev_cat, vox_cat, train)
        return {
            "occ_logits": occ5,
            "occ_logits_flat": occ_flat,
            "depth": depth_key,
            "height": height_key,
        }

    def _fuse_and_predict(self, bev_cat, vox_cat, train):
        """BEV encoder || slab UNets -> SFA -> occupancy head (shared by the
        batch and streaming paths; must run inside the compact scope)."""
        cfg = self.cfg
        vt = cfg.vt
        x_2d = BEVEncoder(cfg, dtype=self.dtype, name="bev_encoder")(
            bev_cat, train)
        s1, s2, _ = vt.slab_sizes                # vox_cat (B, Dy, Dx, Dz, C)
        slabs = [vox_cat[..., :s1, :], vox_cat[..., s1:s1 + s2, :],
                 vox_cat[..., s1 + s2:, :]]
        outs3d = []
        for i, slab in enumerate(slabs):
            y = UNet(n_classes=cfg.voxel_encoder_out[i], base=cfg.unet_base,
                     dtype=self.dtype,
                     name=f"voxel_encoder{i}")(collapse_z(slab), train)
            outs3d.append(y)
        x_3d = jnp.concatenate(outs3d, axis=-1)
        fused = SFA(out_channels=cfg.sfa_out_channels, dtype=self.dtype,
                    name="sfa")(jnp.concatenate([x_2d, x_3d], axis=-1), train)
        occ = OccHead(out_dim=cfg.head_out_dim, Dz=cfg.head_Dz,
                      num_classes=cfg.num_classes,
                      use_predicter=cfg.use_predicter, return_flat=True,
                      dtype=self.dtype, name="occ_head")(fused, train)
        occ = occ.astype(jnp.float32)        # packed (B, Dx, Dy, Dz*n_cls)
        b_, dx_, dy_ = occ.shape[:3]
        # classes-minor view + packed form (see models/dhd.py: the packed
        # form keeps the train loss off the 128-lane-padded (..., 18) tiles)
        return occ.reshape(b_, dx_, dy_, cfg.head_Dz, cfg.num_classes), occ

    def _streaming(self, batch, cache, train):
        """One streaming step: current frame only + cached previous state.

        cache keys (all optional on the first step):
          stereo_feat: (B*N, Hs, Ws, Cs) previous stereo features
          bev: (B, Dy, Dx, C); vox: (B, Dz, Dy, Dx, C) previous grids,
            pooled in the *previous* frame's ego coordinates
          cam2global: (B, N, 4, 4) previous frame camera->global
        """
        hp = jax.lax.Precision.HIGHEST
        cfg = self.cfg
        vt = cfg.vt
        dz = vt.z_fine.size
        b, n = batch["imgs"].shape[:2]
        h_in, w_in = batch["imgs"].shape[2:4]
        bda = batch["bda"]

        img_encoder = ImageEncoder(cfg, dtype=self.dtype, name="img_encoder")
        vt_mod = MGHSTransform(cfg, dtype=self.dtype, name="vt")
        pre2d = CustomResNet(num_channels=(vt.out_channels,),
                             num_layer=(1,), stride=(1,), dtype=self.dtype,
                             name="pre_process") if cfg.pre_process else None
        pre3d = CustomResNet(num_channels=(vt.out_channels * dz,),
                             num_layer=(1,), stride=(1,), dtype=self.dtype,
                             name="pre_process_3d") if cfg.pre_process else None

        s2e = batch["sensor2ego"].astype(jnp.float32)
        e2g = batch["ego2global"].astype(jnp.float32)
        # inv(keyego2global) @ e2g via the cancellation-free SE3 relative
        # (geometry/rigid.py) — fp64-equivalent accuracy in fp32
        g2k_e2g = rigid_relative(
            jnp.broadcast_to(e2g[:, :1], e2g.shape), e2g)
        s2k = jnp.einsum("bnij,bnjk->bnik", g2k_e2g, s2e, precision=hp)
        cam2global = jnp.einsum("bnij,bnjk->bnik", e2g, s2e,
                                precision=hp)

        imgs_flat = batch["imgs"].astype(self.dtype).reshape(
            b * n, h_in, w_in, 3)
        x, sfeat = img_encoder(imgs_flat, train, stereo=cfg.stereo)
        fh, fw = x.shape[1:3]
        x = x.reshape(b, n, fh, fw, x.shape[-1])

        cost_volume = None
        if cfg.stereo:
            hs, ws = sfeat.shape[1:3]
            cs = sfeat.shape[-1]
            prev_sf = cache.get("stereo_feat")
            if prev_sf is None:
                cost_volume = jnp.zeros((b * n, hs, ws, vt.D), self.dtype)
            else:
                k2s = rigid_relative(cache["cam2global"], cam2global)
                cv_frustum = create_frustum(vt.depth, vt.input_size,
                                            downsample=4, sid=vt.sid)
                # "cv_static" (build_stream_cv_static) is the rig-static
                # half of the warp plan — geometry-only, computed once per
                # camera rig like the pooling plan; the per-frame residual
                # is one composed projective pass (cv_plan_from_static)
                cv = stereo_cost_volume(
                    prev_sf.reshape(b, n, hs, ws, cs),
                    sfeat.reshape(b, n, hs, ws, cs),
                    cv_frustum, k2s, batch["intrins"],
                    batch["post_rots"], batch["post_trans"],
                    bias=cfg.depthnet_cfg.bias, method=cfg.cv_method,
                    win_rows=cfg.cv_win_rows,
                    static=batch.get("cv_static"), out_layout="hwd")
                cost_volume = cv.astype(self.dtype)

        geom = {
            "sensor2keyego": s2k,
            "intrins": batch["intrins"],
            "post_rots": batch["post_rots"],
            "post_trans": batch["post_trans"],
            "bda": bda,
        }
        if "pool_plan" in batch:
            # streaming serves a fixed camera rig: the pooling plan (sort
            # order + kernel visit tables) is geometry-only and reusable
            # across every frame, exactly like the single-frame serving
            # path (build_stream_pool_plan)
            geom["pool_plan"] = batch["pool_plan"]
        out = vt_mod(x, geom, train, cost_volume=cost_volume)
        bev, vox = out["bev"], out["vox"]
        if cfg.pre_process:
            bev = pre2d(bev, train)[0]
            vox = uncollapse_z(pre3d(collapse_z(vox), train)[0], dz)

        prev_bev = cache.get("bev")
        if prev_bev is None:
            prev_bev = jnp.zeros_like(bev)
            prev_vox = jnp.zeros_like(vox)
        else:
            # warp the cached grids from the previous ego frame into the
            # current one (shift_feature, bevdet4d.py:118-134)
            # inv(keyego2global) @ prev_cam2global, cancellation-free
            prev_s2k_front = rigid_relative(e2g[:, 0],
                                            cache["cam2global"][:, 0])
            grid = shift_grid(vt.y.size, vt.x.size, s2k[:, 0],
                              prev_s2k_front, bda, vt.x, vt.y)
            prev_bev = grid_sample_2d(cache["bev"], grid)
            prev_vox = uncollapse_z(
                grid_sample_2d(collapse_z(cache["vox"]), grid), dz)

        bev_cat = jnp.concatenate([prev_bev, bev], axis=-1)
        vox_cat = jnp.concatenate([prev_vox, vox], axis=-1)
        occ5, occ_flat = self._fuse_and_predict(bev_cat, vox_cat, train)
        new_cache = {
            "stereo_feat": sfeat,
            "bev": bev,
            "vox": vox,
            "cam2global": cam2global.astype(jnp.float32),
        }
        return ({"occ_logits": occ5, "occ_logits_flat": occ_flat,
                 "depth": out["depth"], "height": out["height"]}, new_cache)


def build_stream_pool_plan(cfg: ModelConfig, batch: Dict[str, jnp.ndarray]
                           ) -> dict:
    """Pooling plan for the streaming (single-frame) batch layout.

    Computes the same frame-relative sensor2keyego the streaming step uses
    internally, then defers to :func:`dhd_tpu.models.dhd.build_batch_pool_plan`.
    Geometry-only: one plan per camera rig, reused across every frame
    (the reference's 'accelerate' mode, benchmark.py:83-84).
    """
    from .dhd import build_batch_pool_plan

    hp = jax.lax.Precision.HIGHEST
    s2e = batch["sensor2ego"].astype(jnp.float32)
    e2g = batch["ego2global"].astype(jnp.float32)
    g2k_e2g = rigid_relative(jnp.broadcast_to(e2g[:, :1], e2g.shape), e2g)
    s2k = jnp.einsum("bnij,bnjk->bnik", g2k_e2g, s2e, precision=hp)
    b2 = dict(batch)
    b2["sensor2keyego"] = s2k
    return build_batch_pool_plan(cfg, b2)


def build_stream_cv_static(cfg: ModelConfig, batch: Dict[str, jnp.ndarray]
                           ) -> dict:
    """Rig-static half of the stereo warp plan for streaming serving.

    Geometry-only (frustum + intrinsics + image aug): one per camera rig,
    reused across every frame; ship it as ``batch['cv_static']`` alongside
    ``pool_plan``.  The per-frame residual (cv_plan_from_static) is one
    fused elementwise pass instead of the full reproject-grid pipeline.
    """
    from dhd_tpu.ops.cost_volume_pallas import build_cv_static

    vt = cfg.vt
    frustum = create_frustum(vt.depth, vt.input_size, downsample=4,
                             sid=vt.sid)
    hs, ws = vt.input_size[0] // 4, vt.input_size[1] // 4
    return build_cv_static(frustum, batch["intrins"].astype(jnp.float32),
                           batch["post_rots"].astype(jnp.float32),
                           batch["post_trans"].astype(jnp.float32),
                           hs, ws)
