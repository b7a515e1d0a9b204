"""DHD model assembly (single-frame DHD-S path).

Re-creates the reference detector stack ``DHD`` (detectors/DHD_model.py:11-241)
as one flax module whose apply() is the whole forward pass:

  image_encoder (ResNet50+FPN)  ->  depth-net (1x1) + HeightNet
  -> fused MGHS voxel pooling   ->  BEV encoder || 3 slab UNets
  -> SFA fusion                 ->  channel-to-height occupancy head

Everything is channels-last, static-shape, jit-friendly.  The temporal/stereo
variant (DHD-M/L) lives in models/dhd_stereo.py.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dhd_tpu.config import ModelConfig
from dhd_tpu.geometry import create_frustum, frustum_to_ego, get_mlp_input
from dhd_tpu.ops import compute_pool_indices, mghs_pool
from dhd_tpu.nn import (
    CustomFPN, CustomResNet, DepthNet, FPN_LSS, HeightNet, OccHead, ResNet50,
    SFA, TinyCNN, UNet,
)

Dtype = Any


def band_masks_from_height(height_prob: jnp.ndarray, vt) -> jnp.ndarray:
    """Per-pixel height-band gates from the height distribution.

    argmax bin -> height in meters (bin centers) -> one of the 3 bands
    [h_min, thr1), [thr1, thr2), [thr2, h_max)
    (lss_heightmap.py:528-564).  The top bin center equals h_max and is
    excluded from every band, as in the reference.

    Args:
      height_prob: (..., fH, fW, H) softmaxed height distribution.
    Returns:
      (..., fH, fW, 3) float mask.
    """
    centers = jnp.asarray(vt.height_bin_centers(), dtype=jnp.float32)
    hmap = centers[jnp.argmax(height_prob, axis=-1)]
    lo, t1, t2, hi = vt.mask_range
    m1 = (hmap >= lo) & (hmap < t1)
    m2 = (hmap >= t1) & (hmap < t2)
    m3 = (hmap >= t2) & (hmap < hi)
    return jnp.stack([m1, m2, m3], axis=-1).astype(height_prob.dtype)


def collapse_z(x: jnp.ndarray) -> jnp.ndarray:
    """(B, Dy, Dx, Dz, C) -> (B, Dy, Dx, Dz*C), z-major channel order.

    Matches torch.cat(x.unbind(dim=2), 1) on (B, C, Dz, Dy, Dx)
    (lss_heightmap.py:297-299).  With the z-minor voxel layout this is a
    free reshape — the reference (and our r1 z-major layout) paid a full
    transpose of the 164 MB voxel grid here.
    """
    b, dy, dx, dz, c = x.shape
    return x.reshape(b, dy, dx, dz * c)


class ImageEncoder(nn.Module):
    """Backbone + neck over the folded (B*N) camera batch
    (detectors/bevdet.py:21-44)."""
    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, imgs, train: bool = False, stereo: bool = False,
                 stage0_only: bool = False):
        cfg = self.cfg
        if cfg.backbone == "resnet50":
            feats = ResNet50(out_indices=cfg.backbone_out_indices,
                             remat=cfg.backbone_remat,
                             dtype=self.dtype, name="backbone")(
                imgs, train, stage0_only=stage0_only)
        elif cfg.backbone == "tiny_cnn":
            feats = TinyCNN(channels=(16, 32, 64, 128), emit_stereo=stereo,
                            dtype=self.dtype, name="backbone")(
                imgs, train, stage0_only=stage0_only)
        elif cfg.backbone == "swin_base":
            from dhd_tpu.nn.swin import SwinTransformer
            feats = SwinTransformer(
                embed_dims=cfg.swin_embed_dims,
                depths=cfg.swin_depths,
                num_heads=cfg.swin_num_heads,
                window_size=cfg.swin_window,
                return_stereo_feat=stereo,
                out_indices=cfg.backbone_out_indices
                if not stereo else (2, 3),
                remat=cfg.backbone_remat,
                attn_kernel=cfg.attn_method == "pallas" or (
                    cfg.attn_method == "auto"
                    and jax.default_backend() == "tpu"),
                ln_kernel=cfg.ln_method == "pallas" or (
                    cfg.ln_method == "auto"
                    and jax.default_backend() == "tpu"),
                dtype=self.dtype, name="backbone")(
                imgs, train, stage0_only=stage0_only)
        else:
            raise NotImplementedError(cfg.backbone)
        if stage0_only:
            return feats, feats
        stereo_feat = None
        if stereo:
            stereo_feat, feats = feats[0], feats[1:]
        if cfg.img_neck == "custom_fpn":
            x = CustomFPN(out_channels=cfg.img_neck_out_channels,
                          dtype=self.dtype, name="neck")(feats, train)
        elif cfg.img_neck == "fpn_lss":
            x = FPN_LSS(out_channels=cfg.img_neck_out_channels,
                        scale_factor=2, input_feature_index=(0, 1),
                        extra_upsample=None, dtype=self.dtype,
                        name="neck")(feats, train)
        else:
            raise NotImplementedError(cfg.img_neck)
        return x, stereo_feat


class MGHSTransform(nn.Module):
    """MGHS view transformer: depth/height heads + fused voxel pooling
    (lss_heightmap.py:13-490)."""
    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, geom, train: bool = False, cost_volume=None):
        """
        Args:
          feat: (B, N, fH, fW, C_in) image features.
          geom: dict with sensor2keyego/intrins/post_rots/post_trans/bda.
        Returns:
          dict with bev (B,Dy,Dx,C), vox (B,Dz,Dy,Dx,C),
          depth (B,N,fH,fW,D) and height (B,N,fH,fW,H) softmax distributions.
        """
        cfg = self.cfg
        vt = cfg.vt
        b, n, fh, fw, c_in = feat.shape
        x = feat.reshape(b * n, fh, fw, c_in)

        # the MLP embedding always uses the *key* frame's sensor2keyego
        # (DHD_model.py:422-424), which equals geom["sensor2keyego"] for
        # single-frame models.
        mlp_s2k = geom.get("mlp_sensor2keyego", geom["sensor2keyego"])
        mlp_input = get_mlp_input(
            mlp_s2k, geom["intrins"], geom["post_rots"],
            geom["post_trans"], geom["bda"]).reshape(b * n, 27)

        if cfg.depth_net == "conv1x1":
            # DHD-S: one 1x1 conv emits depth logits + context features
            # (lss_heightmap.py:62,482-485).
            xd = nn.Conv(vt.D + vt.out_channels, (1, 1), dtype=self.dtype,
                         name="depth_net")(x)
            depth_logit = xd[..., :vt.D]
            tran_feat = xd[..., vt.D:vt.D + vt.out_channels]
        else:
            xd = DepthNet(mid_channels=vt.in_channels,
                          context_channels=vt.out_channels,
                          depth_channels=vt.D,
                          cfg=cfg.depthnet_cfg, dtype=self.dtype,
                          name="depth_net")(x, mlp_input, cost_volume, train)
            depth_logit = xd[..., :vt.D]
            tran_feat = xd[..., vt.D:vt.D + vt.out_channels]

        height_logit = HeightNet(
            mid_channels=vt.in_channels,
            height_channels=vt.num_height_bins,
            cfg=cfg.heightnet_cfg, dtype=self.dtype,
            name="height_net")(x, mlp_input, None, train)

        depth = jax.nn.softmax(depth_logit.astype(jnp.float32), axis=-1)
        height = jax.nn.softmax(height_logit.astype(jnp.float32), axis=-1)

        band_mask = band_masks_from_height(height, vt)

        idx = None
        if geom.get("pool_plan") is None:
            coords = frustum_to_ego(
                create_frustum(vt.depth, vt.input_size, vt.downsample,
                               vt.sid),
                geom["sensor2keyego"], geom["intrins"], geom["post_rots"],
                geom["post_trans"], geom["bda"])
            idx = compute_pool_indices(coords, vt)

        feat_p = tran_feat.astype(self.dtype).reshape(
            b, n, fh, fw, vt.out_channels)
        method = cfg.pool_method
        if geom.get("pool_plan") is not None:
            method = "pallas"                 # a plan implies the kernel path
        elif method == "auto":
            method = ("pallas" if not train
                      and jax.default_backend() == "tpu" else "xla")
        if method.startswith("pallas"):
            # optional precomputed plan (the 'accelerate' serving mode):
            # geometry-only, reusable across frames of a fixed camera rig.
            # depth stays pixel-major — the kernel path gathers rows by
            # point id, no point-major transpose needed.
            from dhd_tpu.ops import mghs_pool_pallas
            bev, vox = mghs_pool_pallas(
                depth.astype(self.dtype).reshape(b, n, fh, fw, vt.D),
                feat_p, band_mask.reshape(b, n, fh, fw, 3), idx, vt,
                interpret=jax.default_backend() != "tpu",
                plan=geom.get("pool_plan"))
        else:
            # depth to point order (B, N, D, fH, fW) for the outer-product
            # segment-sum formulation
            depth_p = jnp.transpose(
                depth.reshape(b, n, fh, fw, vt.D), (0, 1, 4, 2, 3))
            bev, vox = mghs_pool(
                depth_p.astype(self.dtype), feat_p,
                band_mask.reshape(b, n, fh, fw, 3), idx, vt)
        return {
            "bev": bev, "vox": vox,
            "depth": depth.reshape(b, n, fh, fw, vt.D),
            "height": height.reshape(b, n, fh, fw, vt.num_height_bins),
        }


def build_batch_pool_plan(cfg: ModelConfig, batch: Dict[str, jnp.ndarray]
                          ) -> dict:
    """Precompute the voxel-pooling plan for a fixed-geometry batch.

    Serving equivalent of the reference's 'accelerate' mode
    (tools/analysis_tools/benchmark.py:83-84): geometry depends only on
    calibration + augmentation, so a fixed camera rig computes this once
    and passes it as ``batch["pool_plan"]`` for every frame.  Jit this and
    keep the result on device.
    """
    from dhd_tpu.ops import build_pool_plan

    vt = cfg.vt
    coords = frustum_to_ego(
        create_frustum(vt.depth, vt.input_size, vt.downsample, vt.sid),
        batch["sensor2keyego"], batch["intrins"], batch["post_rots"],
        batch["post_trans"], batch["bda"])
    idx = compute_pool_indices(coords, vt)
    b, n = batch["sensor2keyego"].shape[:2]
    fh, fw = vt.feat_size
    return build_pool_plan(idx, vt, (b, n, vt.D, fh, fw))


class BEVEncoder(nn.Module):
    """BEV encoder over the z-collapsed BEV map: CustomResNet + FPN_LSS
    (DHD-S.py:106-113) or a plain UNet + Identity (DHD-M)."""
    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        if cfg.bev_encoder == "unet":
            return UNet(n_classes=cfg.bev_unet_out, base=cfg.unet_base,
                        dtype=self.dtype, name="backbone")(x, train)
        feats = CustomResNet(num_channels=cfg.bev_encoder_channels,
                             dtype=self.dtype, name="backbone")(x, train)
        return FPN_LSS(out_channels=cfg.bev_neck_out_channels,
                       dtype=self.dtype, name="neck")(feats, train)


class DHDNet(nn.Module):
    """Single-frame DHD (DHD-S).  apply() -> occ logits + aux distributions."""
    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        """
        Args:
          batch: dict with
            imgs: (B, N, H, W, 3) normalized images
            sensor2keyego, ego2global: (B, N, 4, 4)
            intrins, post_rots: (B, N, 3, 3); post_trans: (B, N, 3)
            bda: (B, 3, 3)
        Returns:
          dict with occ_logits (B, Dx, Dy, Dz, n_cls), depth, height.
        """
        cfg = self.cfg
        b, n = batch["imgs"].shape[:2]
        imgs = batch["imgs"].astype(self.dtype)
        h_in, w_in = imgs.shape[2:4]
        x, _ = ImageEncoder(cfg, dtype=self.dtype, name="img_encoder")(
            imgs.reshape(b * n, h_in, w_in, 3), train)
        fh, fw = x.shape[1:3]
        x = x.reshape(b, n, fh, fw, x.shape[-1])

        geom = {k: batch[k] for k in
                ("sensor2keyego", "intrins", "post_rots", "post_trans", "bda")}
        if "pool_plan" in batch:
            geom["pool_plan"] = batch["pool_plan"]
        vt_out = MGHSTransform(cfg, dtype=self.dtype, name="vt")(
            x, geom, train)

        x_2d = BEVEncoder(cfg, dtype=self.dtype, name="bev_encoder")(
            vt_out["bev"], train)

        s1, s2, s3 = cfg.vt.slab_sizes
        vox = vt_out["vox"]                   # (B, Dy, Dx, Dz, C) z-minor
        slabs = [vox[..., :s1, :], vox[..., s1:s1 + s2, :],
                 vox[..., s1 + s2:, :]]
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
        occ = occ.astype(jnp.float32)         # packed (B, Dx, Dy, Dz*n_cls)
        b_, dx_, dy_ = occ.shape[:3]
        return {
            # classes-minor view for eval/serving consumers; the train loss
            # reads the packed form — the (..., Dz, 18) layout pads its
            # minor dim to the 128-lane tile in HBM (7.1x the bytes), and
            # the unused view is dead-code-eliminated from the train graph
            "occ_logits": occ.reshape(b_, dx_, dy_, cfg.head_Dz,
                                      cfg.num_classes),
            "occ_logits_flat": occ,
            "depth": vt_out["depth"],
            "height": vt_out["height"],
        }
