"""Activation-level parity: flax modules + checkpoint converter vs the pure
torch oracle (dhd_tpu/oracle/torch_ref.py), which mirrors the reference's
module topology and state_dict keys.

Every test: init the flax module, export its params through
io.convert.params_to_torch (the exact code path a real .pth round-trips
through), load into the oracle with strict=True (structural check), and diff
activations on random inputs to ~1e-4.  This is SURVEY §7 hard-part 3 — the
harness that makes released reference weights plug-and-score.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dhd_tpu.config import (DepthNetConfig, GridConfig, get_config)
from dhd_tpu.io import convert as C

pytestmark = pytest.mark.slow  # torch+jax full modules: minutes on CPU

torch.manual_seed(0)


class _Holder(torch.nn.Module):
    """Wrap an oracle module under a dotted attribute path so the exported
    reference-keyed state_dict loads with strict=True."""

    def __init__(self, path, mod):
        super().__init__()
        parts = path.split(".")
        node = self
        for p in parts[:-1]:
            sub = torch.nn.Module()
            node.add_module(p, sub)
            node = sub
        node.add_module(parts[-1], mod)
        self.mod = mod

    def load(self, sd):
        missing, unexpected = self.load_state_dict(
            {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
            strict=False)
        # strict on OUR side: everything exported must land somewhere, and
        # every oracle param must be covered (num_batches_tracked excepted)
        missing = [m for m in missing if "num_batches_tracked" not in m
                   and "mod." not in m]
        assert not unexpected, f"unexpected keys: {unexpected[:8]}"
        assert not missing, f"missing keys: {missing[:8]}"


def _diff(a, b, tol=2e-4):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    scale = max(1e-3, float(np.abs(b).max()))
    err = np.abs(a - b).max() / scale
    assert err < tol, f"max rel-to-peak err {err:.2e} (tol {tol})"


def test_heightnet_parity():
    """HeightNet with ASPP + DCN (the DHD-S configuration) — covers
    BasicBlock, ASPP, the deformable conv, SE gate, Mlp and BatchNorm1d."""
    from dhd_tpu.nn import HeightNet
    from dhd_tpu.oracle import TorchHeightNet

    cin, mid, bins = 32, 32, 65
    cfg = DepthNetConfig()                          # use_aspp + use_dcn
    fl = HeightNet(mid_channels=mid, height_channels=bins, cfg=cfg)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 8, 12, cin)).astype(np.float32)
    mlp = rng.normal(0, 1, (2, 27)).astype(np.float32)
    variables = fl.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(mlp))
    out_fl = fl.apply(variables, jnp.asarray(x), jnp.asarray(mlp))

    # rebuild the variables under the full-model path the rules expect
    wrapped = {
        "params": {"vt": {"height_net": variables["params"]}},
        "batch_stats": {"vt": {"height_net": variables["batch_stats"]}},
    }
    rules = C._heightnet("img_view_transformer.height_net",
                         ("vt", "height_net"), cfg)
    sd = C.params_to_torch(wrapped, None, rules=rules)
    oracle = TorchHeightNet(cin, mid, bins)
    h = _Holder("img_view_transformer.height_net", oracle).eval()
    h.load(sd)
    # DCN offsets are zero-init in both, so exercise nonzero offsets by
    # perturbing them identically
    with torch.no_grad():
        off_w = rng.normal(0, 0.1, (18, mid, 3, 3)).astype(np.float32)
        oracle.depth_conv[4].conv_offset.weight.copy_(
            torch.from_numpy(off_w))
    p = dict(variables["params"])
    dcn = p["depth_conv"]["dcn"]["conv_offset"]
    dcn["kernel"] = jnp.asarray(off_w.transpose(2, 3, 1, 0))
    out_fl = fl.apply(variables, jnp.asarray(x), jnp.asarray(mlp))

    out_t = oracle(torch.from_numpy(np.moveaxis(x, -1, 1)),
                   torch.from_numpy(mlp))
    _diff(out_fl, np.moveaxis(out_t.detach().numpy(), 1, -1))


def test_unet_parity():
    from dhd_tpu.nn import UNet
    from dhd_tpu.oracle import TorchUNet

    fl = UNet(n_classes=24, base=16)
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (1, 32, 48, 20)).astype(np.float32)
    variables = fl.init(jax.random.PRNGKey(1), jnp.asarray(x))
    out_fl = fl.apply(variables, jnp.asarray(x))
    wrapped = {"params": {"voxel_encoder0": variables["params"]},
               "batch_stats": {"voxel_encoder0": variables["batch_stats"]}}
    sd = C.params_to_torch(wrapped, None,
                           rules=C._unet("img_voxel_encoder0",
                                         ("voxel_encoder0",)))
    oracle = TorchUNet(20, 24, base=16)
    h = _Holder("img_voxel_encoder0", oracle).eval()
    h.load(sd)
    out_t = oracle(torch.from_numpy(np.moveaxis(x, -1, 1)))
    _diff(out_fl, np.moveaxis(out_t.detach().numpy(), 1, -1))


def test_sfa_parity():
    from dhd_tpu.nn import SFA
    from dhd_tpu.oracle import TorchSFA

    fl = SFA(out_channels=24)
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (2, 10, 14, 64)).astype(np.float32)
    variables = fl.init(jax.random.PRNGKey(2), jnp.asarray(x))
    out_fl = fl.apply(variables, jnp.asarray(x))
    wrapped = {"params": {"sfa": variables["params"]},
               "batch_stats": {"sfa": variables["batch_stats"]}}
    sd = C.params_to_torch(wrapped, None, rules=C._sfa("mix", ("sfa",)))
    oracle = TorchSFA(64, 24)
    h = _Holder("mix", oracle).eval()
    h.load(sd)
    out_t = oracle(torch.from_numpy(np.moveaxis(x, -1, 1)))
    _diff(out_fl, np.moveaxis(out_t.detach().numpy(), 1, -1))


def test_occ_head_parity():
    from dhd_tpu.nn import OccHead
    from dhd_tpu.oracle import TorchOccHead

    fl = OccHead(out_dim=32, Dz=4, num_classes=5)
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (2, 6, 8, 16)).astype(np.float32)
    variables = fl.init(jax.random.PRNGKey(3), jnp.asarray(x))
    out_fl = fl.apply(variables, jnp.asarray(x))
    wrapped = {"params": {"occ_head": variables["params"]},
               "batch_stats": {}}
    sd = C.params_to_torch(wrapped, None,
                           rules=C._occ_head("occ_head", ("occ_head",), True))
    oracle = TorchOccHead(16, 32, 4, 5, True)
    h = _Holder("occ_head", oracle).eval()
    h.load(sd)
    out_t = oracle(torch.from_numpy(np.moveaxis(x, -1, 1)))
    _diff(out_fl, out_t.detach().numpy())


def test_image_encoder_parity():
    """ResNet-50 + CustomFPN at DHD-S channels, reduced spatial size."""
    from dhd_tpu.nn import CustomFPN, ResNet50
    from dhd_tpu.oracle import TorchCustomFPN, TorchResNet50

    rng = np.random.default_rng(4)
    x = rng.normal(0, 1, (2, 64, 96, 3)).astype(np.float32)
    bb = ResNet50(out_indices=(2, 3))
    vb = bb.init(jax.random.PRNGKey(4), jnp.asarray(x))
    feats_fl = bb.apply(vb, jnp.asarray(x))
    neck = CustomFPN(out_channels=256)
    vn = neck.init(jax.random.PRNGKey(5), feats_fl)
    out_fl = neck.apply(vn, feats_fl)

    wrapped = {
        "params": {"img_encoder": {"backbone": vb["params"],
                                   "neck": vn["params"]}},
        "batch_stats": {"img_encoder": {"backbone": vb["batch_stats"]}},
    }
    rules = (C._resnet50("img_backbone", ("img_encoder", "backbone"))
             + C._custom_fpn("img_neck", ("img_encoder", "neck"), 2))
    sd = C.params_to_torch(wrapped, None, rules=rules)

    t_bb = TorchResNet50((2, 3))
    t_neck = TorchCustomFPN((1024, 2048), 256)
    holder = torch.nn.Module()
    holder.img_backbone = t_bb
    holder.img_neck = t_neck
    holder.eval()
    missing, unexpected = holder.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        strict=False)
    assert not unexpected
    assert all("num_batches_tracked" in m for m in missing), missing
    with torch.no_grad():
        out_t = t_neck(t_bb(torch.from_numpy(np.moveaxis(x, -1, 1))))
    _diff(out_fl, np.moveaxis(out_t.detach().numpy(), 1, -1))


def test_swin_parity():
    """Swin backbone (small instance, real numerics): patch embed, W-MSA +
    SW-MSA with relative-position bias and the shift mask, unfold
    PatchMerging, per-out-index LN heads, and the stereo stage-0 output —
    through the converter rules (proves the Swin-B rule table on numbers,
    not just key shapes)."""
    from dhd_tpu.nn.swin import SwinTransformer
    from dhd_tpu.oracle import TorchSwin

    depths, heads, embed, ws, out_idx = (2, 2), (2, 4), 16, 4, (0, 1)
    fl = SwinTransformer(embed_dims=embed, depths=depths, num_heads=heads,
                         window_size=ws, out_indices=out_idx,
                         drop_path_rate=0.0, return_stereo_feat=True)
    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, (2, 32, 48, 3)).astype(np.float32)
    variables = fl.init(jax.random.PRNGKey(8), jnp.asarray(x))
    outs_fl = fl.apply(variables, jnp.asarray(x))

    wrapped = {"params": {"img_encoder": {"backbone": variables["params"]}},
               "batch_stats": {}}
    rules = C._swin("img_backbone", ("img_encoder", "backbone"),
                    depths=depths, out_indices=out_idx)
    sd = C.params_to_torch(wrapped, None, rules=rules)
    oracle = TorchSwin(embed_dims=embed, depths=depths, num_heads=heads,
                       window_size=ws, out_indices=out_idx,
                       return_stereo_feat=True)
    h = _Holder("img_backbone", oracle).eval()
    h.load(sd)
    with torch.no_grad():
        outs_t = oracle(torch.from_numpy(np.moveaxis(x, -1, 1)))
    assert len(outs_fl) == len(outs_t) == 1 + len(out_idx)
    for a, b in zip(outs_fl, outs_t):
        _diff(a, np.moveaxis(b.detach().numpy(), 1, -1))

    # stage0_only (extract_stereo_ref_feat path, bevstereo4d.py:20-54)
    s0_fl = fl.apply(variables, jnp.asarray(x), stage0_only=True)
    with torch.no_grad():
        s0_t = oracle(torch.from_numpy(np.moveaxis(x, -1, 1)),
                      stage0_only=True)
    _diff(s0_fl, np.moveaxis(s0_t.detach().numpy(), 1, -1))


def test_depthnet_stereo_parity():
    """Full DepthNet with the stereo branch: gen_grid + calculate_cost_volumn
    + cost_volumn_net + context/depth SE trunks, flax (ops/cost_volume.py +
    nn/depthnet.py) vs the torch oracle on the same geometry
    (depthnet.py:172-415)."""
    from dhd_tpu.geometry import create_frustum
    from dhd_tpu.nn import DepthNet
    from dhd_tpu.ops.cost_volume import stereo_cost_volume
    from dhd_tpu.oracle import TorchDepthNet

    b, n, cin, mid, ctx, d_bins, cs = 1, 2, 32, 32, 24, 16, 8
    h_img, w_img = 64, 96
    fh, fw = h_img // 16, w_img // 16            # 4 x 6
    hs, ws_ = h_img // 4, w_img // 4             # 16 x 24
    dcfg = DepthNetConfig(stereo=True, use_dcn=False, aspp_mid_channels=16,
                          bias=5.0)
    depth_grid = GridConfig(1.0, 9.0, 0.5)
    assert depth_grid.size == d_bins

    rng = np.random.default_rng(6)
    x = rng.normal(0, 1, (b * n, fh, fw, cin)).astype(np.float32)
    mlp = rng.normal(0, 1, (b * n, 27)).astype(np.float32)
    prev = rng.normal(0, 1, (b, n, hs, ws_, cs)).astype(np.float32)
    curr = rng.normal(0, 1, (b, n, hs, ws_, cs)).astype(np.float32)
    intr = np.zeros((b, n, 3, 3), np.float32)
    intr[..., 0, 0] = intr[..., 1, 1] = 80.0
    intr[..., 0, 2] = w_img / 2.0
    intr[..., 1, 2] = h_img / 2.0
    intr[..., 2, 2] = 1.0
    post_rots = np.broadcast_to(np.eye(3, dtype=np.float32),
                                (b, n, 3, 3)).copy()
    post_trans = np.zeros((b, n, 3), np.float32)
    k2s = np.broadcast_to(np.eye(4, dtype=np.float32), (b, n, 4, 4)).copy()
    k2s[..., 0, 3] = 0.4                          # small lateral baseline
    k2s[..., 2, 3] = -0.8

    frustum = create_frustum(depth_grid, (h_img, w_img), downsample=4)
    cv = stereo_cost_volume(jnp.asarray(prev), jnp.asarray(curr),
                            frustum, jnp.asarray(k2s), jnp.asarray(intr),
                            jnp.asarray(post_rots), jnp.asarray(post_trans),
                            bias=dcfg.bias)
    cost_volume = jnp.transpose(
        jnp.reshape(cv, (b * n, d_bins, hs, ws_)), (0, 2, 3, 1))

    fl = DepthNet(mid_channels=mid, context_channels=ctx,
                  depth_channels=d_bins, cfg=dcfg)
    variables = fl.init(jax.random.PRNGKey(9), jnp.asarray(x),
                        jnp.asarray(mlp), cost_volume)
    out_fl = fl.apply(variables, jnp.asarray(x), jnp.asarray(mlp),
                      cost_volume)

    wrapped = {
        "params": {"vt": {"depth_net": variables["params"]}},
        "batch_stats": {"vt": {"depth_net": variables["batch_stats"]}},
    }
    rules = C._depthnet_full("img_view_transformer.depth_net",
                             ("vt", "depth_net"), dcfg)
    sd = C.params_to_torch(wrapped, None, rules=rules)
    oracle = TorchDepthNet(cin, mid, ctx, d_bins, use_aspp=dcfg.use_aspp,
                           use_dcn=dcfg.use_dcn,
                           aspp_mid=dcfg.aspp_mid_channels, stereo=True,
                           bias=dcfg.bias)
    h = _Holder("img_view_transformer.depth_net", oracle).eval()
    h.load(sd)
    metas = dict(
        k2s_sensor=torch.from_numpy(k2s), intrins=torch.from_numpy(intr),
        post_rots=torch.from_numpy(post_rots),
        post_trans=torch.from_numpy(post_trans),
        frustum=torch.from_numpy(np.asarray(frustum, np.float32)),
        cv_downsample=4, downsample=16,
        cv_feat_list=[
            torch.from_numpy(np.moveaxis(prev.reshape(b * n, hs, ws_, cs),
                                         -1, 1)).contiguous(),
            torch.from_numpy(np.moveaxis(curr.reshape(b * n, hs, ws_, cs),
                                         -1, 1)).contiguous()])
    with torch.no_grad():
        out_t = oracle(torch.from_numpy(np.moveaxis(x, -1, 1)),
                       torch.from_numpy(mlp), metas)
    _diff(out_fl, np.moveaxis(out_t.detach().numpy(), 1, -1), tol=5e-4)


def _parity_cfg():
    """dhd_s channel configuration at reduced spatial/grid sizes (the
    converter rules only depend on channels)."""
    base = get_config("dhd_s")
    vt = dataclasses.replace(
        base.vt,
        input_size=(64, 192),               # exact /32 so FPN scales are 2x
        x=GridConfig(-12.8, 12.8, 0.4),     # 64x64 BEV grid
        y=GridConfig(-12.8, 12.8, 0.4),
    )
    return dataclasses.replace(base, vt=vt, pool_method="xla",
                               backbone_remat=False)


def _parity_cfg_stereo():
    """dhd_m channel configuration (R50 out (0,2,3), stereo DepthNet, UNet
    BEV encoder, pre-process nets) at reduced spatial/grid/depth sizes and
    2 cameras."""
    base = get_config("dhd_m")
    vt = dataclasses.replace(
        base.vt,
        input_size=(64, 192),
        depth=GridConfig(1.0, 9.0, 0.5),        # D=16 0.5 m bins
        gt_depth=GridConfig(1.0, 9.0, 0.5),
        x=GridConfig(-12.8, 12.8, 0.4),
        y=GridConfig(-12.8, 12.8, 0.4),
    )
    return dataclasses.replace(base, vt=vt, num_cams=2, pool_method="xla",
                               backbone_remat=False)


def test_full_dhd_stereo_parity():
    """The assembled DHD_stereo forward (backwards frame loop, extra stereo
    ref frame, cost volume, pre-process nets, frame concat, slab UNets) —
    flax + the full DHD-M converter rule table vs the torch oracle."""
    from dhd_tpu.data import synthetic_batch
    from dhd_tpu.models import build_model
    from dhd_tpu.oracle import TorchDHDStereo

    cfg = _parity_cfg_stereo()
    model = build_model(cfg)
    batch_np = synthetic_batch(cfg, batch_size=1, seed=11, with_gt=False)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(11), batch,
                                           train=False))()
    out_fl = jax.jit(lambda v, b: model.apply(v, b, train=False)
                     ["occ_logits"])(variables, batch)

    sd = C.params_to_torch(variables, cfg)
    oracle = TorchDHDStereo(cfg).eval()
    missing, unexpected = oracle.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        strict=False)
    assert not unexpected, unexpected[:8]
    real_missing = [m for m in missing
                    if "num_batches_tracked" not in m
                    and "relative_position_index" not in m]
    assert not real_missing, real_missing[:8]

    out_t = oracle(batch_np)
    _diff(out_fl, out_t, tol=1e-3)


def test_full_dhd_s_parity():
    """The assembled DHD-S forward: flax (+ all converter rules) vs the
    torch oracle, at real channel widths and reduced resolution."""
    from dhd_tpu.data import synthetic_batch
    from dhd_tpu.models import DHDNet
    from dhd_tpu.oracle import TorchDHDS

    cfg = _parity_cfg()
    model = DHDNet(cfg)
    batch_np = synthetic_batch(cfg, batch_size=1, seed=7, with_gt=False)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(7), batch,
                                           train=False))()
    out_fl = jax.jit(lambda v, b: model.apply(v, b, train=False)
                     ["occ_logits"])(variables, batch)

    sd = C.params_to_torch(variables, cfg)
    oracle = TorchDHDS(cfg).eval()
    missing, unexpected = oracle.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        strict=False)
    assert not unexpected, unexpected[:8]
    real_missing = [m for m in missing if "num_batches_tracked" not in m]
    assert not real_missing, real_missing[:8]

    out_t = oracle(batch_np)
    _diff(out_fl, out_t, tol=5e-4)
