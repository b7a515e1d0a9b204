"""torch <-> flax checkpoint conversion for the released DHD weights.

The reference's state_dict key space (SURVEY.md §5: ``img_backbone.*,
img_neck.*, img_view_transformer.{depth_net,height_net}.*,
img_bev_encoder_{backbone,neck}.*, img_voxel_encoder{0,1,2}.*, mix.*,
occ_head.*``) is mapped onto our flax param tree by an explicit rule table.
Weight layout transforms:

* conv:       torch (O, I, kh, kw)      -> flax (kh, kw, I, O)
* conv-T:     torch (I, O, kh, kw)      -> flax (kh, kw, I, O) (+spatial flip)
* dense:      torch (O, I)              -> flax (I, O)
* 1x1 conv as dense (SE layers): torch (O, I, 1, 1) -> flax (I, O)
* BN:         weight/bias -> params.scale/bias; running_* -> batch_stats
* DCN weight: torch (G*Og, Cg, 3, 3)    -> ours (9, Cg, G, Og)

No released .pth ships in this environment (ckpts/ holds download stubs), so
correctness is established by an exact round-trip test
(tests/test_convert.py) over randomly initialized models.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from dhd_tpu.config import ModelConfig, DepthNetConfig

# rule kinds
CONV = "conv"
CONVT = "convT"
DENSE = "dense"
CONV1x1_DENSE = "conv1x1_dense"
BN = "bn"
LN = "ln"           # LayerNorm: weight->scale, bias->bias (no stats)
TABLE = "table"     # bare parameter copied verbatim (rel-pos bias table)
DCN = "dcn"
RAW = "raw"

Rule = Tuple[str, Tuple[str, ...], str]      # (torch prefix, flax path, kind)


def _bottleneck(tp: str, fp: Tuple[str, ...], downsample: bool) -> List[Rule]:
    rules = [
        (f"{tp}.conv1", fp + ("conv1",), CONV),
        (f"{tp}.bn1", fp + ("bn1",), BN),
        (f"{tp}.conv2", fp + ("conv2",), CONV),
        (f"{tp}.bn2", fp + ("bn2",), BN),
        (f"{tp}.conv3", fp + ("conv3",), CONV),
        (f"{tp}.bn3", fp + ("bn3",), BN),
    ]
    if downsample:
        rules += [
            (f"{tp}.downsample.0", fp + ("downsample_conv",), CONV),
            (f"{tp}.downsample.1", fp + ("downsample_bn",), BN),
        ]
    return rules


def _basicblock(tp: str, fp: Tuple[str, ...], downsample: bool) -> List[Rule]:
    rules = [
        (f"{tp}.conv1", fp + ("conv1",), CONV),
        (f"{tp}.bn1", fp + ("bn1",), BN),
        (f"{tp}.conv2", fp + ("conv2",), CONV),
        (f"{tp}.bn2", fp + ("bn2",), BN),
    ]
    if downsample:
        # CustomResNet downsample is a bare conv (resnet.py:47-48); the
        # stereo DepthNet's is a 1x1 conv (depthnet.py:204-206).
        rules.append((f"{tp}.downsample", fp + ("downsample",), CONV))
    return rules


def _resnet50(tp: str, fp: Tuple[str, ...]) -> List[Rule]:
    rules = [
        (f"{tp}.conv1", fp + ("stem_conv",), CONV),
        (f"{tp}.bn1", fp + ("stem_bn",), BN),
    ]
    for stage, n in enumerate((3, 4, 6, 3)):
        for b in range(n):
            rules += _bottleneck(
                f"{tp}.layer{stage + 1}.{b}",
                fp + (f"layer{stage + 1}_{b}",), downsample=(b == 0))
    return rules


def _custom_fpn(tp: str, fp: Tuple[str, ...], n_levels: int) -> List[Rule]:
    rules = []
    for i in range(n_levels):
        rules.append((f"{tp}.lateral_convs.{i}.conv",
                      fp + (f"lateral{i}",), CONV))
    rules.append((f"{tp}.fpn_convs.0.conv", fp + ("fpn_conv0",), CONV))
    return rules


def _fpn_lss(tp: str, fp: Tuple[str, ...], extra_upsample: bool) -> List[Rule]:
    rules = [
        (f"{tp}.conv.0", fp + ("conv_0",), CONV),
        (f"{tp}.conv.1", fp + ("conv_1",), BN),
        (f"{tp}.conv.3", fp + ("conv_3",), CONV),
        (f"{tp}.conv.4", fp + ("conv_4",), BN),
    ]
    if extra_upsample:
        rules += [
            (f"{tp}.up2.1", fp + ("up2_1",), CONV),
            (f"{tp}.up2.2", fp + ("up2_2",), BN),
            (f"{tp}.up2.4", fp + ("up2_4",), CONV),
        ]
    return rules


def _aspp(tp: str, fp: Tuple[str, ...]) -> List[Rule]:
    rules = []
    for i in range(1, 5):
        rules += [
            (f"{tp}.aspp{i}.atrous_conv", fp + (f"aspp{i}", "conv"), CONV),
            (f"{tp}.aspp{i}.bn", fp + (f"aspp{i}", "bn"), BN),
        ]
    rules += [
        (f"{tp}.global_avg_pool.1", fp + ("gap", "conv"), CONV),
        (f"{tp}.global_avg_pool.2", fp + ("gap", "bn"), BN),
        (f"{tp}.conv1", fp + ("conv1",), CONV),
        (f"{tp}.bn1", fp + ("bn1",), BN),
    ]
    return rules


def _distribution_net(tp: str, fp: Tuple[str, ...],
                      cfg: DepthNetConfig) -> List[Rule]:
    """The depth_conv Sequential of DepthNet/HeightNet: indices shift with
    the stereo/aspp/dcn flags (depthnet.py:216-244)."""
    rules = []
    idx = 0
    if cfg.stereo:
        for i in range(2):
            rules += [
                (f"{tp}.cost_volumn_net.{2 * i}",
                 fp + (f"cv_conv{i}",), CONV),
                (f"{tp}.cost_volumn_net.{2 * i + 1}",
                 fp + (f"cv_bn{i}",), BN),
            ]
    rules += _basicblock(f"{tp}.depth_conv.{idx}", fp + ("block0",),
                         downsample=cfg.stereo)
    rules += _basicblock(f"{tp}.depth_conv.{idx + 1}", fp + ("block1",),
                         False)
    rules += _basicblock(f"{tp}.depth_conv.{idx + 2}", fp + ("block2",),
                         False)
    idx += 3
    if cfg.use_aspp:
        rules += _aspp(f"{tp}.depth_conv.{idx}", fp + ("aspp",))
        idx += 1
    if cfg.use_dcn:
        rules += [
            (f"{tp}.depth_conv.{idx}.conv_offset",
             fp + ("dcn", "conv_offset"), CONV),
            (f"{tp}.depth_conv.{idx}", fp + ("dcn",), DCN),
        ]
        idx += 1
    rules.append((f"{tp}.depth_conv.{idx}", fp + ("out_conv",), CONV))
    return rules


def _heightnet(tp: str, fp: Tuple[str, ...], cfg: DepthNetConfig
               ) -> List[Rule]:
    rules = [
        (f"{tp}.reduce_conv.0", fp + ("reduce_conv",), CONV),
        (f"{tp}.reduce_conv.1", fp + ("reduce_bn",), BN),
        (f"{tp}.bn", fp + ("mlp_bn",), BN),
        (f"{tp}.depth_mlp.fc1", fp + ("depth_mlp", "fc1"), DENSE),
        (f"{tp}.depth_mlp.fc2", fp + ("depth_mlp", "fc2"), DENSE),
        (f"{tp}.depth_se.conv_reduce",
         fp + ("depth_se", "conv_reduce"), CONV1x1_DENSE),
        (f"{tp}.depth_se.conv_expand",
         fp + ("depth_se", "conv_expand"), CONV1x1_DENSE),
    ]
    rules += _distribution_net(tp, fp + ("depth_conv",), cfg)
    return rules


def _depthnet_full(tp: str, fp: Tuple[str, ...], cfg: DepthNetConfig
                   ) -> List[Rule]:
    rules = _heightnet(tp, fp, cfg)
    rules += [
        (f"{tp}.context_conv", fp + ("context_conv",), CONV),
        (f"{tp}.context_mlp.fc1", fp + ("context_mlp", "fc1"), DENSE),
        (f"{tp}.context_mlp.fc2", fp + ("context_mlp", "fc2"), DENSE),
        (f"{tp}.context_se.conv_reduce",
         fp + ("context_se", "conv_reduce"), CONV1x1_DENSE),
        (f"{tp}.context_se.conv_expand",
         fp + ("context_se", "conv_expand"), CONV1x1_DENSE),
    ]
    return rules


def _custom_resnet(tp: str, fp: Tuple[str, ...], num_layer) -> List[Rule]:
    rules = []
    for i, n in enumerate(num_layer):
        for j in range(n):
            rules += _basicblock(f"{tp}.layers.{i}.{j}",
                                 fp + (f"stage{i}_{j}",),
                                 downsample=(j == 0))
    return rules


def _double_conv(tp: str, fp: Tuple[str, ...]) -> List[Rule]:
    return [
        (f"{tp}.0", fp + ("conv0",), CONV),
        (f"{tp}.1", fp + ("bn0",), BN),
        (f"{tp}.3", fp + ("conv1",), CONV),
        (f"{tp}.4", fp + ("bn1",), BN),
    ]


def _unet(tp: str, fp: Tuple[str, ...]) -> List[Rule]:
    rules = _double_conv(f"{tp}.inc.double_conv", fp + ("inc",))
    for j in range(1, 5):
        rules += _double_conv(f"{tp}.down{j}.maxpool_conv.1.double_conv",
                              fp + (f"down{j}",))
    for j in range(1, 5):
        rules.append((f"{tp}.up{j}.up", fp + (f"up{j}", "up"), CONVT))
        rules += _double_conv(f"{tp}.up{j}.conv.double_conv",
                              fp + (f"up{j}", "conv"))
    rules.append((f"{tp}.outc.conv", fp + ("outc",), CONV))
    return rules


def _sfa(tp: str, fp: Tuple[str, ...]) -> List[Rule]:
    return [
        (f"{tp}.mysk_7.fc.0", fp + ("stage", "fc0"), DENSE),
        (f"{tp}.mysk_7.fc.2", fp + ("stage", "fc1"), DENSE),
        (f"{tp}.mysk_7.spacial_leanring.0", fp + ("stage", "sp0"), CONV),
        (f"{tp}.mysk_7.spacial_leanring.1", fp + ("stage", "sp_bn0"), BN),
        (f"{tp}.mysk_7.spacial_leanring.3", fp + ("stage", "sp1"), CONV),
        (f"{tp}.mysk_7.spacial_leanring.4", fp + ("stage", "sp_bn1"), BN),
        (f"{tp}.mix_residual.0", fp + ("res0",), CONV),
        (f"{tp}.mix_residual.1", fp + ("res_bn0",), BN),
        (f"{tp}.mix_residual.3", fp + ("res1",), CONV),
        (f"{tp}.mix_residual.4", fp + ("res_bn1",), BN),
        (f"{tp}.mix_shortcut.0", fp + ("shortcut",), CONV),
        (f"{tp}.mix_shortcut.1", fp + ("sc_bn",), BN),
    ]


def _occ_head(tp: str, fp: Tuple[str, ...], use_predicter: bool
              ) -> List[Rule]:
    rules = [(f"{tp}.final_conv.conv", fp + ("final_conv",), CONV)]
    if use_predicter:
        rules += [
            (f"{tp}.predicter.0", fp + ("fc0",), DENSE),
            (f"{tp}.predicter.2", fp + ("fc1",), DENSE),
        ]
    return rules


def _swin(tp: str, fp: Tuple[str, ...],
          depths=(2, 2, 18, 2), out_indices=(2, 3)) -> List[Rule]:
    """Swin-B (models/backbones/swin.py:680-976; mmcv naming:
    stages.i.blocks.j.{norm1,attn.w_msa.*,norm2,ffn.layers.{0.0,1}},
    stages.i.downsample.{norm,reduction}, norm{i} out heads)."""
    rules = [
        (f"{tp}.patch_embed.projection", fp + ("patch_embed",), CONV),
        (f"{tp}.patch_embed.norm", fp + ("patch_norm",), LN),
    ]
    for i, depth in enumerate(depths):
        for j in range(depth):
            bp = f"{tp}.stages.{i}.blocks.{j}"
            fbp = fp + (f"stage{i}_block{j}",)
            rules += [
                (f"{bp}.norm1", fbp + ("norm1",), LN),
                (f"{bp}.attn.w_msa.relative_position_bias_table",
                 fbp + ("attn", "relative_position_bias_table"), TABLE),
                (f"{bp}.attn.w_msa.qkv", fbp + ("attn", "qkv"), DENSE),
                (f"{bp}.attn.w_msa.proj", fbp + ("attn", "proj"), DENSE),
                (f"{bp}.norm2", fbp + ("norm2",), LN),
                (f"{bp}.ffn.layers.0.0", fbp + ("fc1",), DENSE),
                (f"{bp}.ffn.layers.1", fbp + ("fc2",), DENSE),
            ]
        if i < len(depths) - 1:
            rules += [
                (f"{tp}.stages.{i}.downsample.norm",
                 fp + (f"downsample{i}", "norm"), LN),
                (f"{tp}.stages.{i}.downsample.reduction",
                 fp + (f"downsample{i}", "reduction"), DENSE),
            ]
        if i in out_indices:
            rules.append((f"{tp}.norm{i}", fp + (f"norm{i}",), LN))
    return rules


def build_rules(cfg: ModelConfig) -> List[Rule]:
    """Full rule table for a model preset."""
    rules: List[Rule] = []
    if cfg.backbone == "resnet50":
        rules += _resnet50("img_backbone", ("img_encoder", "backbone"))
    elif cfg.backbone == "swin_base":
        rules += _swin("img_backbone", ("img_encoder", "backbone"),
                       depths=cfg.swin_depths,
                       out_indices=cfg.backbone_out_indices)
    if cfg.img_neck == "custom_fpn":
        rules += _custom_fpn("img_neck", ("img_encoder", "neck"),
                             len(cfg.img_neck_in_channels))
    elif cfg.img_neck == "fpn_lss":
        rules += _fpn_lss("img_neck", ("img_encoder", "neck"),
                          extra_upsample=False)

    if cfg.depth_net == "conv1x1":
        rules.append(("img_view_transformer.depth_net",
                      ("vt", "depth_net"), CONV))
    else:
        rules += _depthnet_full("img_view_transformer.depth_net",
                                ("vt", "depth_net"), cfg.depthnet_cfg)
    rules += _heightnet("img_view_transformer.height_net",
                        ("vt", "height_net"), cfg.heightnet_cfg)

    if cfg.bev_encoder == "custom_resnet":
        rules += _custom_resnet("img_bev_encoder_backbone",
                                ("bev_encoder", "backbone"),
                                (2,) * len(cfg.bev_encoder_channels))
        rules += _fpn_lss("img_bev_encoder_neck", ("bev_encoder", "neck"),
                          extra_upsample=True)
    else:
        rules += _unet("img_bev_encoder_backbone",
                       ("bev_encoder", "backbone"))

    for k in range(3):
        rules += _unet(f"img_voxel_encoder{k}", (f"voxel_encoder{k}",))
    rules += _sfa("mix", ("sfa",))
    rules += _occ_head("occ_head", ("occ_head",), cfg.use_predicter)

    if cfg.pre_process:
        rules += _custom_resnet("pre_process_net", ("pre_process",), (1,))
        rules += _custom_resnet("pre_process_net_3d", ("pre_process_3d",),
                                (1,))
    return rules


# ---------------------------------------------------------------------------


def _set(tree: dict, path: Tuple[str, ...], key: str, value: np.ndarray):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[key] = value


def _get(tree: dict, path: Tuple[str, ...], key: str) -> np.ndarray:
    node = tree
    for p in path:
        node = node[p]
    return node[key]


def torch_to_params(state_dict: Dict[str, np.ndarray],
                    cfg: Optional[ModelConfig],
                    rules: Optional[List[Rule]] = None) -> Dict[str, Any]:
    """torch state_dict (numpy-valued) -> {'params': ..., 'batch_stats': ...}.

    Unmatched torch keys are collected under '_unmapped' for inspection.
    ``rules`` overrides the full-model table (per-module conversions).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}
    used = set()

    def take(key):
        used.add(key)
        return sd[key]

    for tp, fp, kind in (rules if rules is not None
                         else build_rules(cfg)):
        if kind == BN:
            if f"{tp}.weight" not in sd:
                continue
            _set(params, fp, "scale", take(f"{tp}.weight"))
            _set(params, fp, "bias", take(f"{tp}.bias"))
            _set(stats, fp, "mean", take(f"{tp}.running_mean"))
            _set(stats, fp, "var", take(f"{tp}.running_var"))
        elif kind == LN:
            if f"{tp}.weight" not in sd:
                continue
            _set(params, fp, "scale", take(f"{tp}.weight"))
            _set(params, fp, "bias", take(f"{tp}.bias"))
        elif kind == TABLE:
            if tp not in sd:
                continue
            node = params
            for p in fp[:-1]:
                node = node.setdefault(p, {})
            node[fp[-1]] = take(tp)
        elif kind == CONV:
            if f"{tp}.weight" not in sd:
                continue
            w = take(f"{tp}.weight")
            _set(params, fp, "kernel", w.transpose(2, 3, 1, 0))
            if f"{tp}.bias" in sd:
                _set(params, fp, "bias", take(f"{tp}.bias"))
        elif kind == CONVT:
            if f"{tp}.weight" not in sd:
                continue
            w = take(f"{tp}.weight")          # (I, O, kh, kw)
            # torch ConvTranspose2d "places" the unflipped kernel, while
            # lax.conv_transpose flips it: compensate with a spatial flip.
            w = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
            _set(params, fp, "kernel", np.ascontiguousarray(w))
            if f"{tp}.bias" in sd:
                _set(params, fp, "bias", take(f"{tp}.bias"))
        elif kind == DENSE:
            if f"{tp}.weight" not in sd:
                continue
            _set(params, fp, "kernel", take(f"{tp}.weight").T)
            if f"{tp}.bias" in sd:
                _set(params, fp, "bias", take(f"{tp}.bias"))
        elif kind == CONV1x1_DENSE:
            if f"{tp}.weight" not in sd:
                continue
            w = take(f"{tp}.weight")[:, :, 0, 0]
            _set(params, fp, "kernel", w.T)
            if f"{tp}.bias" in sd:
                _set(params, fp, "bias", take(f"{tp}.bias"))
        elif kind == DCN:
            if f"{tp}.weight" not in sd:
                continue
            w = take(f"{tp}.weight")          # (G*Og, Cg, 3, 3)
            g = 4
            o, cg = w.shape[0], w.shape[1]
            og = o // g
            w = w.reshape(g, og, cg, 9)
            _set(params, fp, "kernel", w.transpose(3, 2, 0, 1))
        else:
            raise ValueError(kind)

    unmapped = sorted(set(sd) - used)
    out = {"params": params, "batch_stats": stats}
    if unmapped:
        out["_unmapped"] = unmapped
    return out


def load_torch_checkpoint(path: str, cfg: ModelConfig) -> Dict[str, Any]:
    """Load a released DHD ``.pth`` (or EMA) checkpoint into flax variables.

    Handles mmcv's {'state_dict': ...} wrapping and DDP 'module.' prefixes
    (tools/test.py:244 loads with map_location='cpu' the same way).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    sd = {k[len("module."):] if k.startswith("module.") else k:
          v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    return torch_to_params(sd, cfg)


def params_to_torch(variables: Dict[str, Any], cfg: Optional[ModelConfig],
                    rules: Optional[List[Rule]] = None
                    ) -> Dict[str, np.ndarray]:
    """Inverse mapping (for round-trip tests, torch export, and the
    activation-parity oracle).  ``rules`` overrides the full-model table —
    per-module oracles pass the module's own rule subset."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}

    def has(tree, path):
        node = tree
        for p in path:
            if p not in node:
                return False
            node = node[p]
        return True

    for tp, fp, kind in (rules if rules is not None
                         else build_rules(cfg)):
        if kind == BN:
            if not has(params, fp):
                continue
            sd[f"{tp}.weight"] = np.asarray(_get(params, fp, "scale"))
            sd[f"{tp}.bias"] = np.asarray(_get(params, fp, "bias"))
            sd[f"{tp}.running_mean"] = np.asarray(_get(stats, fp, "mean"))
            sd[f"{tp}.running_var"] = np.asarray(_get(stats, fp, "var"))
            continue
        if kind == LN:
            if not has(params, fp):
                continue
            sd[f"{tp}.weight"] = np.asarray(_get(params, fp, "scale"))
            sd[f"{tp}.bias"] = np.asarray(_get(params, fp, "bias"))
            continue
        if kind == TABLE:
            if not has(params, fp[:-1]) :
                continue
            node = params
            for p in fp[:-1]:
                node = node[p]
            if fp[-1] in node:
                sd[tp] = np.asarray(node[fp[-1]])
            continue
        if not has(params, fp):
            continue
        node = params
        for p in fp:
            node = node[p]
        if kind == CONV:
            sd[f"{tp}.weight"] = np.asarray(
                node["kernel"]).transpose(3, 2, 0, 1)
        elif kind == CONVT:
            w = np.asarray(node["kernel"]).transpose(2, 3, 0, 1)
            sd[f"{tp}.weight"] = np.ascontiguousarray(w[:, :, ::-1, ::-1])
        elif kind == DENSE:
            sd[f"{tp}.weight"] = np.asarray(node["kernel"]).T
        elif kind == CONV1x1_DENSE:
            sd[f"{tp}.weight"] = np.asarray(node["kernel"]).T[:, :, None, None]
        elif kind == DCN:
            w = np.asarray(node["kernel"])          # (9, Cg, G, Og)
            k, cg, g, og = w.shape
            sd[f"{tp}.weight"] = np.ascontiguousarray(
                w.transpose(2, 3, 1, 0).reshape(g * og, cg, 3, 3))
        if "bias" in node:
            sd[f"{tp}.bias"] = np.asarray(node["bias"])
    return sd
