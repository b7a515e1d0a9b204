"""Torch oracle: a from-scratch pure-torch re-statement of the reference's
DHD-S module topology, with state_dict keys matching the reference exactly
(``img_backbone.*``, ``img_neck.*``, ``img_view_transformer.*``,
``img_bev_encoder_*``, ``img_voxel_encoder{0,1,2}.*``, ``mix.*``,
``occ_head.*`` — the key space io/convert.py maps).

Written against the reference *behavior* (projects/mmdet3d_plugin/...), not
its code: every structural choice is cited.  Purpose: activation-level
parity tests (tests/test_oracle_parity.py) proving the flax model + the
checkpoint converter reproduce the torch computation layer by layer, so
loading a real released ``.pth`` needs no further trust.

CPU / fp32 / eval-mode only — this is a measurement instrument, not a
runtime.
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# bricks
# ---------------------------------------------------------------------------


class TorchBottleneck(nn.Module):
    """torchvision/mmdet 'pytorch'-style bottleneck (stride on the 3x3)."""

    def __init__(self, cin, planes, stride=1, downsample=False):
        super().__init__()
        cout = planes * 4
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idt)


class TorchBasicBlock(nn.Module):
    """mmdet BasicBlock; ``downsample`` is a bare conv for CustomResNet
    (models/backbones/resnet.py:47-48) or a 1x1 conv for the stereo
    DepthNet (depthnet.py:204-206)."""

    def __init__(self, cin, cout, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = downsample

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idt)


class TorchResNet50(nn.Module):
    """mmdet ResNet-50, deep_stem=False, out stages configurable
    (DHD-S.py:44-55)."""

    def __init__(self, out_indices=(2, 3)):
        super().__init__()
        self.out_indices = out_indices
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin, planes = 64, 64
        for stage, n in enumerate((3, 4, 6, 3)):
            blocks = []
            stride = 1 if stage == 0 else 2
            for b in range(n):
                blocks.append(TorchBottleneck(
                    cin if b == 0 else planes * 4, planes,
                    stride=stride if b == 0 else 1, downsample=(b == 0)))
            self.add_module(f"layer{stage + 1}", nn.Sequential(*blocks))
            cin = planes * 4
            planes *= 2

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        outs = []
        for stage in range(4):
            x = getattr(self, f"layer{stage + 1}")(x)
            if stage in self.out_indices:
                outs.append(x)
        return outs


class _ConvHolder(nn.Module):
    """mmcv ConvModule look-alike: the conv lives at attribute ``.conv``."""

    def __init__(self, cin, cout, k, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, **kw)

    def forward(self, x):
        return self.conv(x)


class TorchCustomFPN(nn.Module):
    """mmdet FPN with out_ids=[0] (models/necks/fpn.py:11-203): 1x1
    laterals, nearest top-down adds, one 3x3 output conv."""

    def __init__(self, in_channels=(1024, 2048), out_channels=256):
        super().__init__()
        self.lateral_convs = nn.ModuleList(
            [_ConvHolder(c, out_channels, 1) for c in in_channels])
        self.fpn_convs = nn.ModuleList(
            [_ConvHolder(out_channels, out_channels, 3, padding=1)])

    def forward(self, feats):
        lat = [m(f) for m, f in zip(self.lateral_convs, feats)]
        for i in range(len(lat) - 1, 0, -1):
            lat[i - 1] = lat[i - 1] + F.interpolate(
                lat[i], size=lat[i - 1].shape[2:], mode="nearest")
        return self.fpn_convs[0](lat[0])


class TorchFPNLSS(nn.Module):
    """FPN_LSS (models/necks/lss_fpn.py:12-75): upsample deep level
    (bilinear, align_corners=True), concat, 2x conv-BN-ReLU, optional x2
    upsample head."""

    def __init__(self, in_channels, out_channels, scale_factor=4,
                 input_feature_index=(0, 2), extra_upsample=2):
        super().__init__()
        self.scale_factor = scale_factor
        self.input_feature_index = input_feature_index
        self.extra_upsample = extra_upsample
        mid = out_channels * (2 if extra_upsample else 1)
        self.conv = nn.Sequential(
            nn.Conv2d(in_channels, mid, 3, padding=1, bias=False),
            nn.BatchNorm2d(mid), nn.ReLU(inplace=True),
            nn.Conv2d(mid, mid, 3, padding=1, bias=False),
            nn.BatchNorm2d(mid), nn.ReLU(inplace=True))
        if extra_upsample:
            self.up2 = nn.Sequential(
                nn.Upsample(scale_factor=extra_upsample, mode="bilinear",
                            align_corners=True),
                nn.Conv2d(mid, out_channels, 3, padding=1, bias=False),
                nn.BatchNorm2d(out_channels), nn.ReLU(inplace=True),
                nn.Conv2d(out_channels, out_channels, 1))

    def forward(self, feats):
        x2 = feats[self.input_feature_index[0]]
        x1 = feats[self.input_feature_index[1]]
        x1 = F.interpolate(x1, scale_factor=self.scale_factor,
                           mode="bilinear", align_corners=True)
        x = self.conv(torch.cat([x2, x1], dim=1))
        if self.extra_upsample:
            x = self.up2(x)
        return x


class _Mlp(nn.Module):
    """depthnet.py:119-147 two-layer MLP with ReLU."""

    def __init__(self, cin, hidden, cout):
        super().__init__()
        self.fc1 = nn.Linear(cin, hidden)
        self.fc2 = nn.Linear(hidden, cout)

    def forward(self, x):
        return self.fc2(F.relu(self.fc1(x)))


class _SELayer(nn.Module):
    """depthnet.py:150-169: x * sigmoid(expand(relu(reduce(se))))."""

    def __init__(self, channels):
        super().__init__()
        self.conv_reduce = nn.Conv2d(channels, channels, 1)
        self.conv_expand = nn.Conv2d(channels, channels, 1)

    def forward(self, x, x_se):
        g = self.conv_expand(F.relu(self.conv_reduce(x_se)))
        return x * torch.sigmoid(g)


class _ASPPModule(nn.Module):
    def __init__(self, cin, cout, k, dilation):
        super().__init__()
        pad = 0 if k == 1 else dilation
        self.atrous_conv = nn.Conv2d(cin, cout, k, padding=pad,
                                     dilation=dilation, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.atrous_conv(x)))


class TorchASPP(nn.Module):
    """depthnet.py:42-116: 4 dilated branches + global-average branch."""

    def __init__(self, cin, mid):
        super().__init__()
        self.aspp1 = _ASPPModule(cin, mid, 1, 1)
        self.aspp2 = _ASPPModule(cin, mid, 3, 6)
        self.aspp3 = _ASPPModule(cin, mid, 3, 12)
        self.aspp4 = _ASPPModule(cin, mid, 3, 18)
        self.global_avg_pool = nn.Sequential(
            nn.AdaptiveAvgPool2d((1, 1)),
            nn.Conv2d(cin, mid, 1, bias=False),
            nn.BatchNorm2d(mid), nn.ReLU())
        self.conv1 = nn.Conv2d(mid * 5, cin, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cin)

    def forward(self, x):
        b1 = self.aspp1(x)
        b2 = self.aspp2(x)
        b3 = self.aspp3(x)
        b4 = self.aspp4(x)
        g = self.global_avg_pool(x)
        g = F.interpolate(g, size=b4.shape[2:], mode="bilinear",
                          align_corners=True)
        y = torch.cat([b1, b2, b3, b4, g], dim=1)
        return F.relu(self.bn1(self.conv1(y)))     # dropout(0.5): eval no-op


class TorchDCN(nn.Module):
    """3x3 deformable conv v1 (mmcv DCN as used in depthnet.py:226-236):
    zero-init offset conv, conv groups=4, no bias, zero padding outside."""

    def __init__(self, channels, groups=4):
        super().__init__()
        self.groups = groups
        self.conv_offset = nn.Conv2d(channels, 18, 3, padding=1)
        nn.init.zeros_(self.conv_offset.weight)
        nn.init.zeros_(self.conv_offset.bias)
        self.weight = nn.Parameter(
            torch.empty(channels, channels // groups, 3, 3))
        nn.init.kaiming_uniform_(self.weight, a=5 ** 0.5)

    def forward(self, x):
        b, c, h, w = x.shape
        off = self.conv_offset(x).reshape(b, 9, 2, h, w)
        ky, kx = torch.meshgrid(torch.arange(-1., 2.), torch.arange(-1., 2.),
                                indexing="ij")
        gy = torch.arange(h, dtype=x.dtype).view(1, 1, h, 1)
        gx = torch.arange(w, dtype=x.dtype).view(1, 1, 1, w)
        py = gy + ky.reshape(1, 9, 1, 1) + off[:, :, 0]
        px = gx + kx.reshape(1, 9, 1, 1) + off[:, :, 1]

        # bilinear sample with zero outside (B, C, 9, H, W)
        x0 = torch.floor(px)
        y0 = torch.floor(py)
        wx = (px - x0).unsqueeze(1)
        wy = (py - y0).unsqueeze(1)
        x0i = x0.long()
        y0i = y0.long()
        flat = x.reshape(b, c, h * w)

        def gather(yy, xx):
            valid = ((xx >= 0) & (xx < w) & (yy >= 0) & (yy < h))
            lin = (yy.clamp(0, h - 1) * w + xx.clamp(0, w - 1))
            out = torch.gather(
                flat, 2, lin.reshape(b, 1, -1).expand(b, c, -1))
            return out.reshape(b, c, 9, h, w) * \
                valid.unsqueeze(1).to(x.dtype)

        v00 = gather(y0i, x0i)
        v01 = gather(y0i, x0i + 1)
        v10 = gather(y0i + 1, x0i)
        v11 = gather(y0i + 1, x0i + 1)
        samp = ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
                + (v10 * (1 - wx) + v11 * wx) * wy)

        g = self.groups
        cg = c // g
        og = self.weight.shape[0] // g
        # weight (G*Og, Cg, 3, 3); taps enumerated row-major like the grid
        wgt = self.weight.reshape(g, og, cg, 9)
        samp = samp.reshape(b, g, cg, 9, h, w)
        return torch.einsum("bgckhw,gock->bgohw", samp, wgt
                            ).reshape(b, g * og, h, w)


class _DistributionNet(nn.Sequential):
    """The depth_conv Sequential (depthnet.py:216-244): BasicBlocks +
    optional ASPP + optional DCN + 1x1 out conv; Sequential indices shift
    with the flags exactly as the converter expects."""

    def __init__(self, mid, out_bins, use_aspp=True, use_dcn=True,
                 aspp_mid=-1, stereo=False):
        mods = []
        if stereo:
            first = TorchBasicBlock(
                mid + out_bins, mid,
                downsample=nn.Conv2d(mid + out_bins, mid, 1))
        else:
            first = TorchBasicBlock(mid, mid)
        mods += [first, TorchBasicBlock(mid, mid), TorchBasicBlock(mid, mid)]
        if use_aspp:
            mods.append(TorchASPP(mid, aspp_mid if aspp_mid > 0 else mid))
        if use_dcn:
            mods.append(TorchDCN(mid))
        mods.append(nn.Conv2d(mid, out_bins, 1))
        super().__init__(*mods)


class TorchHeightNet(nn.Module):
    """HeightNet (depthnet.py:418-652): reduce conv, SE gate from the
    27-dim camera MLP embedding, then the distribution trunk.  Also covers
    the stereo cost-volume input branch (cost_volumn_net,
    depthnet.py:207-213)."""

    def __init__(self, in_ch, mid, out_bins, use_aspp=True, use_dcn=True,
                 aspp_mid=-1, stereo=False):
        super().__init__()
        self.stereo = stereo
        self.reduce_conv = nn.Sequential(
            nn.Conv2d(in_ch, mid, 3, padding=1),
            nn.BatchNorm2d(mid), nn.ReLU(inplace=True))
        self.bn = nn.BatchNorm1d(27)
        self.depth_mlp = _Mlp(27, mid, mid)
        self.depth_se = _SELayer(mid)
        if stereo:
            self.cost_volumn_net = nn.Sequential(
                nn.Conv2d(out_bins, out_bins, 3, 2, 1),
                nn.BatchNorm2d(out_bins),
                nn.Conv2d(out_bins, out_bins, 3, 2, 1),
                nn.BatchNorm2d(out_bins))
        self.depth_conv = _DistributionNet(
            mid, out_bins, use_aspp, use_dcn, aspp_mid, stereo)

    def forward(self, x, mlp_input, cost_volume=None):
        mlp = self.bn(mlp_input)
        x = self.reduce_conv(x)
        se = self.depth_mlp(mlp)[..., None, None]
        h = self.depth_se(x, se)
        if self.stereo:
            cv = self.cost_volumn_net(cost_volume)
            h = torch.cat([h, cv], dim=1)
        return self.depth_conv(h)


class TorchDepthNet(nn.Module):
    """Full BEVDepth-style DepthNet with the context branch and the stereo
    cost-volume machinery (depthnet.py:172-415): reduce conv, BatchNorm1d on
    the 27-dim camera vector, SE-gated context + depth branches, gen_grid /
    calculate_cost_volumn / cost_volumn_net, then the distribution trunk.
    state_dict keys mirror the reference module names exactly."""

    def __init__(self, in_ch, mid, context_ch, depth_bins, use_aspp=True,
                 use_dcn=True, aspp_mid=-1, stereo=False, bias=0.0):
        super().__init__()
        self.stereo = stereo
        self.bias = bias
        self.depth_channels = depth_bins
        self.reduce_conv = nn.Sequential(
            nn.Conv2d(in_ch, mid, 3, padding=1),
            nn.BatchNorm2d(mid), nn.ReLU(inplace=True))
        self.bn = nn.BatchNorm1d(27)
        self.context_mlp = _Mlp(27, mid, mid)
        self.context_se = _SELayer(mid)
        self.context_conv = nn.Conv2d(mid, context_ch, 1)
        self.depth_mlp = _Mlp(27, mid, mid)
        self.depth_se = _SELayer(mid)
        if stereo:
            self.cost_volumn_net = nn.Sequential(
                nn.Conv2d(depth_bins, depth_bins, 3, 2, 1),
                nn.BatchNorm2d(depth_bins),
                nn.Conv2d(depth_bins, depth_bins, 3, 2, 1),
                nn.BatchNorm2d(depth_bins))
        self.depth_conv = _DistributionNet(
            mid, depth_bins, use_aspp, use_dcn, aspp_mid, stereo)

    def gen_grid(self, metas, B, N, D, H, W, hi, wi):
        """Reproject the stereo frustum into the previous frame's image
        (depthnet.py:249-308): undo post aug, pixel->cam, cam->prev cam via
        k2s_sensor, project, re-apply post aug, normalize to [-1, 1]."""
        frustum = metas["frustum"]                       # (D, H, W, 3)
        pts = frustum[None, None] - metas["post_trans"].view(B, N, 1, 1, 1, 3)
        inv_pr = torch.inverse(metas["post_rots"])
        pts = inv_pr.view(B, N, 1, 1, 1, 3, 3).matmul(pts.unsqueeze(-1))
        pts = torch.cat(
            (pts[..., :2, :] * pts[..., 2:3, :], pts[..., 2:3, :]), 5)
        rots = metas["k2s_sensor"][:, :, :3, :3]
        trans = metas["k2s_sensor"][:, :, :3, 3]
        combine = rots.matmul(torch.inverse(metas["intrins"]))
        pts = combine.view(B, N, 1, 1, 1, 3, 3).matmul(pts)
        pts = pts + trans.view(B, N, 1, 1, 1, 3, 1)
        neg = pts[..., 2, 0] < 1e-3
        pts = metas["intrins"].view(B, N, 1, 1, 1, 3, 3).matmul(pts)
        uv = pts[..., :2, :] / pts[..., 2:3, :]
        uv = metas["post_rots"][..., :2, :2].view(
            B, N, 1, 1, 1, 2, 2).matmul(uv).squeeze(-1)
        uv = uv + metas["post_trans"][..., :2].view(B, N, 1, 1, 1, 2)
        px = uv[..., 0] / (wi - 1.0) * 2.0 - 1.0
        py = uv[..., 1] / (hi - 1.0) * 2.0 - 1.0
        px = torch.where(neg, torch.full_like(px, -2.0), px)
        py = torch.where(neg, torch.full_like(py, -2.0), py)
        return torch.stack([px, py], dim=-1).view(B * N, D * H, W, 2)

    def calculate_cost_volumn(self, metas):
        """Groupwise |curr - warp(prev)| matching cost, invalid-sample bias,
        softmax over depth (depthnet.py:310-361)."""
        prev, curr = metas["cv_feat_list"]
        group_size = 4
        _, c, hf, wf = curr.shape
        hi, wi = hf * 4, wf * 4
        B, N, _ = metas["post_trans"].shape
        D, H, W, _ = metas["frustum"].shape
        grid = self.gen_grid(metas, B, N, D, H, W, hi, wi).to(curr.dtype)
        cost_volumn = 0
        for fid in range(c // group_size):
            prev_g = prev[:, fid * group_size:(fid + 1) * group_size]
            wrap_prev = F.grid_sample(prev_g, grid, align_corners=True,
                                      padding_mode="zeros")
            curr_g = curr[:, fid * group_size:(fid + 1) * group_size]
            diff = curr_g.unsqueeze(2) - wrap_prev.view(B * N, -1, D, H, W)
            cost_volumn = cost_volumn + diff.abs().sum(dim=1)
        if self.bias != 0:
            invalid = wrap_prev[:, 0].view(B * N, D, H, W) == 0
            cost_volumn[invalid] = cost_volumn[invalid] + self.bias
        return torch.softmax(-cost_volumn, dim=1)

    def forward(self, x, mlp_input, stereo_metas=None):
        mlp = self.bn(mlp_input.reshape(-1, mlp_input.shape[-1]))
        x = self.reduce_conv(x)
        ctx_se = self.context_mlp(mlp)[..., None, None]
        context = self.context_conv(self.context_se(x, ctx_se))
        dep_se = self.depth_mlp(mlp)[..., None, None]
        depth = self.depth_se(x, dep_se)
        if stereo_metas is not None:
            if stereo_metas["cv_feat_list"][0] is None:
                BN, _, H, W = x.shape
                scale = (float(stereo_metas["downsample"])
                         / stereo_metas["cv_downsample"])
                cost_volumn = torch.zeros(
                    (BN, self.depth_channels, int(H * scale),
                     int(W * scale))).to(x)
            else:
                with torch.no_grad():
                    cost_volumn = self.calculate_cost_volumn(stereo_metas)
            cost_volumn = self.cost_volumn_net(cost_volumn)
            depth = torch.cat([depth, cost_volumn], dim=1)
        depth = self.depth_conv(depth)
        return torch.cat([depth, context], dim=1)


# ---------------------------------------------------------------------------
# Swin Transformer (mmcv flavour; models/backbones/swin.py:680-976)
# ---------------------------------------------------------------------------


class _FFN(nn.Module):
    """mmcv FFN: layers = Sequential(Sequential(Linear, GELU, Drop),
    Linear, Drop); residual added by the caller-provided identity."""

    def __init__(self, dim, hidden):
        super().__init__()
        self.layers = nn.Sequential(
            nn.Sequential(nn.Linear(dim, hidden), nn.GELU(), nn.Dropout(0.0)),
            nn.Linear(hidden, dim), nn.Dropout(0.0))

    def forward(self, x, identity):
        return identity + self.layers(x)


class _WindowMSAmm(nn.Module):
    """mmcv WindowMSA (swin.py:244-349) with the double_step_seq relative
    position index (:287-291) — numerically equal to the standard Swin
    construction, and the buffer appears in checkpoints."""

    def __init__(self, dim, num_heads, window_size):
        super().__init__()
        self.num_heads = num_heads
        self.window_size = window_size
        self.scale = (dim // num_heads) ** -0.5
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * window_size - 1) ** 2, num_heads))
        ws = window_size
        seq1 = torch.arange(0, (2 * ws - 1) * ws, 2 * ws - 1)
        seq2 = torch.arange(0, ws)
        coords = (seq1[:, None] + seq2[None, :]).reshape(1, -1)
        rel = coords + coords.T
        rel = rel.flip(1).contiguous()
        # derived constant — real .pth files carry it, but the converter
        # regenerates it, so keep it out of the oracle's expected keys
        self.register_buffer("relative_position_index", rel,
                             persistent=False)
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        b, n, c = x.shape
        h = self.num_heads
        qkv = self.qkv(x).reshape(b, n, 3, h, c // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q * self.scale
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(n, n, -1)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b // nw, nw, h, n, n) + \
                mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, h, n, n)
        attn = torch.softmax(attn, dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(x)


class _ShiftWindowMSA(nn.Module):
    """mmcv ShiftWindowMSA (swin.py:353-513): pad to window multiples, roll
    for SW-MSA, per-window attention with the {0, -100} mask."""

    def __init__(self, dim, num_heads, window_size, shift):
        super().__init__()
        self.window_size = window_size
        self.shift_size = window_size // 2 if shift else 0
        self.w_msa = _WindowMSAmm(dim, num_heads, window_size)

    def forward(self, x, hw):
        h, w = hw
        b, l, c = x.shape
        ws = self.window_size
        x = x.reshape(b, h, w, c)
        pad_r = (ws - w % ws) % ws
        pad_b = (ws - h % ws) % ws
        x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        hp, wp = h + pad_b, w + pad_r
        mask = None
        if self.shift_size > 0:
            x = torch.roll(x, (-self.shift_size, -self.shift_size), (1, 2))
            img = torch.zeros((1, hp, wp, 1))
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -self.shift_size),
                       slice(-self.shift_size, None)):
                for wcs in (slice(0, -ws), slice(-ws, -self.shift_size),
                            slice(-self.shift_size, None)):
                    img[:, hs, wcs, :] = cnt
                    cnt += 1
            mw = self._partition(img).reshape(-1, ws * ws)
            mask = mw.unsqueeze(1) - mw.unsqueeze(2)
            mask = mask.masked_fill(mask != 0, -100.0).masked_fill(
                mask == 0, 0.0)
        wins = self._partition(x).reshape(-1, ws * ws, c)
        wins = self.w_msa(wins, mask)
        wins = wins.reshape(-1, ws, ws, c)
        x = self._reverse(wins, hp, wp)
        if self.shift_size > 0:
            x = torch.roll(x, (self.shift_size, self.shift_size), (1, 2))
        return x[:, :h, :w].reshape(b, l, c)

    def _partition(self, x):
        ws = self.window_size
        b, h, w, c = x.shape
        x = x.reshape(b, h // ws, ws, w // ws, ws, c)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)

    def _reverse(self, wins, h, w):
        ws = self.window_size
        b = wins.shape[0] // ((h // ws) * (w // ws))
        x = wins.reshape(b, h // ws, w // ws, ws, ws, -1)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class _SwinBlockT(nn.Module):
    """swin.py:516-592: LN -> (S)W-MSA -> +id -> LN -> FFN(+id)."""

    def __init__(self, dim, num_heads, window_size, shift, mlp_ratio=4):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = _ShiftWindowMSA(dim, num_heads, window_size, shift)
        self.norm2 = nn.LayerNorm(dim)
        self.ffn = _FFN(dim, dim * mlp_ratio)

    def forward(self, x, hw):
        idt = x
        x = idt + self.attn(self.norm1(x), hw)
        return self.ffn(self.norm2(x), identity=x)


class _PatchMergingT(nn.Module):
    """swin.py:174-241: nn.Unfold(2, stride 2) channel-major 2x2 concat,
    LN, then Linear(4C -> out, no bias)."""

    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.sampler = nn.Unfold(kernel_size=2, stride=2)
        self.norm = nn.LayerNorm(4 * in_ch)
        self.reduction = nn.Linear(4 * in_ch, out_ch, bias=False)

    def forward(self, x, hw):
        h, w = hw
        b, l, c = x.shape
        x = x.view(b, h, w, c).permute(0, 3, 1, 2)
        if (h % 2) or (w % 2):
            x = F.pad(x, (0, w % 2, 0, h % 2))
        x = self.sampler(x)                        # (B, 4C, h2*w2)
        x = x.transpose(1, 2)
        x = self.norm(x)
        return self.reduction(x), ((h + 1) // 2, (w + 1) // 2)


class _SwinStage(nn.Module):
    def __init__(self, dim, num_heads, depth, window_size, downsample):
        super().__init__()
        self.blocks = nn.ModuleList([
            _SwinBlockT(dim, num_heads, window_size, shift=(i % 2 == 1))
            for i in range(depth)])
        self.downsample = downsample

    def forward(self, x, hw):
        for blk in self.blocks:
            x = blk(x, hw)
        if self.downsample is not None:
            x_down, hw_down = self.downsample(x, hw)
            return x_down, hw_down, x, hw
        return x, hw, x, hw


class TorchSwin(nn.Module):
    """mmcv-flavoured Swin backbone (swin.py:680-976): 4x4 conv patch embed
    + LN, stages with unfold PatchMerging, per-out-index LN heads, and
    return_stereo_feat emitting the stage-0 (stride-4) feature first."""

    def __init__(self, embed_dims=128, depths=(2, 2, 18, 2),
                 num_heads=(4, 8, 16, 32), window_size=12,
                 out_indices=(2, 3), return_stereo_feat=True):
        super().__init__()
        self.out_indices = out_indices
        self.return_stereo_feat = return_stereo_feat
        self.patch_embed = nn.Module()
        self.patch_embed.projection = nn.Conv2d(3, embed_dims, 4, stride=4)
        self.patch_embed.norm = nn.LayerNorm(embed_dims)
        self.stages = nn.ModuleList()
        dim = embed_dims
        dims = []
        for i, depth in enumerate(depths):
            down = (_PatchMergingT(dim, dim * 2)
                    if i < len(depths) - 1 else None)
            self.stages.append(
                _SwinStage(dim, num_heads[i], depth, window_size, down))
            dims.append(dim)
            if down is not None:
                dim *= 2
        for i in out_indices:
            self.add_module(f"norm{i}", nn.LayerNorm(dims[i]))

    def stem(self, x):
        x = self.patch_embed.projection(x)
        hw = (x.shape[2], x.shape[3])
        x = x.flatten(2).transpose(1, 2)
        return self.patch_embed.norm(x), hw

    def forward(self, x, stage0_only=False):
        x, hw = self.stem(x)
        outs = []
        for i, stage in enumerate(self.stages):
            x, hw, out, out_hw = stage(x, hw)
            if i == 0 and (self.return_stereo_feat or stage0_only):
                feat = out.view(-1, *out_hw, out.shape[-1]) \
                    .permute(0, 3, 1, 2).contiguous()
                if stage0_only:
                    return feat
                outs.append(feat)
            if i in self.out_indices:
                y = getattr(self, f"norm{i}")(out)
                outs.append(y.view(-1, *out_hw, y.shape[-1])
                            .permute(0, 3, 1, 2).contiguous())
        return outs


class _DoubleConv(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.double_conv = nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(inplace=True),
            nn.Conv2d(cout, cout, 3, padding=1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(inplace=True))

    def forward(self, x):
        return self.double_conv(x)


class _Down(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.maxpool_conv = nn.Sequential(
            nn.MaxPool2d(2), _DoubleConv(cin, cout))

    def forward(self, x):
        return self.maxpool_conv(x)


class _Up(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.up = nn.ConvTranspose2d(cin, cin // 2, 2, 2)
        self.conv = _DoubleConv(cin, cout)

    def forward(self, x1, x2):
        x1 = self.up(x1)
        dy = x2.shape[2] - x1.shape[2]
        dx = x2.shape[3] - x1.shape[3]
        if dy or dx:
            x1 = F.pad(x1, (dx // 2, dx - dx // 2, dy // 2, dy - dy // 2))
        return self.conv(torch.cat([x2, x1], dim=1))


class _OutConv(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        return self.conv(x)


class TorchUNet(nn.Module):
    """models/backbones/unet.py:7-143, bilinear=False (ConvTranspose)."""

    def __init__(self, n_channels, n_classes, base=64):
        super().__init__()
        b = base
        self.inc = _DoubleConv(n_channels, b)
        self.down1 = _Down(b, b * 2)
        self.down2 = _Down(b * 2, b * 4)
        self.down3 = _Down(b * 4, b * 8)
        self.down4 = _Down(b * 8, b * 16)
        self.up1 = _Up(b * 16, b * 8)
        self.up2 = _Up(b * 8, b * 4)
        self.up3 = _Up(b * 4, b * 2)
        self.up4 = _Up(b * 2, b)
        self.outc = _OutConv(b, n_classes)

    def forward(self, x):
        x1 = self.inc(x)
        x2 = self.down1(x1)
        x3 = self.down2(x2)
        x4 = self.down3(x3)
        x5 = self.down4(x4)
        x = self.up1(x5, x4)
        x = self.up2(x, x3)
        x = self.up3(x, x2)
        x = self.up4(x, x1)
        return self.outc(x)


class _ChannelSpatialStage(nn.Module):
    """mix.py:8-59: channel gate then spatial gate over (bev, voxel)."""

    def __init__(self, channels, reduction=16):
        super().__init__()
        c = channels // 2
        self.fc = nn.Sequential(
            nn.Linear(channels, channels // reduction), nn.ReLU(),
            nn.Linear(channels // reduction, c))
        self.spacial_leanring = nn.Sequential(       # (sic) reference name
            nn.Conv2d(c, c, 1), nn.BatchNorm2d(c), nn.ReLU(),
            nn.Conv2d(c, c, 1), nn.BatchNorm2d(c))

    def forward(self, x):
        c = x.shape[1] // 2
        x_bev, x_vox = x[:, :c], x[:, c:]
        a = torch.sigmoid(self.fc(x.mean(dim=(2, 3))))[:, :, None, None]
        x_bev1 = a * x_bev
        x_vox1 = (1 - a) * x_vox
        g = torch.sigmoid(self.spacial_leanring(x_bev1 + x_vox1))
        return g * x_bev1 + (1 - g) * x_vox1


class TorchSFA(nn.Module):
    """mix.py:61-90."""

    def __init__(self, in_channels=512, out_channels=256):
        super().__init__()
        c = in_channels // 2
        self.mysk_7 = _ChannelSpatialStage(in_channels)
        self.mix_residual = nn.Sequential(
            nn.Conv2d(c, out_channels, 3, padding=1, bias=False),
            nn.BatchNorm2d(out_channels), nn.ReLU(),
            nn.Conv2d(out_channels, out_channels, 3, padding=1, bias=False),
            nn.BatchNorm2d(out_channels))
        self.mix_shortcut = nn.Sequential(
            nn.Conv2d(in_channels, out_channels, 1, bias=False),
            nn.BatchNorm2d(out_channels))

    def forward(self, x):
        fused = self.mysk_7(x)
        return F.relu(self.mix_residual(fused) + self.mix_shortcut(x))


class TorchOccHead(nn.Module):
    """predictor (occ_head.py:33-100)."""

    def __init__(self, in_dim=256, out_dim=256, Dz=16, num_classes=18,
                 use_predicter=True):
        super().__init__()
        self.Dz = Dz
        self.num_classes = num_classes
        self.use_predicter = use_predicter
        out_ch = out_dim if use_predicter else Dz * num_classes
        self.final_conv = _ConvHolder(in_dim, out_ch, 3, padding=1)
        if use_predicter:
            self.predicter = nn.Sequential(
                nn.Linear(out_dim, out_dim * 2), nn.Softplus(),
                nn.Linear(out_dim * 2, Dz * num_classes))

    def forward(self, x):
        # x: (B, C, Dy, Dx) -> (B, Dx, Dy, C) (occ_head.py:93); the mmcv
        # ConvModule applies its default ReLU after the conv
        x = F.relu(self.final_conv(x)).permute(0, 3, 2, 1)
        if self.use_predicter:
            x = self.predicter(x)
            b, dx, dy = x.shape[:3]
            x = x.reshape(b, dx, dy, self.Dz, self.num_classes)
        return x


class TorchCustomResNet(nn.Module):
    """models/backbones/resnet.py:11-80: stages of BasicBlocks whose first
    block downsamples through a bare 3x3 conv."""

    def __init__(self, in_ch, num_channels=(128, 256, 512),
                 num_layer=(2, 2, 2), stride=(2, 2, 2)):
        super().__init__()
        stages = []
        cin = in_ch
        for ch, n, s in zip(num_channels, num_layer, stride):
            blocks = [TorchBasicBlock(
                cin, ch, stride=s,
                downsample=nn.Conv2d(cin, ch, 3, s, 1))]
            blocks += [TorchBasicBlock(ch, ch) for _ in range(n - 1)]
            stages.append(nn.Sequential(*blocks))
            cin = ch
        self.layers = nn.ModuleList(stages)

    def forward(self, x):
        feats = []
        for stage in self.layers:
            x = stage(x)
            feats.append(x)
        return feats


# ---------------------------------------------------------------------------
# geometry + pooling (numpy; mirrors geometry/frustum.py + ops/voxel_pool.py
# semantics, which are themselves golden-tested against hand-checked cases)
# ---------------------------------------------------------------------------


def frustum_points(vt, downsample=None):
    """(D, fH, fW, 3) of (u, v, d) image-plane frustum
    (lss_heightmap.py:105-134, sid=False).  ``downsample`` overrides
    vt.downsample (the stereo cv_frustum uses 4, lss_heightmap.py:900-907)."""
    h, w = vt.input_size
    ds_factor = downsample or vt.downsample
    fh, fw = h // ds_factor, w // ds_factor
    ds = np.arange(vt.depth.lower, vt.depth.upper, vt.depth.interval,
                   dtype=np.float64)
    xs = np.linspace(0, w - 1, fw, dtype=np.float64)
    ys = np.linspace(0, h - 1, fh, dtype=np.float64)
    d_g, y_g, x_g = np.meshgrid(ds, ys, xs, indexing="ij")
    return np.stack([x_g, y_g, d_g], axis=-1)


def ego_coords(vt, s2k, intrins, post_rots, post_trans, bda):
    """(B, N, D, fH, fW, 3) ego xyz (get_ego_coor, lss_heightmap.py:179-231)."""
    fr = frustum_points(vt)                               # (D,fH,fW,3)
    b, n = s2k.shape[:2]
    pts = fr[None, None] - post_trans[:, :, None, None, None, :].astype(
        np.float64)
    inv_pr = np.linalg.inv(post_rots.astype(np.float64))
    pts = np.einsum("bnij,bndhwj->bndhwi", inv_pr, pts)
    pts = np.concatenate([pts[..., :2] * pts[..., 2:3], pts[..., 2:3]],
                         axis=-1)
    cam2ego = np.einsum(
        "bnij,bnjk->bnik", s2k[:, :, :3, :3].astype(np.float64),
        np.linalg.inv(intrins.astype(np.float64)))
    pts = np.einsum("bnij,bndhwj->bndhwi", cam2ego, pts)
    pts = pts + s2k[:, :, None, None, None, :3, 3].astype(np.float64)
    pts = np.einsum("bij,bndhwj->bndhwi", bda.astype(np.float64), pts)
    return pts.astype(np.float32)


def mghs_pool_np(depth, feat, band_mask, coords, vt):
    """Reference 4-pass pooling (lss_heightmap.py:407-459) as vectorized
    numpy scatter-adds; returns bev (B,C,Dy,Dx) + vox (B,C,Dz,Dy,Dx)."""
    b, n, d, fh, fw = depth.shape
    c = feat.shape[2]
    dx, dy, dz = vt.x.size, vt.y.size, vt.z_fine.size
    s1, s2, _ = vt.slab_sizes
    xi = ((coords[..., 0] - vt.x.lower) / vt.x.interval).astype(np.int64)
    yi = ((coords[..., 1] - vt.y.lower) / vt.y.interval).astype(np.int64)
    zf = ((coords[..., 2] - vt.z_full.lower)
          / vt.z_full.interval).astype(np.int64)
    zi = ((coords[..., 2] - vt.z_fine.lower)
          / vt.z_fine.interval).astype(np.int64)
    in_xy = (xi >= 0) & (xi < dx) & (yi >= 0) & (yi < dy)
    ok_bev = in_xy & (zf >= 0) & (zf < vt.z_full.size)
    ok_vox = in_xy & (zi >= 0) & (zi < dz)

    # vals (B, N, D, fH, fW, C)
    vals = depth[..., None] * np.moveaxis(feat, 2, -1)[:, :, None]
    bev = np.zeros((b, dy, dx, c), np.float32)
    vox = np.zeros((b, dz, dy, dx, c), np.float32)
    bi = np.broadcast_to(
        np.arange(b)[:, None, None, None, None], xi.shape)
    m = ok_bev
    np.add.at(bev, (bi[m], yi[m], xi[m]), vals[m])
    zc = np.clip(zi, 0, dz - 1)
    band = np.where(zc < s1, 0, np.where(zc < s1 + s2, 1, 2))
    pix_gate = np.take_along_axis(
        np.broadcast_to(band_mask[:, :, None], xi.shape + (3,)),
        band[..., None], axis=-1)[..., 0]
    m = ok_vox & (pix_gate > 0)
    np.add.at(vox, (bi[m], zi[m], yi[m], xi[m]), vals[m])
    return (np.moveaxis(bev, -1, 1), np.moveaxis(vox, -1, 1))


def get_mlp_input_np(s2k, intrins, post_rots, post_trans, bda):
    """27-dim camera embedding (lss_heightmap.py:493-526)."""
    b, n = s2k.shape[:2]
    bda4 = np.broadcast_to(bda[:, None], (b, n, 3, 3))
    feats = [
        intrins[..., 0, 0], intrins[..., 1, 1],
        intrins[..., 0, 2], intrins[..., 1, 2],
        post_rots[..., 0, 0], post_rots[..., 0, 1], post_trans[..., 0],
        post_rots[..., 1, 0], post_rots[..., 1, 1], post_trans[..., 1],
        bda4[..., 0, 0], bda4[..., 0, 1], bda4[..., 1, 0], bda4[..., 1, 1],
        bda4[..., 2, 2],
    ]
    mlp = np.stack(feats, axis=-1)
    s2k_flat = s2k[:, :, :3, :].reshape(b, n, 12)
    return np.concatenate([mlp, s2k_flat], axis=-1).astype(np.float32)


# ---------------------------------------------------------------------------
# assembled DHD-S
# ---------------------------------------------------------------------------


class TorchDHDS(nn.Module):
    """The assembled single-frame DHD detector (detectors/DHD_model.py:11-241)
    at DHD-S channel configuration; spatial sizes come from ``cfg.vt`` so
    parity tests can run at reduced resolution with the real channel
    widths (the converter rules only see channels)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        vt = cfg.vt
        self.img_backbone = TorchResNet50(cfg.backbone_out_indices)
        self.img_neck = TorchCustomFPN(cfg.img_neck_in_channels,
                                       cfg.img_neck_out_channels)
        dnet = nn.Conv2d(vt.in_channels, vt.D + vt.out_channels, 1)
        self.img_view_transformer = nn.Module()
        self.img_view_transformer.depth_net = dnet
        hc = cfg.heightnet_cfg
        self.img_view_transformer.height_net = TorchHeightNet(
            vt.in_channels, vt.in_channels, vt.num_height_bins,
            use_aspp=hc.use_aspp, use_dcn=hc.use_dcn,
            aspp_mid=hc.aspp_mid_channels)
        self.img_bev_encoder_backbone = TorchCustomResNet(
            vt.out_channels, cfg.bev_encoder_channels)
        bev_in = (cfg.bev_encoder_channels[-1]
                  + cfg.bev_encoder_channels[0])
        self.img_bev_encoder_neck = TorchFPNLSS(
            bev_in, cfg.bev_neck_out_channels, scale_factor=4,
            input_feature_index=(0, 2), extra_upsample=2)
        s1, s2, s3 = vt.slab_sizes
        for k, slab in enumerate((s1, s2, s3)):
            self.add_module(
                f"img_voxel_encoder{k}",
                TorchUNet(slab * vt.out_channels, cfg.voxel_encoder_out[k],
                          base=cfg.unet_base))
        self.mix = TorchSFA(cfg.sfa_in_channels, cfg.sfa_out_channels)
        self.occ_head = TorchOccHead(cfg.head_in_dim, cfg.head_out_dim,
                                     cfg.head_Dz, cfg.num_classes,
                                     cfg.use_predicter)

    @torch.no_grad()
    def forward(self, batch):
        """batch: numpy dict in our pipeline's layout (imgs (B,N,H,W,3) ...);
        returns occ logits (B, Dx, Dy, Dz, n_cls) as numpy."""
        cfg = self.cfg
        vt = cfg.vt
        imgs = torch.from_numpy(
            np.moveaxis(batch["imgs"], -1, 2)).float()    # (B,N,3,H,W)
        b, n = imgs.shape[:2]
        x = imgs.reshape(b * n, *imgs.shape[2:])
        feats = self.img_backbone(x)
        x = self.img_neck(feats)                          # (B*N, 256, fH, fW)
        fh, fw = x.shape[2:]

        mlp_input = torch.from_numpy(get_mlp_input_np(
            batch["sensor2keyego"], batch["intrins"], batch["post_rots"],
            batch["post_trans"], batch["bda"])).reshape(b * n, 27)
        dnet_out = self.img_view_transformer.depth_net(x)
        depth = torch.softmax(dnet_out[:, :vt.D], dim=1)
        tran_feat = dnet_out[:, vt.D:vt.D + vt.out_channels]
        height_logit = self.img_view_transformer.height_net(x, mlp_input)
        height = torch.softmax(height_logit, dim=1)

        # argmax height -> band masks (lss_heightmap.py:528-564)
        centers = np.asarray(vt.height_bin_centers(), np.float32)
        hmap = centers[height.argmax(dim=1).numpy()]      # (B*N, fH, fW)
        lo, t1, t2, hi = vt.mask_range
        band_mask = np.stack([(hmap >= lo) & (hmap < t1),
                              (hmap >= t1) & (hmap < t2),
                              (hmap >= t2) & (hmap < hi)],
                             axis=-1).astype(np.float32)

        coords = ego_coords(vt, batch["sensor2keyego"], batch["intrins"],
                            batch["post_rots"], batch["post_trans"],
                            batch["bda"])
        bev, vox = mghs_pool_np(
            depth.numpy().reshape(b, n, vt.D, fh, fw),
            tran_feat.numpy().reshape(b, n, vt.out_channels, fh, fw),
            band_mask.reshape(b, n, fh, fw, 3), coords, vt)

        feats = self.img_bev_encoder_backbone(torch.from_numpy(bev))
        x2d = self.img_bev_encoder_neck(feats)

        s1, s2, _ = vt.slab_sizes
        vox_t = torch.from_numpy(vox)
        slabs = [vox_t[:, :, :s1], vox_t[:, :, s1:s1 + s2],
                 vox_t[:, :, s1 + s2:]]
        outs3d = []
        for k, slab in enumerate(slabs):
            # collapse z, z-major channel order (lss_heightmap.py:297-299)
            bb, cc, zz, yy, xx = slab.shape
            flat = slab.permute(0, 2, 1, 3, 4).reshape(bb, zz * cc, yy, xx)
            outs3d.append(getattr(self, f"img_voxel_encoder{k}")(flat))
        x3d = torch.cat(outs3d, dim=1)

        fused = self.mix(torch.cat([x2d, x3d], dim=1))
        return self.occ_head(fused).numpy()


# ---------------------------------------------------------------------------
# assembled DHD_stereo (DHD-M/L protocol)
# ---------------------------------------------------------------------------


def stereo_prepare_inputs_np(s2e, e2g):
    """(s2k, c2a) in fp64 from frames-major poses (bevdet4d.py:208-288).

    s2k[:, f] = inv(keyego2global) @ ego2global[f] @ sensor2ego[f]
    c2a[:, f] = frame-f camera -> frame-(f+1) camera (curr2adjsensor).
    """
    s2e = s2e.astype(np.float64)
    e2g = e2g.astype(np.float64)
    keyego2global = e2g[:, 0, 0]                      # (B, 4, 4)
    g2k = np.linalg.inv(keyego2global)[:, None, None]
    s2k = g2k @ e2g @ s2e                             # (B, F, N, 4, 4)
    cam2global = e2g @ s2e
    c2a = np.linalg.inv(cam2global[:, 1:]) @ cam2global[:, :-1]
    return s2k, c2a


class TorchDHDStereo(nn.Module):
    """The assembled temporal+stereo DHD detector (DHD_model.py:245-667 on
    the BEVStereo4D protocol, bevstereo4d.py:13-275): backwards frame loop,
    extra-ref stereo frame, cost volume against the previous frame,
    pre-process nets, per-frame channel concat, slab UNets, SFA, head.

    Consumes our frames-major numpy batch; geometry (frustum/pooling) uses
    the shared numpy helpers, network math is all torch with
    reference-keyed state_dict names."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        vt = cfg.vt
        dz = vt.z_fine.size
        nf = cfg.num_frames - (1 if cfg.stereo else 0)   # concat'd frames
        if cfg.backbone == "resnet50":
            self.img_backbone = TorchResNet50(cfg.backbone_out_indices)
        elif cfg.backbone == "swin_base":
            self.img_backbone = TorchSwin(
                embed_dims=cfg.swin_embed_dims, depths=cfg.swin_depths,
                num_heads=cfg.swin_num_heads, window_size=cfg.swin_window,
                out_indices=(2, 3), return_stereo_feat=True)
        else:
            raise NotImplementedError(cfg.backbone)
        if cfg.img_neck == "custom_fpn":
            self.img_neck = TorchCustomFPN(cfg.img_neck_in_channels,
                                           cfg.img_neck_out_channels)
        else:                                      # DHD-L FPN_LSS img neck
            self.img_neck = TorchFPNLSS(
                sum(cfg.img_neck_in_channels), cfg.img_neck_out_channels,
                scale_factor=2, input_feature_index=(0, 1),
                extra_upsample=None)
        dn = cfg.depthnet_cfg
        hn = cfg.heightnet_cfg
        self.img_view_transformer = nn.Module()
        self.img_view_transformer.depth_net = TorchDepthNet(
            vt.in_channels, vt.in_channels, vt.out_channels, vt.D,
            use_aspp=dn.use_aspp, use_dcn=dn.use_dcn,
            aspp_mid=dn.aspp_mid_channels, stereo=dn.stereo, bias=dn.bias)
        self.img_view_transformer.height_net = TorchHeightNet(
            vt.in_channels, vt.in_channels, vt.num_height_bins,
            use_aspp=hn.use_aspp, use_dcn=hn.use_dcn,
            aspp_mid=hn.aspp_mid_channels)
        if cfg.pre_process:
            self.pre_process_net = TorchCustomResNet(
                vt.out_channels, (vt.out_channels,), (1,), (1,))
            self.pre_process_net_3d = TorchCustomResNet(
                vt.out_channels * dz, (vt.out_channels * dz,), (1,), (1,))
        cat_c = vt.out_channels * nf
        if cfg.bev_encoder == "unet":
            self.img_bev_encoder_backbone = TorchUNet(
                cat_c, cfg.bev_unet_out, base=cfg.unet_base)
        else:
            self.img_bev_encoder_backbone = TorchCustomResNet(
                cat_c, cfg.bev_encoder_channels)
            bev_in = (cfg.bev_encoder_channels[-1]
                      + cfg.bev_encoder_channels[0])
            self.img_bev_encoder_neck = TorchFPNLSS(
                bev_in, cfg.bev_neck_out_channels, scale_factor=4,
                input_feature_index=(0, 2), extra_upsample=2)
        s1, s2, s3 = vt.slab_sizes
        for k, slab in enumerate((s1, s2, s3)):
            self.add_module(
                f"img_voxel_encoder{k}",
                TorchUNet(slab * cat_c, cfg.voxel_encoder_out[k],
                          base=cfg.unet_base))
        self.mix = TorchSFA(cfg.sfa_in_channels, cfg.sfa_out_channels)
        self.occ_head = TorchOccHead(cfg.head_in_dim, cfg.head_out_dim,
                                     cfg.head_Dz, cfg.num_classes,
                                     cfg.use_predicter)

    def _stereo_stem(self, x):
        """extract_stereo_ref_feat: backbone stem + stage 0 only
        (bevstereo4d.py:20-54)."""
        bb = self.img_backbone
        if isinstance(bb, TorchSwin):
            return bb(x, stage0_only=True)
        x = bb.maxpool(F.relu(bb.bn1(bb.conv1(x))))
        return bb.layer1(x)

    def _image_encoder(self, x):
        """backbone (stereo=True) + neck: (neck_out, stage0 stereo feat)."""
        feats = self.img_backbone(x)
        stereo_feat, feats = feats[0], feats[1:]
        return self.img_neck(feats), stereo_feat

    def _bev_encoder(self, x):
        y = self.img_bev_encoder_backbone(x)
        if self.cfg.bev_encoder == "unet":
            return y
        return self.img_bev_encoder_neck(y)

    @torch.no_grad()
    def forward(self, batch):
        cfg = self.cfg
        vt = cfg.vt
        dz = vt.z_fine.size
        imgs = batch["imgs"]                        # (B, F, N, H, W, 3)
        b, f, n = imgs.shape[:3]
        s2k, c2a = stereo_prepare_inputs_np(batch["sensor2ego"],
                                            batch["ego2global"])
        cv_frustum = torch.from_numpy(
            frustum_points(vt, downsample=4).astype(np.float32))

        bev_list, vox_list = [], []
        depth_key = height_key = None
        feat_prev_iv = None
        for fid in range(cfg.num_frames - 1, -1, -1):
            key_frame = fid == 0
            extra_ref = cfg.stereo and fid == cfg.num_frames - 1
            x_t = torch.from_numpy(
                np.moveaxis(imgs[:, fid], -1, 2)).float() \
                .reshape(b * n, 3, *imgs.shape[3:5])
            if extra_ref:
                feat_prev_iv = self._stereo_stem(x_t)
                continue
            x, stereo_feat = self._image_encoder(x_t)
            fh, fw = x.shape[2:]

            intr = batch["intrins"][:, fid]
            pr = batch["post_rots"][:, fid]
            pt = batch["post_trans"][:, fid]
            mlp_input = torch.from_numpy(get_mlp_input_np(
                s2k[:, 0].astype(np.float32), intr, pr, pt,
                batch["bda"])).reshape(b * n, 27)

            metas = dict(
                k2s_sensor=torch.from_numpy(
                    c2a[:, fid].astype(np.float32)),
                intrins=torch.from_numpy(intr),
                post_rots=torch.from_numpy(pr),
                post_trans=torch.from_numpy(pt),
                frustum=cv_frustum,
                cv_downsample=4, downsample=vt.downsample,
                cv_feat_list=[feat_prev_iv, stereo_feat])
            dnet_out = self.img_view_transformer.depth_net(
                x, mlp_input, metas)
            depth = torch.softmax(dnet_out[:, :vt.D], dim=1)
            tran_feat = dnet_out[:, vt.D:vt.D + vt.out_channels]
            height_logit = self.img_view_transformer.height_net(x, mlp_input)
            height = torch.softmax(height_logit, dim=1)

            centers = np.asarray(vt.height_bin_centers(), np.float32)
            hmap = centers[height.argmax(dim=1).numpy()]
            lo, t1, t2, hi = vt.mask_range
            band_mask = np.stack([(hmap >= lo) & (hmap < t1),
                                  (hmap >= t1) & (hmap < t2),
                                  (hmap >= t2) & (hmap < hi)],
                                 axis=-1).astype(np.float32)

            coords = ego_coords(
                vt, s2k[:, fid].astype(np.float32), intr, pr, pt,
                batch["bda"])
            bev, vox = mghs_pool_np(
                depth.numpy().reshape(b, n, vt.D, fh, fw),
                tran_feat.numpy().reshape(b, n, vt.out_channels, fh, fw),
                band_mask.reshape(b, n, fh, fw, 3), coords, vt)
            bev_t = torch.from_numpy(bev)            # (B, C, Dy, Dx)
            vox_t = torch.from_numpy(vox)            # (B, C, Dz, Dy, Dx)

            if cfg.pre_process:
                # collapse z (z-major: cat(unbind(2), 1)), 1-layer resnet,
                # restore (DHD_model.py:360-368)
                bev_t = self.pre_process_net(bev_t)[0]
                vox_c = torch.cat(vox_t.unbind(dim=2), 1)
                vox_c = self.pre_process_net_3d(vox_c)[0]
                vox_t = torch.stack(torch.chunk(vox_c, dz, dim=1), dim=2)

            if key_frame:
                depth_key, height_key = depth, height
            else:
                feat_prev_iv = stereo_feat
            bev_list.append(bev_t)
            vox_list.append(vox_t)

        bev_cat = torch.cat(bev_list, dim=1)          # (B, F'*C, Dy, Dx)
        vox_cat = torch.cat(vox_list, dim=1)          # (B, F'*C, Dz, Dy, Dx)

        s1, s2, _ = vt.slab_sizes
        slabs = [vox_cat[:, :, :s1], vox_cat[:, :, s1:s1 + s2],
                 vox_cat[:, :, s1 + s2:]]
        outs3d = []
        for k, slab in enumerate(slabs):
            flat = torch.cat(slab.unbind(dim=2), 1)   # z-major collapse
            outs3d.append(getattr(self, f"img_voxel_encoder{k}")(flat))
        x3d = torch.cat(outs3d, dim=1)
        x2d = self._bev_encoder(bev_cat)
        fused = self.mix(torch.cat([x2d, x3d], dim=1))
        return self.occ_head(fused).numpy()
