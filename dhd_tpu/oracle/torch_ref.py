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


def frustum_points(vt):
    """(D, fH, fW, 3) of (u, v, d) image-plane frustum
    (lss_heightmap.py:105-134, sid=False)."""
    h, w = vt.input_size
    fh, fw = h // vt.downsample, w // vt.downsample
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
                TorchUNet(slab * vt.out_channels, cfg.voxel_encoder_out[k]))
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
