"""Test-only PyTorch transcription of SGCDet's CUDA-free modules.

Written from the reference sources so the full-model parity test
(tests/test_full_model_torch_parity.py) can convert random torch weights
through ``convert_torch_state_dict`` and assert end-to-end numerical parity
of the flax rebuild.  Attribute names deliberately mirror the reference so
``state_dict()`` keys match the released-checkpoint naming:

* ResNet-50 / FPN: mmdet with torchvision naming
  (/root/reference/configs/SGCDet_ScanNet.py:74-88)
* DepthNet_Fusion stack: depth_est_fusion.py:85-252, extractor_matching.py,
  layer_matching.py:101-135
* FastIndoorImVoxelNeck: necks/imvoxelnet.py:8-67,146-173
* ScanNetImVoxelHeadV2 conv heads: dense_heads/imvoxel_head_v2.py:76-79,348-353
"""
import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# ResNet-50 (torchvision naming) + FPN
# ---------------------------------------------------------------------------


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idt)


class ResNet50(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for s, (planes, blocks, stride) in enumerate(
            [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)], start=1
        ):
            layers = []
            for b in range(blocks):
                st = stride if b == 0 else 1
                down = None
                if b == 0:
                    down = nn.Sequential(
                        nn.Conv2d(inplanes, planes * 4, 1, st, bias=False),
                        nn.BatchNorm2d(planes * 4),
                    )
                layers.append(Bottleneck(inplanes, planes, st, down))
                inplanes = planes * 4
            setattr(self, f"layer{s}", nn.Sequential(*layers))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        outs = []
        for s in range(1, 5):
            x = getattr(self, f"layer{s}")(x)
            outs.append(x)
        return outs


class _ConvModule(nn.Module):
    """mmcv ConvModule without norm/act: just `.conv`."""

    def __init__(self, cin, cout, k, pad=0):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, padding=pad)

    def forward(self, x):
        return self.conv(x)


class FPN(nn.Module):
    def __init__(self, in_channels=(256, 512, 1024, 2048), out_channels=256):
        super().__init__()
        self.lateral_convs = nn.ModuleList(
            [_ConvModule(c, out_channels, 1) for c in in_channels]
        )
        self.fpn_convs = nn.ModuleList(
            [_ConvModule(out_channels, out_channels, 3, pad=1) for _ in in_channels]
        )

    def forward(self, inputs):
        laterals = [l(x) for l, x in zip(self.lateral_convs, inputs)]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + F.interpolate(
                laterals[i], size=laterals[i - 1].shape[2:], mode="nearest"
            )
        return [conv(l) for conv, l in zip(self.fpn_convs, laterals)]


# ---------------------------------------------------------------------------
# DepthNet_Fusion stack
# ---------------------------------------------------------------------------


class MatchingBasicBlock(nn.Module):
    """layer_matching.py BasicBlock: the downsample BN is registered both as
    `bn3` and `downsample.1` (same module object)."""

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1)
        self.bn1 = nn.BatchNorm2d(planes)
        self.bn2 = nn.BatchNorm2d(planes)
        if stride == 1 and inplanes == planes:
            self.downsample = None
        else:
            self.bn3 = nn.BatchNorm2d(planes)
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes, 1, stride), self.bn3
            )

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return F.relu(x + y)


class MatchingExtractor(nn.Module):
    """extractor_matching.py ResNetFPN (truncated resnet18, stride 4)."""

    def __init__(self, output_dim=128):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3)
        self.bn1 = nn.BatchNorm2d(64)
        self.layer1 = nn.Sequential(
            MatchingBasicBlock(64, 64), MatchingBasicBlock(64, 64)
        )
        self.layer2 = nn.Sequential(
            MatchingBasicBlock(64, 128, stride=2), MatchingBasicBlock(128, 128)
        )
        self.final_conv_3ddet = nn.Conv2d(128, output_dim, 1)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.layer1(x)
        x = self.layer2(x)
        return self.final_conv_3ddet(x)


class ConvBnReLU2D(nn.Module):
    def __init__(self, cin, cout, k=3, stride=1, pad=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride, pad, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class SimpleUnet2D(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.conv1 = ConvBnReLU2D(cin, 2 * cin, stride=2)
        self.conv2 = ConvBnReLU2D(2 * cin, 2 * cin)
        self.conv3 = ConvBnReLU2D(2 * cin, 4 * cin, stride=2)
        self.conv4 = ConvBnReLU2D(4 * cin, 4 * cin)
        self.conv9 = nn.Sequential(
            nn.ConvTranspose2d(4 * cin, 2 * cin, 3, 2, 1, output_padding=1,
                               bias=False),
            nn.BatchNorm2d(2 * cin), nn.ReLU(inplace=True),
        )
        self.conv11 = nn.Sequential(
            nn.ConvTranspose2d(2 * cin, cin, 3, 2, 1, output_padding=1,
                               bias=False),
            nn.BatchNorm2d(cin), nn.ReLU(inplace=True),
        )

    def forward(self, x):
        c0 = x
        c2 = self.conv2(self.conv1(c0))
        x = self.conv4(self.conv3(c2))
        x = c2 + self.conv9(x)
        return c0 + self.conv11(x)


def closest_frame_ids(n, k):
    """depth_est_fusion.py:53-63 temporal neighbor ids."""
    main = torch.arange(n).unsqueeze(1)
    offs = torch.cat(
        [torch.arange(-k // 2, 0), torch.arange(1, k // 2 + 1)]
    ).unsqueeze(0)
    ids = main + offs
    ids[: k // 2] = ids[: k // 2] + k // 2 + 1
    ids[n - k // 2:] = ids[n - k // 2:] - k // 2 - 1
    return ids


def homo_warp(src_fea, src_proj, ref_proj, depth_values):
    """depth_est_fusion.py:85-126 plane-sweep warp."""
    b, c, h, w = src_fea.shape
    nd = depth_values.shape[1]
    proj = torch.matmul(src_proj, torch.inverse(ref_proj))
    rot, trans = proj[:, :3, :3], proj[:, :3, 3:4]
    y, x = torch.meshgrid(
        torch.arange(h, dtype=torch.float32),
        torch.arange(w, dtype=torch.float32), indexing="ij",
    )
    xyz = torch.stack([x.reshape(-1), y.reshape(-1),
                       torch.ones(h * w)])[None].repeat(b, 1, 1)
    rd = torch.matmul(rot, xyz)[:, :, None] * depth_values.view(b, 1, nd, 1)
    pxyz = rd + trans.view(b, 3, 1, 1)
    pxy = pxyz[:, :2] / pxyz[:, 2:3]
    gx = pxy[:, 0] / ((w - 1) / 2) - 1
    gy = pxy[:, 1] / ((h - 1) / 2) - 1
    grid = torch.stack([gx, gy], dim=3).view(b, nd * h, w, 2)
    # the reference omits align_corners (torch default False) while using
    # (S-1)/2 normalization — reproduce exactly
    warped = F.grid_sample(src_fea, grid, mode="bilinear",
                           padding_mode="zeros", align_corners=False)
    return warped.view(b, c, nd, h, w)


class DepthNetFusion(nn.Module):
    """depth_est_fusion.py DepthNet_Fusion, single scene (B=1), inputs
    pre-resolved: x (N,Cmono,H,W) FPN feats, img (N,3,Hi,Wi),
    w2c (N,4,4), feat_intr (4,4) intrinsics at feature resolution."""

    def __init__(self, dbound, neighbor_img_num=2, mono_channels=256):
        super().__init__()
        self.dbound = dbound
        self.k = neighbor_img_num
        self.depth_channels = round((dbound[1] - dbound[0]) / dbound[2])
        self.fnet_mvs = MatchingExtractor(output_dim=128)
        self.correlation_regulation = SimpleUnet2D(self.depth_channels)
        self.fnet_mono = ConvBnReLU2D(mono_channels, 128)
        self.mono_regulation = SimpleUnet2D(128)
        self.fusion_regulation = SimpleUnet2D(self.depth_channels + 128)
        self.depth_reg = nn.Conv2d(self.depth_channels + 128,
                                   self.depth_channels, 3, 1, 1)

    def forward(self, x, img, w2c, feat_intr):
        n = x.shape[0]
        f_mvs = self.fnet_mvs(img)
        ch = f_mvs.shape[1]
        k = min(self.k, n - 1)
        ids = closest_frame_ids(n, k)
        proj = torch.matmul(feat_intr[None].repeat(n, 1, 1), w2c)
        dvals = torch.arange(
            self.dbound[0], self.dbound[1], self.dbound[2]
        ).float() + self.dbound[2] / 2
        dvals = dvals[None].repeat(n, 1)
        corr = torch.zeros((n, self.depth_channels) + f_mvs.shape[2:])
        for j in range(k):
            nei = ids[:, j]
            warped = homo_warp(f_mvs[nei], proj[nei], proj, dvals)
            corr = corr + (warped * f_mvs.unsqueeze(2)).sum(1) / math.sqrt(ch)
        corr = corr / k
        cost_reg = self.correlation_regulation(corr)
        mono_reg = self.mono_regulation(self.fnet_mono(x))
        pv = self.fusion_regulation(torch.cat([cost_reg, mono_reg], dim=1))
        return F.softmax(self.depth_reg(pv), dim=1)


# ---------------------------------------------------------------------------
# 3D neck + ScanNet head
# ---------------------------------------------------------------------------


class BasicBlock3dV2(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.stride = stride
        self.conv1 = nn.Conv3d(cin, cout, 3, stride, 1, bias=False)
        self.norm1 = nn.BatchNorm3d(cout)
        self.conv2 = nn.Conv3d(cout, cout, 3, 1, 1, bias=False)
        self.norm2 = nn.BatchNorm3d(cout)
        if stride != 1:
            self.downsample = nn.Sequential(
                nn.Conv3d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm3d(cout),
            )

    def forward(self, x):
        idt = x if self.stride == 1 else self.downsample(x)
        y = F.relu(self.norm1(self.conv1(x)))
        y = self.norm2(self.conv2(y))
        return F.relu(y + idt)


class FastIndoorImVoxelNeck(nn.Module):
    def __init__(self, in_channels, n_blocks, out_channels):
        super().__init__()
        self.n_scales = len(n_blocks)
        ch = in_channels
        for i, nb in enumerate(n_blocks):
            stride = 1 if i == 0 else 2
            blocks = []
            for b in range(nb):
                if b == 0 and stride != 1:
                    blocks.append(BasicBlock3dV2(ch, ch * 2, stride))
                    ch = ch * 2
                else:
                    blocks.append(BasicBlock3dV2(ch, ch))
            setattr(self, f"down_layer_{i}", nn.Sequential(*blocks))
            if i > 0:
                setattr(self, f"up_block_{i}", nn.Sequential(
                    nn.ConvTranspose3d(ch, ch // 2, 2, 2, bias=False),
                    nn.BatchNorm3d(ch // 2), nn.ReLU(inplace=True),
                    nn.Conv3d(ch // 2, ch // 2, 3, 1, 1, bias=False),
                    nn.BatchNorm3d(ch // 2), nn.ReLU(inplace=True),
                ))
            setattr(self, f"out_block_{i}", nn.Sequential(
                nn.Conv3d(ch, out_channels, 3, 1, 1, bias=False),
                nn.BatchNorm3d(out_channels), nn.ReLU(inplace=True),
            ))

    def forward(self, x):
        downs = []
        for i in range(self.n_scales):
            x = getattr(self, f"down_layer_{i}")(x)
            downs.append(x)
        outs = []
        for i in range(self.n_scales - 1, -1, -1):
            if i < self.n_scales - 1:
                x = getattr(self, f"up_block_{i + 1}")(x)
                x = downs[i] + x
            outs.append(getattr(self, f"out_block_{i}")(x))
        return outs[::-1]


class Scale(nn.Module):
    def __init__(self, value=1.0):
        super().__init__()
        self.scale = nn.Parameter(torch.tensor(value))

    def forward(self, x):
        return x * self.scale


class ScanNetHead(nn.Module):
    """ScanNetImVoxelHeadV2 conv heads + exp(scale*reg) decode."""

    def __init__(self, n_channels, n_classes, n_reg_outs, n_scales):
        super().__init__()
        self.centerness_conv = nn.Conv3d(n_channels, 1, 3, padding=1, bias=False)
        self.reg_conv = nn.Conv3d(n_channels, n_reg_outs, 3, padding=1, bias=False)
        self.cls_conv = nn.Conv3d(n_channels, n_classes, 3, padding=1)
        self.scales = nn.ModuleList([Scale(1.0) for _ in range(n_scales)])

    def forward(self, xs):
        outs = []
        for x, scale in zip(xs, self.scales):
            outs.append((
                self.centerness_conv(x),
                torch.exp(scale(self.reg_conv(x))),
                self.cls_conv(x),
            ))
        return outs
