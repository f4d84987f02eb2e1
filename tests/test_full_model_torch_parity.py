"""Full-model numerical parity vs a PyTorch transcription of the reference.

Random torch weights (+ randomized BN running stats) are converted through
``convert_torch_state_dict`` and the flax rebuild must reproduce the torch
forward end-to-end on the CUDA-free subgraph (VERDICT round-1 item 4):

  A. backbone -> FPN -> DepthNet_Fusion   (2D trunk + depth distributions)
  B. volume -> FastIndoorImVoxelNeck -> ScanNet head (3D trunk)

The lifting in between is covered by the op-level oracles
(tests/test_dfa3d_fast.py, tests/test_dfa3d_pallas.py, tests/test_ops_msda.py).
Any converter naming/transpose drift or layer-semantics drift (padding, BN
eps, upsample convention, plane-sweep warp, exp-scale decode) fails here.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sgcdet_tpu.models.depth_net import DepthNetFusion as FlaxDepthNet
from sgcdet_tpu.models.det_head import ImVoxelHead
from sgcdet_tpu.models.fpn import FPN as FlaxFPN
from sgcdet_tpu.models.neck3d import FastIndoorImVoxelNeck as FlaxNeck3D
from sgcdet_tpu.models.resnet import ResNet
from sgcdet_tpu.train.checkpoint import convert_torch_state_dict

from torch_ref_sgcdet import (
    DepthNetFusion as TorchDepthNet,
    FastIndoorImVoxelNeck as TorchNeck3D,
    FPN as TorchFPN,
    ResNet50 as TorchResNet50,
    ScanNetHead as TorchScanNetHead,
)

torch.manual_seed(0)


def _randomize_bn_stats(mod):
    """Random running stats so stat conversion errors can't hide."""
    g = torch.Generator().manual_seed(7)
    for m in mod.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.2)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.7)


def _to_np_sd(mod, prefix):
    return {f"{prefix}.{k}": v.detach().numpy() for k, v in mod.state_dict().items()}


@pytest.fixture(scope="module")
def trunk_parity_setup():
    """Torch trunk (backbone+FPN+depth net) + converted flax params."""
    n, hi, wi = 6, 96, 128
    dbound = (0.2, 5.0, 0.4)

    t_backbone = TorchResNet50().eval()
    t_fpn = TorchFPN(out_channels=256).eval()
    t_depth = TorchDepthNet(dbound, neighbor_img_num=2, mono_channels=256).eval()
    for m in (t_backbone, t_fpn, t_depth):
        _randomize_bn_stats(m)

    sd = {}
    sd.update(_to_np_sd(t_backbone, "backbone"))
    sd.update(_to_np_sd(t_fpn, "neck"))
    sd.update(_to_np_sd(t_depth, "depth_head"))

    imgs = torch.randn(n, 3, hi, wi)
    # plausible camera geometry: intrinsics + small camera motion
    intr = torch.eye(4)
    intr[0, 0] = intr[1, 1] = 60.0
    intr[0, 2], intr[1, 2] = wi / 8, hi / 8  # feature-res (stride 4) center
    w2c = torch.eye(4)[None].repeat(n, 1, 1)
    g = torch.Generator().manual_seed(3)
    w2c[:, :3, 3] = torch.randn(n, 3, generator=g) * 0.2
    return dict(n=n, hi=hi, wi=wi, dbound=dbound, sd=sd, imgs=imgs,
                intr=intr, w2c=w2c, t_backbone=t_backbone, t_fpn=t_fpn,
                t_depth=t_depth)


def test_trunk_backbone_fpn_depth_parity(trunk_parity_setup):
    s = trunk_parity_setup
    n, dbound = s["n"], s["dbound"]
    imgs_j = jnp.asarray(s["imgs"].numpy())

    backbone = ResNet(depth=50)
    fpn = FlaxFPN(out_channels=256)
    depth = FlaxDepthNet(dbound=dbound, neighbor_img_num=2, mono_channels=256)

    vb = backbone.init(jax.random.PRNGKey(0), imgs_j)
    feats0 = backbone.apply(vb, imgs_j)
    vf = fpn.init(jax.random.PRNGKey(1), feats0)
    fpn_out0 = fpn.apply(vf, feats0)
    proj_feat = jnp.asarray((s["intr"] @ s["w2c"]).numpy())
    vd = depth.init(jax.random.PRNGKey(2), fpn_out0[0], imgs_j, proj_feat)

    params = {"backbone": vb["params"], "neck": vf["params"],
              "depth_head": vd["params"]}
    stats = {"backbone": vb.get("batch_stats", {}),
             "neck": vf.get("batch_stats", {}),
             "depth_head": vd.get("batch_stats", {})}
    params, stats = convert_torch_state_dict(s["sd"], params, stats)

    # torch forward
    with torch.no_grad():
        t_feats = s["t_backbone"](s["imgs"])
        t_fpn_out = s["t_fpn"](t_feats)
        t_dpt = s["t_depth"](t_fpn_out[0], s["imgs"], s["w2c"], s["intr"])

    # flax forward with converted weights
    feats = backbone.apply(
        {"params": params["backbone"], "batch_stats": stats["backbone"]}, imgs_j)
    fpn_out = fpn.apply({"params": params["neck"]}, feats)
    dpt = depth.apply(
        {"params": params["depth_head"], "batch_stats": stats["depth_head"]},
        fpn_out[0], imgs_j, proj_feat)

    for lvl in range(4):
        a, b = np.asarray(fpn_out[lvl]), t_fpn_out[lvl].numpy()
        scale = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() < 2e-4 * scale, f"FPN level {lvl}"
    a, b = np.asarray(dpt), t_dpt.numpy()
    assert np.abs(a - b).max() < 5e-4, "depth distributions"


def test_neck3d_and_head_parity():
    c_in, c_out, n_classes, n_reg = 64, 32, 5, 6
    vol = torch.randn(1, c_in, 12, 12, 8)

    t_neck = TorchNeck3D(c_in, (1, 1, 1), c_out).eval()
    t_head = TorchScanNetHead(c_out, n_classes, n_reg, 3).eval()
    _randomize_bn_stats(t_neck)
    with torch.no_grad():
        for i, sc in enumerate(t_head.scales):
            sc.scale.fill_(0.8 + 0.2 * i)
    sd = {}
    sd.update(_to_np_sd(t_neck, "neck_3d"))
    sd.update(_to_np_sd(t_head, "bbox_head"))

    neck = FlaxNeck3D(out_channels=c_out, n_blocks=(1, 1, 1))
    head = ImVoxelHead(n_classes=n_classes, n_reg_outs=n_reg, n_scales=3,
                       head_type="scannet")
    vol_j = jnp.asarray(vol.numpy())
    vn = neck.init(jax.random.PRNGKey(0), vol_j)
    neck_out0 = neck.apply(vn, vol_j)
    vh = head.init(jax.random.PRNGKey(1), neck_out0)

    params = {"neck_3d": vn["params"], "bbox_head": vh["params"]}
    stats = {"neck_3d": vn.get("batch_stats", {}), "bbox_head": {}}
    params, stats = convert_torch_state_dict(sd, params, stats)

    with torch.no_grad():
        t_outs = t_head(t_neck(vol))

    neck_out = neck.apply(
        {"params": params["neck_3d"], "batch_stats": stats["neck_3d"]}, vol_j)
    outs = head.apply({"params": params["bbox_head"]}, neck_out)

    for lvl, ((c_j, r_j, k_j), (c_t, r_t, k_t)) in enumerate(zip(outs, t_outs)):
        for name, a, b in [("centerness", c_j, c_t), ("reg", r_j, r_t),
                           ("cls", k_j, k_t)]:
            a = np.asarray(a)[0]
            b = b.numpy()[0]
            scale = max(np.abs(b).max(), 1e-3)
            assert np.abs(a - b).max() < 2e-4 * scale, f"{name} level {lvl}"
