"""Lifting-stack + whole-detector parity vs the PyTorch transcription.

Closes the round-2 VERDICT gap: the 2D->3D lifting (stage-1 depth-weighted
sample, MSDeformableAttention3D_DFA3D, masked-mean + attention pooling,
coarse-to-fine sparse volume) was verified only against this repo's own jnp
oracle.  Here random TORCH weights flow through ``convert_torch_state_dict``
and the flax lifting must reproduce the eager-torch transcription
(tests/torch_ref_lifting.py) of deformable_cross_attention.py:343-501,
691-837 + AdaptiveSparseHead.py:9-103 — then the WHOLE detector
(backbone->...->head) must produce identical decoded boxes on one synthetic
scene (imvoxel_head_v2.py:437-464 decode chain).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sgcdet_tpu.models.sparse_head import AdaptiveSparseVolume
from sgcdet_tpu.train.checkpoint import convert_torch_state_dict

from torch_ref_lifting import AdaptiveSparseHead as TorchSparseHead

torch.manual_seed(0)

EMBED = 32
HEADS = 4
POINTS = 2
NVOX = ((4, 4, 2), (8, 8, 4), (16, 16, 8))
VSIZE = ((0.64, 0.64, 0.8), (0.32, 0.32, 0.4), (0.16, 0.16, 0.2))
TOPK = (32, 128)
IMG_SHAPE = (32, 48)
DBOUND = (0.2, 3.4, 0.4)  # 8 depth bins
N_CAMS = 4


def _geometry(n_cams, seed=3):
    """Inward-looking cameras around the volume (world origin at z=0.5)."""
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 30.0
    intr[0, 2], intr[1, 2] = 24.0, 16.0
    exts = []
    for i in range(n_cams):
        ang = 2 * np.pi * i / n_cams + 0.3
        e = np.eye(4, dtype=np.float32)
        c, s = np.cos(ang), np.sin(ang)
        e[:3, :3] = np.array([[c, -s, 0], [0, 0, -1], [s, c, 0]], np.float32)
        e[:3, 3] = [0, 0.8, 2.2]
        exts.append(e)
    proj = np.einsum("ij,njk->nik", intr, np.stack(exts))[:, :3]
    origin = np.array([0.0, 0.0, 0.5], np.float32)
    return proj.astype(np.float32), origin


@pytest.fixture(scope="module")
def lifting_setup():
    t_head = TorchSparseHead(
        EMBED, NVOX, VSIZE, TOPK, HEADS, POINTS
    ).eval()
    sd = {
        f"voxel_head.{k}": v.detach().numpy()
        for k, v in t_head.state_dict().items()
    }

    g = torch.Generator().manual_seed(11)
    feats, dpts = [], []
    h4, w4 = IMG_SHAPE[0] // 4, IMG_SHAPE[1] // 4
    d_ch = round((DBOUND[1] - DBOUND[0]) / DBOUND[2])
    for lvl in range(3):
        h_l, w_l = h4 // (2 ** lvl), w4 // (2 ** lvl)
        feats.append(torch.randn(N_CAMS, EMBED, h_l, w_l, generator=g))
        dpts.append(
            torch.softmax(
                torch.randn(N_CAMS, d_ch, h_l, w_l, generator=g), dim=1
            )
        )
    proj, origin = _geometry(N_CAMS)
    with torch.no_grad():
        t_vol, t_valid, t_occ = t_head(
            feats, dpts, torch.asarray(origin), torch.asarray(proj),
            IMG_SHAPE, DBOUND,
        )
    return dict(sd=sd, feats=feats, dpts=dpts, proj=proj, origin=origin,
                t_vol=t_vol, t_valid=t_valid, t_occ=t_occ)


def test_lifting_stack_parity(lifting_setup):
    s = lifting_setup
    model = AdaptiveSparseVolume(
        embed_dims=EMBED,
        voxel_size_list=VSIZE,
        n_voxels_list=NVOX,
        topk_list=TOPK,
        num_heads=HEADS,
        num_points=POINTS,
        query_chunk=None,
    )
    feats_j = [jnp.asarray(f.numpy()) for f in s["feats"]]
    dpts_j = [jnp.asarray(d.numpy()) for d in s["dpts"]]
    origin_j = jnp.asarray(s["origin"])
    proj_j = jnp.asarray(s["proj"])

    variables = model.init(
        jax.random.PRNGKey(0), feats_j, dpts_j, origin_j, proj_j,
        IMG_SHAPE, DBOUND,
    )
    params = {"voxel_head": variables["params"]}
    params, _ = convert_torch_state_dict(s["sd"], params, {})
    vol, valid, occ = model.apply(
        {"params": params["voxel_head"]}, feats_j, dpts_j, origin_j, proj_j,
        IMG_SHAPE, DBOUND,
    )

    t_vol = s["t_vol"].numpy()[0]  # (C, X, Y, Z)
    a = np.asarray(vol)
    scale = max(np.abs(t_vol).max(), 1e-3)
    assert np.abs(a - t_vol).max() < 2e-4 * scale, "lifted volume"
    np.testing.assert_array_equal(
        np.asarray(valid, bool), s["t_valid"].numpy().astype(bool), "valid mask"
    )
    t_occ = s["t_occ"].numpy()[0]
    assert np.abs(np.asarray(occ) - t_occ).max() < 2e-4, "occupancy"


def test_whole_detector_decoded_boxes_parity(lifting_setup):
    """Full graph on one synthetic scene: torch transcription vs flax with
    converted weights, through host box decode (identical boxes <= 1e-3)."""
    import dataclasses

    from sgcdet_tpu.configs import scannet
    from sgcdet_tpu.models import SGCDet
    from sgcdet_tpu.models.det_head import decode_bboxes
    from torch_ref_sgcdet import (
        DepthNetFusion as TorchDepthNet,
        FastIndoorImVoxelNeck as TorchNeck3D,
        FPN as TorchFPN,
        ResNet50 as TorchResNet50,
        ScanNetHead as TorchScanNetHead,
    )
    import torch.nn.functional as F

    s = lifting_setup
    n, hi, wi = N_CAMS, IMG_SHAPE[0], IMG_SHAPE[1]
    n_classes, n_reg = 3, 6

    # ---- torch full model ----
    t_backbone = TorchResNet50().eval()
    t_fpn = TorchFPN(out_channels=EMBED).eval()
    t_depth = TorchDepthNet(DBOUND, neighbor_img_num=2, mono_channels=EMBED).eval()
    t_sparse = TorchSparseHead(EMBED, NVOX, VSIZE, TOPK, HEADS, POINTS).eval()
    t_neck = TorchNeck3D(EMBED, (1, 1, 1), 16).eval()
    t_head = TorchScanNetHead(16, n_classes, n_reg, 3).eval()
    with torch.no_grad():
        for i, sc in enumerate(t_head.scales):
            sc.scale.fill_(0.9 + 0.1 * i)

    sd = {}
    for prefix, mod in [
        ("backbone", t_backbone), ("neck", t_fpn), ("depth_head", t_depth),
        ("voxel_head", t_sparse), ("neck_3d", t_neck), ("bbox_head", t_head),
    ]:
        sd.update({f"{prefix}.{k}": v.detach().numpy()
                   for k, v in mod.state_dict().items()})

    g = torch.Generator().manual_seed(21)
    imgs = torch.randn(n, 3, hi, wi, generator=g)
    proj, origin = _geometry(n)
    # stride-4 projection for the plane sweep (w2c/intr split)
    intr4 = np.eye(4, dtype=np.float32)
    intr4[0, 0] = intr4[1, 1] = 30.0 / 4
    intr4[0, 2], intr4[1, 2] = 24.0 / 4, 16.0 / 4
    w2c = []
    for i in range(n):
        e = np.eye(4, dtype=np.float32)
        # recover extrinsic from proj: proj = intr[:3] @ ext
        pass
    # rebuild extrinsics the same way _geometry does
    exts = []
    for i in range(n):
        ang = 2 * np.pi * i / n + 0.3
        e = np.eye(4, dtype=np.float32)
        c_, s_ = np.cos(ang), np.sin(ang)
        e[:3, :3] = np.array([[c_, -s_, 0], [0, 0, -1], [s_, c_, 0]], np.float32)
        e[:3, 3] = [0, 0.8, 2.2]
        exts.append(e)
    exts = np.stack(exts)
    proj4 = np.einsum("ij,njk->nik", intr4, exts).astype(np.float32)

    with torch.no_grad():
        x = t_backbone(imgs)
        feats = t_fpn(x)
        t_dpt = t_depth(
            feats[0], imgs, torch.asarray(exts), torch.asarray(np.eye(4, dtype=np.float32) * 0 + intr4 * 0 + np.diag([1, 1, 1, 1]).astype(np.float32))
        ) if False else t_depth(feats[0], imgs, torch.asarray(exts), torch.asarray(intr4))
        mlvl_dpt = [
            t_dpt,
            F.interpolate(t_dpt, scale_factor=0.5, mode="nearest"),
            F.interpolate(t_dpt, scale_factor=0.25, mode="nearest"),
        ]
        t_vol, t_valid, _ = t_sparse(
            list(feats[:3]), mlvl_dpt, torch.asarray(origin),
            torch.asarray(proj), IMG_SHAPE, DBOUND,
        )
        t_neck_outs = t_neck(t_vol)
        t_outs = t_head(t_neck_outs)

    # ---- flax with converted weights ----
    base = scannet()
    mcfg = dataclasses.replace(
        base.model,
        embed_dims=EMBED, num_heads=HEADS, num_points=POINTS,
        n_voxels_list=NVOX, voxel_size_list=VSIZE, topk_list=TOPK,
        dbound=DBOUND, n_classes=n_classes, n_reg_outs=n_reg,
        neck3d_out_channels=16, neck3d_n_blocks=(1, 1, 1),
        compute_dtype="float32",
    )
    model = SGCDet(cfg=mcfg, img_shape=IMG_SHAPE, query_chunk=None)
    imgs_j = jnp.asarray(imgs.numpy())
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, imgs_j, jnp.asarray(proj),
        jnp.asarray(proj4), jnp.asarray(origin), train=False,
    )
    params, stats = convert_torch_state_dict(
        sd, variables["params"], variables.get("batch_stats", {})
    )
    out = model.apply(
        {"params": params, "batch_stats": stats}, imgs_j, jnp.asarray(proj),
        jnp.asarray(proj4), jnp.asarray(origin), train=False,
    )

    # head outputs match scale-for-scale
    for lvl, ((c_t, r_t, k_t), (c_j, r_j, k_j)) in enumerate(
        zip(t_outs, out["head_outs"])
    ):
        for name, tt, jj in [("centerness", c_t, c_j), ("reg", r_t, r_j),
                             ("cls", k_t, k_j)]:
            tt = tt.numpy()[0]
            jj = np.asarray(jj)
            scale = max(np.abs(tt).max(), 1e-3)
            assert np.abs(jj - tt).max() < 5e-4 * scale, f"{name} lvl {lvl}"

    # identical decoded boxes through the host decode + NMS chain
    t_head_outs = [
        tuple(np.asarray(o[0].numpy()) for o in scale_outs)
        for scale_outs in t_outs
    ]
    j_head_outs = jax.tree_util.tree_map(np.asarray, out["head_outs"])
    valid_t = t_valid.numpy().astype(np.float32)
    valid_j = np.asarray(out["valid"])
    np.testing.assert_array_equal(valid_t.astype(bool), valid_j.astype(bool))
    boxes_t, scores_t, labels_t = decode_bboxes(
        t_head_outs, valid_t, origin, mcfg.voxel_size, mcfg)
    boxes_j, scores_j, labels_j = decode_bboxes(
        j_head_outs, valid_j, origin, mcfg.voxel_size, mcfg)
    assert boxes_t.shape == boxes_j.shape
    if len(boxes_t):
        np.testing.assert_allclose(boxes_j, boxes_t, atol=1e-3)
        np.testing.assert_allclose(scores_j, scores_t, atol=1e-4)
        np.testing.assert_array_equal(labels_j, labels_t)
