"""SGCDet detector: backbone -> FPN -> depth head -> adaptive sparse volume ->
3D neck -> FCOS3D head (reference orchestration:
/root/reference/mmdet3d_plugin/models/detectors/SGCDet.py:10-135).

The module processes ONE scene (N posed views) per call — exactly the
reference's bs=1-per-GPU regime. Data parallelism shards scenes over the
device mesh; BatchNorm layers sync via `axis_name` (the reference's SyncBN).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from ..configs.config import ModelConfig
from .depth_net import DepthNetFusion, depth_loss as depth_loss_fn, downsample_gt_depth
from .det_head import ImVoxelHead, head_loss_single, head_points
from .fpn import FPN
from .layers import interpolate_linear, interpolate_nearest_size, set_compute_dtype
from .neck3d import FastIndoorImVoxelNeck
from .resnet import ResNet
from .sparse_head import AdaptiveSparseVolume, occ_loss as occ_loss_fn


class SGCDet(nn.Module):
    cfg: ModelConfig
    img_shape: tuple  # static (H, W) of the resized (pre-pad) image
    query_chunk: int | None = 100

    @nn.compact
    def __call__(self, imgs, proj_img, proj_feat4, origin, gt_depth=None, train=False):
        """
        imgs: (N, 3, Hp, Wp) normalized, padded images.
        proj_img: (N, 3, 4) world->pixel at image resolution.
        proj_feat4: (N, 4, 4) K[R|t] at feature stride 4 (for plane sweep).
        origin: (3,) scene origin.
        gt_depth: optional (N, Hp, Wp) metric depth (use_gt_dpt path).

        Returns dict with head_outs (list per scale of (centerness, bbox,
        cls) without batch dim), valid (X, Y, Z), occ_preds, dpt_dist.
        """
        cfg = self.cfg
        set_compute_dtype(cfg.compute_dtype)
        x = ResNet(depth=50, name="backbone")(imgs, train)
        feats = FPN(out_channels=cfg.embed_dims, name="neck")(x)

        if cfg.use_gt_dpt and gt_depth is not None:
            d = downsample_gt_depth(
                gt_depth, 4, cfg.dbound, cfg.depth_channels, cfg.depth_max_tol
            )
            n, _, h4, w4 = feats[0].shape
            dpt_dist = d.reshape(n, h4, w4, cfg.depth_channels).transpose(0, 3, 1, 2)
        else:
            depth_in = jax.lax.stop_gradient(feats[0]) if cfg.depth_loss else feats[0]
            # optional remat (cfg.depth_remat): recompute the depth net in
            # the backward instead of saving its activations — only worth it
            # when activation memory binds (-L / 100-view training); the
            # fused sweep kernels already regather rows in their VJP
            DepthNetRemat = (nn.remat(DepthNetFusion, static_argnums=(4,))
                             if cfg.depth_remat else DepthNetFusion)
            dpt_dist = DepthNetRemat(
                dbound=cfg.dbound,
                neighbor_img_num=cfg.neighbor_img_num,
                mono_channels=cfg.embed_dims,
                sweep_band=cfg.sweep_band,
                name="depth_head",
            )(depth_in, imgs, proj_feat4, train)

        h4, w4 = dpt_dist.shape[-2:]
        mlvl_dpt = [
            dpt_dist,
            interpolate_nearest_size(dpt_dist, (h4 // 2, w4 // 2)),
            interpolate_nearest_size(dpt_dist, (h4 // 4, w4 // 4)),
        ]

        volume, valid, occ_preds = AdaptiveSparseVolume(
            embed_dims=cfg.embed_dims,
            voxel_size_list=cfg.voxel_size_list,
            n_voxels_list=cfg.n_voxels_list,
            topk_list=cfg.topk_list,
            num_heads=cfg.num_heads,
            num_points=cfg.num_points,
            ffn_dropout=cfg.ffn_dropout,
            query_chunk=self.query_chunk,
            visibility_budget=cfg.visibility_budget,
            sort_queries=cfg.sort_queries,
            name="voxel_head",
        )(feats[:3], mlvl_dpt, origin, proj_img, self.img_shape, cfg.dbound, train)

        neck_outs = FastIndoorImVoxelNeck(
            out_channels=cfg.neck3d_out_channels,
            n_blocks=cfg.neck3d_n_blocks,
            name="neck_3d",
        )(volume[None], train)

        head_outs_b = ImVoxelHead(
            n_classes=cfg.n_classes,
            n_reg_outs=cfg.n_reg_outs,
            n_scales=cfg.n_scales,
            head_type=cfg.head_type,
            name="bbox_head",
        )(neck_outs)
        head_outs = [
            tuple(o[0].astype(jnp.float32) for o in scale) for scale in head_outs_b
        ]

        return dict(
            head_outs=head_outs,
            valid=valid.astype(jnp.float32),
            occ_preds=None if occ_preds is None else occ_preds.astype(jnp.float32),
            dpt_dist=dpt_dist.astype(jnp.float32),
        )


def flatten_valids(valid, featmap_sizes):
    """Per-scale trilinear-upsampled valid masks, flattened + concatenated in
    head-point order (imvoxel_head_v2.py:121-123,256-258)."""
    outs = []
    for fs in featmap_sizes:
        v = interpolate_linear(valid[None, None].astype(jnp.float32), fs)[0, 0]
        outs.append(jnp.round(v).astype(bool).reshape(-1))
    return jnp.concatenate(outs)


def compute_losses(cfg: ModelConfig, outputs, origin, gt_boxes, gt_labels,
                   gt_mask, gt_depth=None, axis_name=None):
    """Single-scene total loss dict (SGCDet.forward_train, SGCDet.py:98-113).

    gt_boxes: (B, 7) gravity-center boxes (padded); gt_labels: (B,);
    gt_mask: (B,) bool. Returns (losses dict, n_pos) — n_pos lets the caller
    average the positive count across the data mesh (the reference's
    reduce_mean) and re-invoke with n_pos_avg.
    """
    head_outs = outputs["head_outs"]
    featmap_sizes = [h[0].shape[-3:] for h in head_outs]
    points, scales, level_sizes = head_points(
        featmap_sizes, cfg.voxel_size, origin
    )
    valids_flat = flatten_valids(outputs["valid"], featmap_sizes)
    loss_centerness, loss_bbox, loss_cls, labels, geo_occ, n_pos = head_loss_single(
        head_outs, valids_flat, points, scales, level_sizes,
        gt_boxes, gt_labels, gt_mask, cfg, axis_name=axis_name,
    )
    losses = dict(
        loss_centerness=loss_centerness,
        loss_bbox=loss_bbox,
        loss_cls=loss_cls,
    )
    if cfg.occ_loss and outputs["occ_preds"] is not None:
        losses["loss_occ"] = occ_loss_fn(outputs["occ_preds"], geo_occ)
    if cfg.depth_loss and gt_depth is not None:
        losses["loss_dpt"] = depth_loss_fn(
            gt_depth, outputs["dpt_dist"], cfg.downsample_factor, cfg.dbound,
            cfg.depth_loss_weight, cfg.depth_max_tol,
        )
    return losses, n_pos
