"""Anchor-free FCOS-style 3D detection head.

Rebuild of ImVoxelHeadV2 / ScanNetImVoxelHeadV2 / SunRgbdImVoxelHeadV2
(/root/reference/mmdet3d_plugin/models/dense_heads/imvoxel_head_v2.py:42-614):
per-scale 3x3x3 conv heads (centerness / distance regression with a learned
exp scale / classification), FCOS target assignment (inside-box, best-scale by
>=limit points, per-box centerness top-k), three masked losses, and host-side
decode + NMS.

TPU re-expression: target assignment is fully vectorized jnp over a *padded*
static GT set (gt_mask marks real boxes) so the whole train step jits; decode
(top-k + greedy NMS) runs on host NumPy over the fetched head outputs.
"""
from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..geometry.boxes import rotation_3d_in_axis
from ..geometry.voxel_grid import voxel_centers_zero_origin
from ..ops.nms import aligned_3d_nms, box3d_multiclass_nms
from .layers import Conv, bias_init_with_prob, normal_init
from .losses import (
    axis_aligned_iou_loss,
    bce_with_logits,
    rotated_iou_loss,
    sigmoid_focal_loss,
)


class ImVoxelHead(nn.Module):
    n_classes: int = 18
    n_reg_outs: int = 6
    n_scales: int = 3
    head_type: str = "scannet"  # 'scannet' | 'sunrgbd'

    @nn.compact
    def __call__(self, xs):
        """xs: list of (B, C, X, Y, Z) finest-first. Returns per-scale
        (centerness (B,1,...), bbox_pred (B,R,...), cls_score (B,nc,...))."""
        # conv heads are SHARED across scales; only the exp-scale differs
        # (imvoxel_head_v2.py:75-88)
        centerness_conv = Conv(
            1, 3, 1, 1, use_bias=False, ndim=3,
            kernel_init=normal_init(0.01), name="centerness_conv",
        )
        reg_conv = Conv(
            self.n_reg_outs, 3, 1, 1, use_bias=False, ndim=3,
            kernel_init=normal_init(0.01), name="reg_conv",
        )
        cls_conv = Conv(
            self.n_classes, 3, 1, 1, ndim=3,
            kernel_init=normal_init(0.01),
            bias_init=bias_init_with_prob(0.01), name="cls_conv",
        )
        outs = []
        for i, x in enumerate(xs):
            centerness = centerness_conv(x)
            reg = reg_conv(x)
            scale = self.param(f"scale{i}", nn.initializers.ones, ())
            if self.head_type == "scannet":
                bbox_pred = jnp.exp(scale * reg)
            else:
                bbox_pred = jnp.concatenate(
                    [jnp.exp(scale * reg[:, :6]), reg[:, 6:]], axis=1
                )
            cls = cls_conv(x)
            outs.append((centerness, bbox_pred, cls))
        return outs


# ---------------------------------------------------------------------------
# target assignment (pure functions, jit-friendly)
# ---------------------------------------------------------------------------


def head_points(featmap_sizes, voxel_size, origin):
    """Multi-scale voxel-center points (concat) + per-point scale ids.

    featmap_sizes: static list of (X, Y, Z); voxel_size: finest (3,);
    origin: (3,) jnp (dynamic — RandomShiftOrigin moves it per scene).
    Returns points (P, 3), scales (P,) int32, level_sizes list[int].
    """
    pts = []
    scales = []
    level_sizes = []
    for i, fs in enumerate(featmap_sizes):
        vs = tuple(v * (2**i) for v in voxel_size)
        base = jnp.asarray(voxel_centers_zero_origin(fs, vs))
        pts.append(base + origin[None])
        scales.append(jnp.full((base.shape[0],), i, jnp.int32))
        level_sizes.append(base.shape[0])
    return jnp.concatenate(pts, 0), jnp.concatenate(scales, 0), level_sizes


def compute_centerness(bbox_targets):
    """sqrt of the product of per-axis min/max distance ratios
    (imvoxel_head_v2.py:335-343); clipped sqrt avoids NaN for outside points
    (reference relies on them being masked later)."""
    x = bbox_targets[..., 0:2]
    y = bbox_targets[..., 2:4]
    z = bbox_targets[..., 4:6]
    r = (
        x.min(-1) / jnp.maximum(x.max(-1), 1e-12)
        * y.min(-1) / jnp.maximum(y.max(-1), 1e-12)
        * z.min(-1) / jnp.maximum(z.max(-1), 1e-12)
    )
    return jnp.sqrt(jnp.clip(r, 0.0, None))


def _best_scale(inside_mask, scales, level_sizes, n_scales, limit):
    """Per-box best scale: smallest scale with >= limit inside points, else the
    coarsest (imvoxel_head_v2.py:391-408)."""
    n_boxes = inside_mask.shape[1]
    counts = []
    start = 0
    for i, sz in enumerate(level_sizes):
        counts.append(inside_mask[start : start + sz].sum(axis=0))
        start += sz
    counts = jnp.stack(counts, axis=0)  # (S, B)
    lower = counts < limit
    extra = jnp.arange(n_scales, 0, -1)[:, None]
    lower_index = jnp.argmax(lower.astype(jnp.int32) * extra, axis=0) - 1
    lower_index = jnp.maximum(lower_index, 0)
    all_upper = jnp.all(~lower, axis=0)
    return jnp.where(all_upper, n_scales - 1, lower_index)  # (B,)


def fcos_targets(points, scales, level_sizes, gt_boxes, gt_labels, gt_mask,
                 n_scales, limit, centerness_topk, yawed: bool):
    """FCOS-style target assignment over padded GT.

    points: (P, 3); gt_boxes: (B, 7) = (gravity-center xyz, dims, yaw);
    gt_labels: (B,) int; gt_mask: (B,) bool (False = padding).
    Returns (centerness_targets (P,), bbox_targets (P, 6|7 decoded),
             labels (P,), geo_occ (P,)).
    """
    float_max = 1e8
    n_points = points.shape[0]
    n_boxes = gt_boxes.shape[0]

    volumes = gt_boxes[:, 3] * gt_boxes[:, 4] * gt_boxes[:, 5]
    volumes = jnp.broadcast_to(volumes[None], (n_points, n_boxes))
    expanded = jnp.broadcast_to(points[:, None, :], (n_points, n_boxes, 3))
    centers = gt_boxes[None, :, :3]

    if yawed:
        shift = (expanded - centers).transpose(1, 0, 2)  # (B, P, 3)
        shift = rotation_3d_in_axis(shift, -gt_boxes[:, 6], axis=2).transpose(1, 0, 2)
        local = centers + shift
    else:
        local = expanded

    half = gt_boxes[None, :, 3:6] / 2
    d_min = local - (centers - half)  # (P, B, 3): dist to min faces
    d_max = (centers + half) - local
    bbox_targets6 = jnp.stack(
        [d_min[..., 0], d_max[..., 0], d_min[..., 1], d_max[..., 1],
         d_min[..., 2], d_max[..., 2]], axis=-1,
    )  # (P, B, 6)

    inside = (bbox_targets6.min(-1) > 0) & gt_mask[None, :]

    best_scale = _best_scale(inside, scales, level_sizes, n_scales, limit)
    inside_best = best_scale[None, :] == scales[:, None]

    centerness = compute_centerness(bbox_targets6)
    centerness = jnp.where(inside, centerness, -1.0)
    centerness = jnp.where(inside_best, centerness, -1.0)
    top_c = jax.lax.top_k(centerness.T, centerness_topk + 1)[0][:, -1]  # (B,)
    inside_top = centerness > top_c[None, :]

    vol = jnp.where(inside, volumes, float_max)
    vol = jnp.where(inside_best, vol, float_max)
    vol = jnp.where(inside_top, vol, float_max)
    min_area = vol.min(axis=1)
    min_inds = vol.argmin(axis=1)

    labels = jnp.take(gt_labels, min_inds)
    labels = jnp.where(min_area == float_max, -1, labels)
    tgt6 = jnp.take_along_axis(bbox_targets6, min_inds[:, None, None], axis=1)[:, 0]
    centerness_targets = compute_centerness(tgt6)
    geo_occ = inside.any(axis=1)

    if yawed:
        sel_boxes = jnp.take(gt_boxes, min_inds, axis=0)  # (P, 7) targets
        return centerness_targets, sel_boxes, labels, geo_occ
    # ScanNet: corner-form target boxes (x1y1z1x2y2z2)
    corner = jnp.stack(
        [
            points[:, 0] - tgt6[:, 0],
            points[:, 1] - tgt6[:, 2],
            points[:, 2] - tgt6[:, 4],
            points[:, 0] + tgt6[:, 1],
            points[:, 1] + tgt6[:, 3],
            points[:, 2] + tgt6[:, 5],
        ],
        axis=-1,
    )
    return centerness_targets, corner, labels, geo_occ


def bbox_pred_to_corner(points, pred):
    """ScanNet decode: distances -> corner boxes (imvoxel_head_v2.py:456-464)."""
    return jnp.stack(
        [
            points[:, 0] - pred[:, 0],
            points[:, 1] - pred[:, 2],
            points[:, 2] - pred[:, 4],
            points[:, 0] + pred[:, 1],
            points[:, 1] + pred[:, 3],
            points[:, 2] + pred[:, 5],
        ],
        axis=-1,
    )


def bbox_pred_to_yawed(points, pred):
    """SunRGBD decode: rotated distances -> (center, size, yaw)
    (imvoxel_head_v2.py:595-614)."""
    shift = jnp.stack(
        [
            (pred[:, 1] - pred[:, 0]) / 2,
            (pred[:, 3] - pred[:, 2]) / 2,
            (pred[:, 5] - pred[:, 4]) / 2,
        ],
        axis=-1,
    )[:, None, :]
    shift = rotation_3d_in_axis(shift, pred[:, 6], axis=2)[:, 0, :]
    center = points + shift
    size = jnp.stack(
        [pred[:, 0] + pred[:, 1], pred[:, 2] + pred[:, 3], pred[:, 4] + pred[:, 5]],
        axis=-1,
    )
    return jnp.concatenate([center, size, pred[:, 6:7]], axis=-1)


def head_loss_single(head_outs, valids_flat, points, scales, level_sizes,
                     gt_boxes, gt_labels, gt_mask, cfg, axis_name=None):
    """Losses for one scene.

    head_outs: per-scale tuples of (centerness (1,...), bbox_pred, cls_score)
      already indexed to this scene (no batch dim).
    valids_flat: (P,) bool. Returns (loss_centerness, loss_bbox, loss_cls,
      labels (P,), geo_occ (P,), n_pos).
    """
    yawed = cfg.head_type == "sunrgbd"
    n_classes = cfg.n_classes

    flat_centerness = jnp.concatenate(
        [h[0].transpose(1, 2, 3, 0).reshape(-1) for h in head_outs]
    )
    flat_bbox = jnp.concatenate(
        [h[1].transpose(1, 2, 3, 0).reshape(-1, h[1].shape[0]) for h in head_outs]
    )
    flat_cls = jnp.concatenate(
        [h[2].transpose(1, 2, 3, 0).reshape(-1, n_classes) for h in head_outs]
    )

    centerness_t, bbox_t, labels, geo_occ = fcos_targets(
        points, scales, level_sizes, gt_boxes, gt_labels, gt_mask,
        cfg.n_scales, cfg.limit, cfg.centerness_topk, yawed,
    )

    pos = (labels >= 0) & valids_flat
    n_pos = pos.sum().astype(jnp.float32)
    # the reference averages the positive count across data-parallel ranks
    # (reduce_mean, imvoxel_head_v2.py:207) before using it as avg_factor
    n_pos_avg = jax.lax.pmean(n_pos, axis_name) if axis_name else n_pos
    avg = jnp.maximum(n_pos_avg, 1.0)

    loss_cls = sigmoid_focal_loss(flat_cls, labels, n_classes, valids_flat, avg)
    loss_centerness = bce_with_logits(flat_centerness, centerness_t, pos, avg)

    posf = pos.astype(jnp.float32)
    weight = centerness_t * posf
    if yawed:
        decoded = bbox_pred_to_yawed(points, flat_bbox)
        loss_bbox = rotated_iou_loss(decoded, bbox_t, weight, weight.sum())
    else:
        decoded = bbox_pred_to_corner(points, flat_bbox)
        loss_bbox = axis_aligned_iou_loss(decoded, bbox_t, weight, weight.sum())
    return loss_centerness, loss_bbox, loss_cls, labels, geo_occ, n_pos


# ---------------------------------------------------------------------------
# host-side decode (NumPy)
# ---------------------------------------------------------------------------


def _trilinear_resize_np(x, size):
    """torch F.interpolate trilinear align_corners=False on (C, X, Y, Z)."""
    out = x
    for axis, new_s in enumerate(size):
        s = out.shape[axis + 1]
        if new_s == s:
            continue
        src = np.clip((np.arange(new_s) + 0.5) * (s / new_s) - 0.5, 0.0, None)
        lo = np.clip(np.floor(src).astype(np.int64), 0, s - 1)
        hi = np.clip(lo + 1, 0, s - 1)
        w = (src - lo).astype(np.float32)
        a = np.take(out, lo, axis=axis + 1)
        b = np.take(out, hi, axis=axis + 1)
        shape = [1] * out.ndim
        shape[axis + 1] = new_s
        out = a * (1 - w.reshape(shape)) + b * w.reshape(shape)
    return out


def decode_bboxes(head_outs, valid, origin, voxel_size, cfg):
    """Decode one scene's detections on host.

    head_outs: per-scale (centerness (1,...), bbox_pred (R,...), cls (nc,...))
      NumPy arrays; valid: (X, Y, Z) float; origin: (3,).
    Returns (boxes (M, 6|7), scores (M,), labels (M,)) NumPy.
    ScanNet boxes are returned as (cx, cy, cz, dx, dy, dz) with z at the
    *geometric center* — callers construct DepthBoxes3D(..., origin=(.5,.5,.5))
    which shifts z down to the stored bottom-center convention, exactly
    matching the reference decode (imvoxel_head_v2.py:445-453).
    """
    yawed = cfg.head_type == "sunrgbd"
    t = cfg.test_cfg
    mlvl_bboxes, mlvl_scores = [], []
    for i, (centerness, bbox_pred, cls_score) in enumerate(head_outs):
        fs = centerness.shape[-3:]
        vs = tuple(v * (2**i) for v in voxel_size)
        points = voxel_centers_zero_origin(fs, vs) + np.asarray(origin)[None]
        v = _trilinear_resize_np(valid[None].astype(np.float32), fs)[0]
        v = np.round(v).astype(bool).transpose(0, 1, 2).reshape(-1)

        c = 1 / (1 + np.exp(-centerness.transpose(1, 2, 3, 0).reshape(-1)))
        b = bbox_pred.transpose(1, 2, 3, 0).reshape(-1, bbox_pred.shape[0])
        s = 1 / (1 + np.exp(-cls_score.transpose(1, 2, 3, 0).reshape(-1, cls_score.shape[0])))
        s = s * c[:, None] * v[:, None]
        max_scores = s.max(axis=1)
        if len(s) > t.nms_pre > 0:
            ids = np.argpartition(-max_scores, t.nms_pre - 1)[: t.nms_pre]
            b, s, points = b[ids], s[ids], points[ids]
        if yawed:
            boxes = np.asarray(bbox_pred_to_yawed(jnp.asarray(points), jnp.asarray(b)))
        else:
            boxes = np.asarray(bbox_pred_to_corner(jnp.asarray(points), jnp.asarray(b)))
        mlvl_bboxes.append(boxes)
        mlvl_scores.append(s)

    bboxes = np.concatenate(mlvl_bboxes)
    scores = np.concatenate(mlvl_scores)

    if yawed:
        padding = np.zeros((scores.shape[0], 1), scores.dtype)
        scores_bg = np.concatenate([scores, padding], axis=1)
        bev = np.stack(
            [
                bboxes[:, 0] - bboxes[:, 3] / 2,
                bboxes[:, 1] - bboxes[:, 4] / 2,
                bboxes[:, 0] + bboxes[:, 3] / 2,
                bboxes[:, 1] + bboxes[:, 4] / 2,
                bboxes[:, 6],
            ],
            axis=1,
        )
        out_boxes, out_scores, out_labels = box3d_multiclass_nms(
            bboxes, bev, scores_bg, t.score_thr, t.nms_pre, t.nms_thr,
            use_rotate_nms=t.use_rotate_nms,
        )
        return out_boxes, out_scores, out_labels

    labels = scores.argmax(axis=1)
    max_scores = scores.max(axis=1)
    ids = max_scores > t.score_thr
    bboxes, max_scores, labels = bboxes[ids], max_scores[ids], labels[ids]
    keep = aligned_3d_nms(bboxes, max_scores, labels, t.iou_thr)
    bboxes = bboxes[keep]
    center_form = np.stack(
        [
            (bboxes[:, 0] + bboxes[:, 3]) / 2,
            (bboxes[:, 1] + bboxes[:, 4]) / 2,
            (bboxes[:, 2] + bboxes[:, 5]) / 2,
            bboxes[:, 3] - bboxes[:, 0],
            bboxes[:, 4] - bboxes[:, 1],
            bboxes[:, 5] - bboxes[:, 2],
        ],
        axis=1,
    )
    return center_form, max_scores[keep], labels[keep]
