"""Training losses (jnp, masked static-shape versions of the mmdet losses the
reference builds: FocalLoss / CrossEntropyLoss(use_sigmoid) /
AxisAlignedIoULoss / RotatedIoU3DLoss — imvoxel_head_v2.py:50-60,
mmdet3d_plugin/models/losses/)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.boxes import axis_aligned_overlaps_3d
from ..geometry.rotated_iou import rotated_iou_3d


def sigmoid_focal_loss(logits, labels, n_classes, mask, avg_factor,
                       gamma=2.0, alpha=0.25):
    """mmdet-style sigmoid focal loss.

    logits: (P, C); labels: (P,) in [0, C) or -1 for background;
    mask: (P,) bool points to include; avg_factor: scalar.
    """
    target = jax.nn.one_hot(labels, n_classes, dtype=logits.dtype)  # -1 -> zeros
    p = jax.nn.sigmoid(logits)
    pt = (1 - p) * target + p * (1 - target)
    focal_weight = (alpha * target + (1 - alpha) * (1 - target)) * pt**gamma
    ce = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = ce * focal_weight
    loss = jnp.where(mask[:, None], loss, 0.0).sum()
    return loss / jnp.maximum(avg_factor, 1e-6)


def bce_with_logits(logits, targets, mask, avg_factor):
    """CrossEntropyLoss(use_sigmoid=True) of mmdet: per-element BCE summed /
    avg_factor over masked entries."""
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    ce = jnp.where(mask, ce, 0.0).sum()
    return ce / jnp.maximum(avg_factor, 1e-6)


def axis_aligned_iou_loss(pred, target, weight, avg_factor):
    """1 - axis-aligned 3D IoU on corner boxes (x1y1z1x2y2z2), weighted."""
    iou = axis_aligned_overlaps_3d(pred, target, is_aligned=True)
    loss = (1.0 - iou) * weight
    return loss.sum() / jnp.maximum(avg_factor, 1e-6)


def rotated_iou_loss(pred, target, weight, avg_factor):
    """1 - rotated 3D IoU on (x, y, z_center, dx, dy, dz, yaw) boxes."""
    iou = rotated_iou_3d(pred, target, xp=jnp)
    loss = (1.0 - iou) * weight
    return loss.sum() / jnp.maximum(avg_factor, 1e-6)
