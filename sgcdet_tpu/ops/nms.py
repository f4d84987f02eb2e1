"""Host-side (NumPy) 3D NMS used for box decoding.

The reference runs these as CUDA/torch ops
(/root/reference/packages/mmdetection3d/mmdet3d/core/post_processing/
box3d_nms.py:8-178 plus mmcv `nms_rotated`); decode/NMS are sequential and
tiny, so in the TPU rebuild they live on host after the jitted forward —
the greedy loops below match the reference's selection order exactly.
"""
from __future__ import annotations

import numpy as np

from ..geometry.rotated_iou import rotated_rect_iou


def aligned_3d_nms(boxes, scores, classes, thresh):
    """Greedy NMS over axis-aligned corner boxes (n, 6)=(x1,y1,z1,x2,y2,z2).

    IoU is only counted between boxes of the same class (box3d_nms.py:131-178).
    Returns indices of kept boxes, highest score first.
    """
    boxes = np.asarray(boxes, np.float32)
    scores = np.asarray(scores, np.float32)
    classes = np.asarray(classes)
    x1, y1, z1, x2, y2, z2 = (boxes[:, i] for i in range(6))
    area = (x2 - x1) * (y2 - y1) * (z2 - z1)

    order = np.argsort(scores)  # ascending; pick from the back
    pick = []
    while order.size > 0:
        i = order[-1]
        pick.append(int(i))
        rest = order[:-1]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        zz1 = np.maximum(z1[i], z1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        zz2 = np.minimum(z2[i], z2[rest])
        inter = (
            np.maximum(0, xx2 - xx1)
            * np.maximum(0, yy2 - yy1)
            * np.maximum(0, zz2 - zz1)
        )
        iou = inter / (area[i] + area[rest] - inter)
        iou = iou * (classes[rest] == classes[i]).astype(np.float32)
        order = rest[iou <= thresh]
    return np.asarray(pick, np.int64)


def nms_bev(boxes, scores, thresh):
    """Greedy rotated-BEV NMS. boxes (n, 5)=(x1, y1, x2, y2, yaw).

    Matches mmdet3d's ``nms_bev`` (box3d_nms.py:231-267): the corner-form
    input is converted to center form and handed to rotated-rect IoU.
    Assumes scores are already sorted descending is NOT required; sorts here.
    """
    boxes = np.asarray(boxes, np.float32)
    scores = np.asarray(scores, np.float32)
    if len(boxes) == 0:
        return np.zeros((0,), np.int64)
    centered = np.stack(
        [
            (boxes[:, 0] + boxes[:, 2]) / 2,
            (boxes[:, 1] + boxes[:, 3]) / 2,
            boxes[:, 2] - boxes[:, 0],
            boxes[:, 3] - boxes[:, 1],
            boxes[:, 4],
        ],
        axis=-1,
    )
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        rest = order[1:]
        if rest.size == 0:
            break
        ious = rotated_rect_iou(
            np.broadcast_to(centered[i], (rest.size, 5)), centered[rest], xp=np
        )
        order = rest[ious <= thresh]
    return np.asarray(keep, np.int64)


def nms_normal_bev(boxes, scores, thresh):
    """Axis-aligned BEV NMS ignoring rotation (box3d_nms.py:274-290)."""
    boxes = np.asarray(boxes, np.float32)[:, :4]
    scores = np.asarray(scores, np.float32)
    order = np.argsort(-scores, kind="stable")
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1) * (y2 - y1)
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        rest = order[1:]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
        iou = inter / np.maximum(area[i] + area[rest] - inter, 1e-8)
        order = rest[iou <= thresh]
    return np.asarray(keep, np.int64)


def box3d_multiclass_nms(
    mlvl_bboxes,
    mlvl_bboxes_for_nms,
    mlvl_scores,
    score_thr,
    max_num,
    nms_thr,
    use_rotate_nms=True,
):
    """Per-class BEV NMS over (N, box_dim) boxes with (N, C+1) scores.

    Mirrors box3d_nms.box3d_multiclass_nms:8-128 (last score column is the
    dummy background class). Returns (bboxes, scores, labels).
    """
    mlvl_bboxes = np.asarray(mlvl_bboxes, np.float32)
    mlvl_scores = np.asarray(mlvl_scores, np.float32)
    num_classes = mlvl_scores.shape[1] - 1
    nms_func = nms_bev if use_rotate_nms else nms_normal_bev
    bboxes, scores, labels = [], [], []
    for i in range(num_classes):
        cls_inds = mlvl_scores[:, i] > score_thr
        if not cls_inds.any():
            continue
        _scores = mlvl_scores[cls_inds, i]
        _boxes_nms = mlvl_bboxes_for_nms[cls_inds]
        sel = nms_func(_boxes_nms, _scores, nms_thr)
        bboxes.append(mlvl_bboxes[cls_inds][sel])
        scores.append(_scores[sel])
        labels.append(np.full(len(sel), i, np.int64))
    if bboxes:
        bboxes = np.concatenate(bboxes, 0)
        scores = np.concatenate(scores, 0)
        labels = np.concatenate(labels, 0)
        if len(bboxes) > max_num:
            inds = np.argsort(-scores, kind="stable")[:max_num]
            bboxes, scores, labels = bboxes[inds], scores[inds], labels[inds]
    else:
        bboxes = np.zeros((0, mlvl_bboxes.shape[-1]), np.float32)
        scores = np.zeros((0,), np.float32)
        labels = np.zeros((0,), np.int64)
    return bboxes, scores, labels
