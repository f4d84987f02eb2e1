"""Rotated-box IoU via differentiable convex polygon intersection.

Replaces the CUDA ops the reference depends on from mmcv
(`box_iou_rotated` used in eval-time 3D overlaps, base_box3d.py:467-470;
`diff_iou_rotated_3d` used by the ARKit RotatedIoU3DLoss,
mmdet3d_plugin/models/losses/rotated_iou_loss.py:23) with a single
fixed-shape, branch-free formulation that runs under both NumPy (host eval)
and jax.numpy (jit/grad on TPU): candidate intersection vertices (16 edge-edge
+ 8 corner-inside) are masked, sorted by angle, and reduced with a masked
shoelace — no dynamic shapes anywhere.
"""
from __future__ import annotations

import numpy as np

_EPS = 1e-8


def _rect_corners(xp, boxes):
    """Corners of BEV rects (..., 5)=(cx, cy, w, h, angle) -> (..., 4, 2), CCW."""
    cx, cy, w, h, a = (boxes[..., i] for i in range(5))
    c, s = xp.cos(a), xp.sin(a)
    dx = xp.stack([-w, w, w, -w], axis=-1) * 0.5
    dy = xp.stack([-h, -h, h, h], axis=-1) * 0.5
    x = cx[..., None] + dx * c[..., None] - dy * s[..., None]
    y = cy[..., None] + dx * s[..., None] + dy * c[..., None]
    return xp.stack([x, y], axis=-1)


def _edge_intersections(xp, c1, c2):
    """All 16 segment-segment intersection candidates between two quads.

    c1, c2: (..., 4, 2). Returns pts (..., 16, 2), valid (..., 16).
    """
    p1 = c1  # (..., 4, 2) segment starts
    p2 = xp.roll(c1, -1, axis=-2)  # segment ends
    q1 = c2
    q2 = xp.roll(c2, -1, axis=-2)

    # broadcast to (..., 4, 4, 2): edge i of poly1 x edge j of poly2
    p1 = p1[..., :, None, :]
    p2 = p2[..., :, None, :]
    q1 = q1[..., None, :, :]
    q2 = q2[..., None, :, :]

    d1 = p2 - p1
    d2 = q2 - q1
    denom = d1[..., 0] * d2[..., 1] - d1[..., 1] * d2[..., 0]
    denom_safe = xp.where(xp.abs(denom) < _EPS, xp.ones_like(denom), denom)
    dq = q1 - p1
    t = (dq[..., 0] * d2[..., 1] - dq[..., 1] * d2[..., 0]) / denom_safe
    u = (dq[..., 0] * d1[..., 1] - dq[..., 1] * d1[..., 0]) / denom_safe
    valid = (
        (xp.abs(denom) >= _EPS)
        & (t >= 0.0)
        & (t <= 1.0)
        & (u >= 0.0)
        & (u <= 1.0)
    )
    pts = p1 + t[..., None] * d1
    shape = pts.shape[:-3] + (16, 2)
    return pts.reshape(shape), valid.reshape(valid.shape[:-2] + (16,))


def _points_in_quad(xp, pts, quad):
    """pts (..., 4, 2) inside convex CCW quad (..., 4, 2) -> bool (..., 4)."""
    a = quad[..., None, :, :]  # (..., 1, 4, 2) quad vertices
    b = xp.roll(quad, -1, axis=-2)[..., None, :, :]
    p = pts[..., :, None, :]  # (..., 4, 1, 2)
    cross = (b[..., 0] - a[..., 0]) * (p[..., 1] - a[..., 1]) - (
        b[..., 1] - a[..., 1]
    ) * (p[..., 0] - a[..., 0])
    # inside iff on the same (non-negative) side of every CCW edge
    return xp.all(cross > -1e-6, axis=-1)


def _polygon_area_masked(xp, pts, valid):
    """Shoelace area of the convex hull of masked candidate vertices.

    pts: (..., K, 2), valid: (..., K) bool. Sorts valid vertices by angle
    around their centroid and applies a masked shoelace; invalid slots are
    pushed to the end and contribute nothing.
    """
    k = pts.shape[-2]
    nvalid = valid.sum(axis=-1)
    vf = valid.astype(pts.dtype)[..., None]
    center = (pts * vf).sum(axis=-2) / xp.maximum(
        nvalid.astype(pts.dtype), 1.0
    )[..., None]
    rel = pts - center[..., None, :]
    ang = xp.arctan2(rel[..., 1], rel[..., 0])
    ang = xp.where(valid, ang, 1e9)  # invalid sorted to the end
    order = xp.argsort(ang, axis=-1)
    sorted_pts = xp.take_along_axis(rel, order[..., None], axis=-2)

    idx = xp.arange(k)
    idx = idx.reshape((1,) * (pts.ndim - 2) + (k,))
    nxt = idx + 1
    nvalid_b = nvalid[..., None]
    nxt = xp.where(nxt < nvalid_b, nxt, xp.zeros_like(nxt))
    nxt = xp.broadcast_to(nxt, sorted_pts.shape[:-1])
    nxt_pts = xp.take_along_axis(sorted_pts, nxt[..., None], axis=-2)
    cross = (
        sorted_pts[..., 0] * nxt_pts[..., 1] - sorted_pts[..., 1] * nxt_pts[..., 0]
    )
    contrib = xp.where(idx < nvalid_b, cross, xp.zeros_like(cross))
    area = 0.5 * xp.abs(contrib.sum(axis=-1))
    return xp.where(nvalid >= 3, area, xp.zeros_like(area))


def rotated_rect_intersection_area(boxes1, boxes2, xp=np):
    """Intersection area of paired BEV rects (..., 5). Fully broadcast/fixed-shape."""
    c1 = _rect_corners(xp, boxes1)
    c2 = _rect_corners(xp, boxes2)
    inter_pts, inter_valid = _edge_intersections(xp, c1, c2)
    in12 = _points_in_quad(xp, c1, c2)
    in21 = _points_in_quad(xp, c2, c1)
    pts = xp.concatenate([inter_pts, c1, c2], axis=-2)  # (..., 24, 2)
    valid = xp.concatenate([inter_valid, in12, in21], axis=-1)
    return _polygon_area_masked(xp, pts, valid)


def rotated_rect_iou(boxes1, boxes2, xp=np):
    """IoU of paired BEV rects (..., 5) = (cx, cy, w, h, angle)."""
    inter = rotated_rect_intersection_area(boxes1, boxes2, xp=xp)
    a1 = boxes1[..., 2] * boxes1[..., 3]
    a2 = boxes2[..., 2] * boxes2[..., 3]
    return inter / xp.maximum(a1 + a2 - inter, _EPS)


def box_iou_rotated(boxes1, boxes2):
    """Pairwise (N, M) rotated IoU matrix for BEV rects (host-side NumPy).

    Equivalent of mmcv's CUDA ``box_iou_rotated`` consumed by
    base_box3d.overlaps (base_box3d.py:467-470).
    """
    boxes1 = np.asarray(boxes1, np.float64)
    boxes2 = np.asarray(boxes2, np.float64)
    n, m = len(boxes1), len(boxes2)
    if n * m == 0:
        return np.zeros((n, m), np.float32)
    b1 = np.broadcast_to(boxes1[:, None, :], (n, m, 5))
    b2 = np.broadcast_to(boxes2[None, :, :], (n, m, 5))
    return rotated_rect_iou(b1, b2, xp=np).astype(np.float32)


def rotated_iou_3d(boxes1, boxes2, xp=np):
    """Paired 3D IoU of yawed boxes (..., 7) = (x, y, z_center, dx, dy, dz, yaw).

    Matches mmcv's ``diff_iou_rotated_3d`` semantics (z is *gravity center*):
    BEV rotated intersection x vertical overlap / union. Differentiable under
    jax (pass xp=jax.numpy) via :func:`rotated_iou_3d_jnp`.
    """
    bev1 = xp.concatenate([boxes1[..., 0:2], boxes1[..., 3:5], boxes1[..., 6:7]], axis=-1)
    bev2 = xp.concatenate([boxes2[..., 0:2], boxes2[..., 3:5], boxes2[..., 6:7]], axis=-1)
    inter_bev = rotated_rect_intersection_area(bev1, bev2, xp=xp)
    top = xp.minimum(
        boxes1[..., 2] + boxes1[..., 5] * 0.5, boxes2[..., 2] + boxes2[..., 5] * 0.5
    )
    bot = xp.maximum(
        boxes1[..., 2] - boxes1[..., 5] * 0.5, boxes2[..., 2] - boxes2[..., 5] * 0.5
    )
    inter_h = xp.clip(top - bot, 0.0, None)
    inter = inter_bev * inter_h
    v1 = boxes1[..., 3] * boxes1[..., 4] * boxes1[..., 5]
    v2 = boxes2[..., 3] * boxes2[..., 4] * boxes2[..., 5]
    return inter / xp.maximum(v1 + v2 - inter, _EPS)


def rotated_iou_3d_jnp(boxes1, boxes2):
    """Differentiable paired 3D rotated IoU on device (jnp arrays (..., 7))."""
    import jax.numpy as jnp

    return rotated_iou_3d(boxes1, boxes2, xp=jnp)
