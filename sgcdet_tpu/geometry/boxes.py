"""3D box structures in the Depth coordinate frame (x right, y front, z up).

NumPy implementation of the box semantics SGCDet relies on from mmdet3d's
``DepthInstance3DBoxes`` (/root/reference/packages/mmdetection3d/mmdet3d/core/
bbox/structures/depth_box3d.py and base_box3d.py): storage is
``(x, y, z_bottom, dx, dy, dz[, yaw])`` with the box origin at the *bottom
center*; inputs created with ``origin=(0.5, 0.5, 0.5)`` are shifted down by
half the height.  These run on host (eval, NMS, target prep); jitted training
code uses plain arrays and the jnp helpers below.
"""
from __future__ import annotations

import numpy as np

from .rotated_iou import box_iou_rotated


def rotation_3d_in_axis(points, angles, axis=2):
    """Rotate batches of points around one axis. points: (N, M, 3), angles (N,).

    Matches mmdet3d's convention (structures/utils.py:29-100):
    ``rotated = points @ rot_mat_T`` with, for axis=2,
    ``rot_mat_T = [[cos, sin, 0], [-sin, cos, 0], [0, 0, 1]]``.
    Works for both numpy and jax.numpy inputs.
    """
    xp = np if isinstance(points, np.ndarray) else _array_namespace(points)
    points = xp.asarray(points)
    angles = xp.asarray(angles)
    batch_free = points.ndim == 2
    if batch_free:
        points = points[None]
    if angles.ndim == 0:
        angles = xp.broadcast_to(angles, points.shape[:1])

    s = xp.sin(angles)
    c = xp.cos(angles)
    ones = xp.ones_like(c)
    zeros = xp.zeros_like(c)
    if axis in (2, -1):
        rot = xp.stack(
            [
                xp.stack([c, s, zeros], axis=-1),
                xp.stack([-s, c, zeros], axis=-1),
                xp.stack([zeros, zeros, ones], axis=-1),
            ],
            axis=-2,
        )
    elif axis in (1, -2):
        rot = xp.stack(
            [
                xp.stack([c, zeros, -s], axis=-1),
                xp.stack([zeros, ones, zeros], axis=-1),
                xp.stack([s, zeros, c], axis=-1),
            ],
            axis=-2,
        )
    elif axis in (0, -3):
        rot = xp.stack(
            [
                xp.stack([ones, zeros, zeros], axis=-1),
                xp.stack([zeros, c, s], axis=-1),
                xp.stack([zeros, -s, c], axis=-1),
            ],
            axis=-2,
        )
    else:
        raise ValueError(f"axis should be in [0,1,2], got {axis}")
    out = xp.einsum("nmk,nkj->nmj", points, rot)
    return out[0] if batch_free else out


def _array_namespace(x):
    import jax.numpy as jnp  # local import: keep host-only paths torch/jax free

    return jnp


# Corner template: unravel_index order with the swap used by mmdet3d so the
# corners come out clockwise per face (depth_box3d.py:74-80).
_CORNERS_NORM = (
    np.stack(np.unravel_index(np.arange(8), [2] * 3), axis=1)[[0, 1, 3, 2, 4, 5, 7, 6]]
    .astype(np.float32)
) - np.array([0.5, 0.5, 0.0], np.float32)


class DepthBoxes3D:
    """Axis-gravity-aligned 3D boxes with optional yaw, Depth coordinates."""

    def __init__(self, tensor, box_dim=7, with_yaw=True, origin=(0.5, 0.5, 0)):
        tensor = np.asarray(tensor, dtype=np.float32).reshape(-1, box_dim if tensor is not None else 7)
        if tensor.size == 0:
            tensor = tensor.reshape(0, box_dim)
        if tensor.shape[-1] == 6 or not with_yaw:
            with_yaw = False
            if tensor.shape[-1] == 6:
                tensor = np.concatenate([tensor, np.zeros((len(tensor), 1), np.float32)], axis=1)
                box_dim = 7
        self.with_yaw = with_yaw
        self.box_dim = tensor.shape[-1]
        tensor = tensor.copy()
        src = np.asarray(origin, np.float32)
        dst = np.array([0.5, 0.5, 0.0], np.float32)
        if not np.allclose(src, dst):
            tensor[:, :3] += tensor[:, 3:6] * (dst - src)
        self.tensor = tensor

    def __len__(self):
        return len(self.tensor)

    def __getitem__(self, item):
        t = self.tensor[item]
        if t.ndim == 1:
            t = t[None]
        b = DepthBoxes3D.__new__(DepthBoxes3D)
        b.tensor = t.copy()
        b.with_yaw = self.with_yaw
        b.box_dim = self.box_dim
        return b

    def new_box(self, data):
        b = DepthBoxes3D.__new__(DepthBoxes3D)
        b.tensor = np.asarray(data, np.float32).reshape(-1, self.tensor.shape[-1]).copy()
        b.with_yaw = self.with_yaw
        b.box_dim = self.box_dim
        return b

    @property
    def dims(self):
        return self.tensor[:, 3:6]

    @property
    def yaw(self):
        return self.tensor[:, 6]

    @property
    def volume(self):
        return self.tensor[:, 3] * self.tensor[:, 4] * self.tensor[:, 5]

    @property
    def bottom_center(self):
        return self.tensor[:, :3]

    @property
    def bottom_height(self):
        return self.tensor[:, 2]

    @property
    def top_height(self):
        return self.tensor[:, 2] + self.tensor[:, 5]

    @property
    def gravity_center(self):
        g = self.tensor[:, :3].copy()
        g[:, 2] += self.tensor[:, 5] * 0.5
        return g

    @property
    def bev(self):
        """(N, 5) BEV boxes (x, y, dx, dy, yaw)."""
        return self.tensor[:, [0, 1, 3, 4, 6]]

    @property
    def corners(self):
        """(N, 8, 3) corners, mmdet3d order (depth_box3d.py:52-91)."""
        if len(self.tensor) == 0:
            return np.zeros((0, 8, 3), np.float32)
        corners = self.dims[:, None, :] * _CORNERS_NORM[None]
        corners = rotation_3d_in_axis(corners, self.tensor[:, 6], axis=2)
        return corners + self.tensor[:, None, :3]

    @classmethod
    def height_overlaps(cls, boxes1, boxes2):
        hb = np.maximum(boxes1.bottom_height[:, None], boxes2.bottom_height[None])
        lt = np.minimum(boxes1.top_height[:, None], boxes2.top_height[None])
        return np.clip(lt - hb, 0, None)

    @classmethod
    def overlaps(cls, boxes1, boxes2, mode="iou"):
        """3D IoU matrix (N, M); matches base_box3d.overlaps:436-489."""
        rows, cols = len(boxes1), len(boxes2)
        if rows * cols == 0:
            return np.zeros((rows, cols), np.float32)
        overlaps_h = cls.height_overlaps(boxes1, boxes2)
        iou2d = box_iou_rotated(boxes1.bev, boxes2.bev)
        areas1 = (boxes1.bev[:, 2] * boxes1.bev[:, 3])[:, None]
        areas2 = (boxes2.bev[:, 2] * boxes2.bev[:, 3])[None]
        overlaps_bev = iou2d * (areas1 + areas2) / (1 + iou2d)
        overlaps_3d = overlaps_bev * overlaps_h
        v1 = boxes1.volume[:, None]
        v2 = boxes2.volume[None]
        if mode == "iou":
            return overlaps_3d / np.clip(v1 + v2 - overlaps_3d, 1e-8, None)
        return overlaps_3d / np.clip(v1, 1e-8, None)


def axis_aligned_overlaps_3d(boxes1, boxes2, is_aligned=False, eps=1e-6):
    """IoU of axis-aligned 3D boxes in (x1, y1, z1, x2, y2, z2) corner form.

    Mirrors mmdet3d AxisAlignedBboxOverlaps3D (iou3d_calculator.py:180+).
    Works with numpy or jnp arrays (pure elementwise ops).
    """
    xp = np if isinstance(boxes1, np.ndarray) else _array_namespace(boxes1)
    area1 = (
        (boxes1[..., 3] - boxes1[..., 0])
        * (boxes1[..., 4] - boxes1[..., 1])
        * (boxes1[..., 5] - boxes1[..., 2])
    )
    area2 = (
        (boxes2[..., 3] - boxes2[..., 0])
        * (boxes2[..., 4] - boxes2[..., 1])
        * (boxes2[..., 5] - boxes2[..., 2])
    )
    if is_aligned:
        lt = xp.maximum(boxes1[..., :3], boxes2[..., :3])
        rb = xp.minimum(boxes1[..., 3:], boxes2[..., 3:])
        wh = xp.clip(rb - lt, 0, None)
        overlap = wh[..., 0] * wh[..., 1] * wh[..., 2]
        union = area1 + area2 - overlap
    else:
        lt = xp.maximum(boxes1[..., :, None, :3], boxes2[..., None, :, :3])
        rb = xp.minimum(boxes1[..., :, None, 3:], boxes2[..., None, :, 3:])
        wh = xp.clip(rb - lt, 0, None)
        overlap = wh[..., 0] * wh[..., 1] * wh[..., 2]
        union = area1[..., :, None] + area2[..., None, :] - overlap
    union = xp.maximum(union, eps)
    return overlap / union
