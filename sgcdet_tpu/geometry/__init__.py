from .voxel_grid import get_points, compute_projection, voxel_centers_zero_origin
from .boxes import DepthBoxes3D, rotation_3d_in_axis, axis_aligned_overlaps_3d
from .rotated_iou import box_iou_rotated, rotated_iou_3d, rotated_iou_3d_jnp

__all__ = [
    "get_points",
    "compute_projection",
    "voxel_centers_zero_origin",
    "DepthBoxes3D",
    "rotation_3d_in_axis",
    "axis_aligned_overlaps_3d",
    "box_iou_rotated",
    "rotated_iou_3d",
    "rotated_iou_3d_jnp",
]
