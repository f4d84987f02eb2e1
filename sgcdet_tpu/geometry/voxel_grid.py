"""Voxel grids and camera projection (NumPy; consumed as constants by jitted code).

Semantics match the reference SGCDet geometry
(/root/reference/mmdet3d_plugin/models/detectors/utils.py:5-24 and
/root/reference/mmdet3d_plugin/models/im2voxel/DenseHead.py:32-48): a regular
grid of voxel centers laid out so the *scene origin* sits at the grid center,
and a pinhole projection ``K[:3,:3] @ E[:3,:4]`` whose intrinsics are rescaled
from the original image resolution to the (resized) network input resolution.
"""
from __future__ import annotations

import numpy as np


def get_points(n_voxels, voxel_size, origin):
    """Voxel-center coordinates of a grid centered on ``origin``.

    Args:
      n_voxels: (3,) ints (nx, ny, nz).
      voxel_size: (3,) floats, meters.
      origin: (3,) floats, scene origin in world coordinates.

    Returns:
      (3, nx, ny, nz) float32 array of voxel-center world coordinates. Matches
      the reference layout (axis 0 = xyz, meshgrid 'ij').
    """
    n_voxels = np.asarray(n_voxels)
    voxel_size = np.asarray(voxel_size, dtype=np.float32)
    origin = np.asarray(origin, dtype=np.float32)
    idx = np.stack(
        np.meshgrid(
            np.arange(n_voxels[0]),
            np.arange(n_voxels[1]),
            np.arange(n_voxels[2]),
            indexing="ij",
        )
    ).astype(np.float32)
    new_origin = origin - n_voxels / 2.0 * voxel_size
    return idx * voxel_size.reshape(3, 1, 1, 1) + new_origin.reshape(3, 1, 1, 1)


def voxel_centers_zero_origin(n_voxels, voxel_size):
    """Flattened voxel centers relative to a zero origin: (nx*ny*nz, 3).

    Reference: DenseHead.get_voxel_indices (DenseHead.py:39-47). The flatten
    order is C-order over (x, y, z), identical to ``reshape(-1)`` of the grid,
    so a flat index maps back with ``ix*ny*nz + iy*nz + iz``.
    """
    pts = get_points(n_voxels, voxel_size, np.zeros(3, np.float32))
    return pts.reshape(3, -1).T.astype(np.float32)


def compute_projection(intrinsic, extrinsics, ori_h, img_h, stride=1):
    """Per-view 3x4 world->pixel projection matrices.

    Args:
      intrinsic: (3, 3) or (4, 4) or per-view (N, 3, 3)/(N, 4, 4) intrinsics at
        the *original* image resolution.
      extrinsics: (N, 4, 4) world-to-camera matrices.
      ori_h: original image height (e.g. 968 for ScanNet).
      img_h: resized (pre-pad) image height (e.g. 239).
      stride: feature stride relative to the resized image.

    Returns:
      (N, 3, 4) float32 projections ``K_scaled @ E[:3]`` that map homogeneous
      world points to pixel coordinates at resolution img_h/stride.
      Matches the reference's ratio convention (detectors/utils.py:16-24):
      ``ratio = ori_h / (img_h / stride)``.
    """
    extrinsics = np.asarray(extrinsics, dtype=np.float32)
    intr = np.array(intrinsic, dtype=np.float32)
    ratio = ori_h / (img_h / stride)
    if intr.ndim == 2:
        k = intr[:3, :3].copy()
        k[:2] /= ratio
        return np.einsum("ij,njk->nik", k, extrinsics[:, :3, :]).astype(np.float32)
    k = intr[:, :3, :3].copy()
    k[:, :2] /= ratio
    return np.einsum("nij,njk->nik", k, extrinsics[:, :3, :]).astype(np.float32)
