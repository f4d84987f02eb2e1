import numpy as np

from sgcdet_tpu.geometry import (
    get_points,
    compute_projection,
    voxel_centers_zero_origin,
)


def test_get_points_layout():
    pts = get_points((2, 3, 4), (0.5, 0.5, 1.0), (0.0, 0.0, 0.0))
    assert pts.shape == (3, 2, 3, 4)
    # first voxel center = origin - n/2*size + 0*size
    np.testing.assert_allclose(pts[:, 0, 0, 0], [-0.5, -0.75, -2.0])
    # stepping along x changes only x by voxel_size
    np.testing.assert_allclose(pts[:, 1, 0, 0] - pts[:, 0, 0, 0], [0.5, 0, 0])
    np.testing.assert_allclose(pts[:, 0, 1, 0] - pts[:, 0, 0, 0], [0, 0.5, 0])
    np.testing.assert_allclose(pts[:, 0, 0, 1] - pts[:, 0, 0, 0], [0, 0, 1.0])


def test_voxel_centers_flat_order():
    n = (2, 2, 2)
    flat = voxel_centers_zero_origin(n, (1.0, 1.0, 1.0))
    grid = get_points(n, (1.0, 1.0, 1.0), np.zeros(3))
    # flat index ix*ny*nz + iy*nz + iz must match grid
    for ix in range(2):
        for iy in range(2):
            for iz in range(2):
                i = ix * 4 + iy * 2 + iz
                np.testing.assert_allclose(flat[i], grid[:, ix, iy, iz])


def test_compute_projection_scaling():
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 1000.0
    intr[0, 2] = 648.0
    intr[1, 2] = 484.0
    ext = np.eye(4, dtype=np.float32)[None]
    # ScanNet-style: 968 original height, 239 resized
    proj = compute_projection(intr, ext, ori_h=968, img_h=239, stride=1)
    assert proj.shape == (1, 3, 4)
    ratio = 968 / 239
    np.testing.assert_allclose(proj[0, 0, 0], 1000.0 / ratio, rtol=1e-6)
    np.testing.assert_allclose(proj[0, 2, 2], 1.0)
    # a point on the optical axis projects to the scaled principal point
    p = proj[0] @ np.array([0, 0, 2.0, 1.0])
    np.testing.assert_allclose(p[:2] / p[2], [648.0 / ratio, 484.0 / ratio], rtol=1e-5)
