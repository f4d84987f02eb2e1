import numpy as np
import pytest

from sgcdet_tpu.geometry import (
    DepthBoxes3D,
    axis_aligned_overlaps_3d,
    box_iou_rotated,
    rotation_3d_in_axis,
    rotated_iou_3d,
)


def test_origin_shift_and_gravity_center():
    # gravity-center input, origin (0.5, 0.5, 0.5): storage shifts z down by h/2
    b = DepthBoxes3D([[1, 2, 3, 2, 2, 4, 0]], origin=(0.5, 0.5, 0.5))
    np.testing.assert_allclose(b.tensor[0, :3], [1, 2, 1])
    np.testing.assert_allclose(b.gravity_center[0], [1, 2, 3])
    np.testing.assert_allclose(b.bottom_height[0], 1)
    np.testing.assert_allclose(b.top_height[0], 5)
    np.testing.assert_allclose(b.volume[0], 16)


def test_six_dim_box_gets_zero_yaw():
    b = DepthBoxes3D(np.array([[0, 0, 0, 1, 1, 1]], np.float32), box_dim=6, with_yaw=False)
    assert b.tensor.shape == (1, 7)
    assert not b.with_yaw


def test_corners_axis_aligned():
    b = DepthBoxes3D([[0, 0, 0, 2, 4, 6, 0]])  # bottom-center origin storage
    c = b.corners
    assert c.shape == (1, 8, 3)
    np.testing.assert_allclose(c.min(axis=1)[0], [-1, -2, 0])
    np.testing.assert_allclose(c.max(axis=1)[0], [1, 2, 6])


def test_rotation_3d_in_axis_z():
    pts = np.array([[[1.0, 0.0, 0.0]]])
    out = rotation_3d_in_axis(pts, np.array([np.pi / 2]), axis=2)
    # points @ [[c, s, 0], [-s, c, 0], [0,0,1]]: (1,0,0) -> (0, 1, 0)
    np.testing.assert_allclose(out[0, 0], [0, 1, 0], atol=1e-7)


def test_rotation_matches_torch_reference():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    pts = rng.randn(5, 7, 3).astype(np.float32)
    ang = rng.randn(5).astype(np.float32)
    ours = rotation_3d_in_axis(pts, ang, axis=2)
    # independent construction of the same convention
    c, s = np.cos(ang), np.sin(ang)
    ref = np.empty_like(pts)
    for i in range(5):
        rot_t = np.array([[c[i], s[i], 0], [-s[i], c[i], 0], [0, 0, 1]], np.float32)
        ref[i] = pts[i] @ rot_t
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_axis_aligned_overlaps():
    b1 = np.array([[0, 0, 0, 2, 2, 2]], np.float32)
    b2 = np.array([[1, 1, 1, 3, 3, 3]], np.float32)
    iou = axis_aligned_overlaps_3d(b1, b2, is_aligned=True)
    # intersection 1, union 8+8-1
    np.testing.assert_allclose(iou[0], 1 / 15, rtol=1e-6)


def test_box_iou_rotated_axis_aligned_case():
    # zero-yaw boxes must reduce to standard rect IoU
    a = np.array([[0, 0, 2, 2, 0]], np.float32)
    b = np.array([[1, 0, 2, 2, 0]], np.float32)
    iou = box_iou_rotated(a, b)
    np.testing.assert_allclose(iou[0, 0], 2 / 6, atol=1e-5)


def test_box_iou_rotated_identical_rotated():
    a = np.array([[0.3, -0.2, 2, 1, 0.7]], np.float32)
    iou = box_iou_rotated(a, a)
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-4)


def test_box_iou_rotated_vs_rasterized():
    rng = np.random.RandomState(42)
    n = 12
    boxes1 = np.stack(
        [
            rng.uniform(-1, 1, n),
            rng.uniform(-1, 1, n),
            rng.uniform(0.5, 2.5, n),
            rng.uniform(0.5, 2.5, n),
            rng.uniform(-np.pi, np.pi, n),
        ],
        axis=1,
    ).astype(np.float32)
    boxes2 = np.stack(
        [
            rng.uniform(-1, 1, n),
            rng.uniform(-1, 1, n),
            rng.uniform(0.5, 2.5, n),
            rng.uniform(0.5, 2.5, n),
            rng.uniform(-np.pi, np.pi, n),
        ],
        axis=1,
    ).astype(np.float32)
    iou = box_iou_rotated(boxes1, boxes2)

    # rasterized ground truth on a fine grid
    res = 400
    xs = np.linspace(-4, 4, res)
    gx, gy = np.meshgrid(xs, xs, indexing="xy")

    def inside(box):
        dx = gx - box[0]
        dy = gy - box[1]
        c, s = np.cos(box[4]), np.sin(box[4])
        lx = dx * c + dy * s
        ly = -dx * s + dy * c
        return (np.abs(lx) <= box[2] / 2) & (np.abs(ly) <= box[3] / 2)

    cell = (xs[1] - xs[0]) ** 2
    for i in range(n):
        for j in range(0, n, 3):
            m1 = inside(boxes1[i])
            m2 = inside(boxes2[j])
            inter = (m1 & m2).sum() * cell
            union = (m1 | m2).sum() * cell
            ref = inter / max(union, 1e-9)
            assert abs(iou[i, j] - ref) < 0.02, (i, j, iou[i, j], ref)


def test_rotated_iou_3d_identical():
    b = np.array([[0.5, -0.3, 1.0, 2.0, 1.0, 3.0, 0.4]], np.float32)
    iou = rotated_iou_3d(b, b)
    np.testing.assert_allclose(iou[0], 1.0, atol=1e-4)


def test_overlaps_3d_axis_aligned():
    # axis-aligned yaw=0 boxes: overlaps should equal analytic 3D IoU
    b1 = DepthBoxes3D([[0, 0, 0, 2, 2, 2, 0]])
    b2 = DepthBoxes3D([[1, 0, 0, 2, 2, 2, 0]])
    iou = DepthBoxes3D.overlaps(b1, b2)
    # intersection = 1*2*2 = 4, union = 8+8-4
    np.testing.assert_allclose(iou[0, 0], 4 / 12, atol=1e-5)


def test_rotated_iou_3d_grad_finite():
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp
    from sgcdet_tpu.geometry import rotated_iou_3d_jnp

    def loss(p):
        t = jnp.array([[0.1, 0.0, 0.5, 1.5, 1.0, 2.0, 0.3]])
        return (1 - rotated_iou_3d_jnp(p, t)).sum()

    p = jnp.array([[0.0, 0.2, 0.4, 1.0, 1.2, 1.8, -0.2]])
    g = jax.grad(loss)(p)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).sum() > 0
