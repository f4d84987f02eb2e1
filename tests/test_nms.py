import numpy as np

from sgcdet_tpu.ops import aligned_3d_nms, box3d_multiclass_nms, nms_bev


def test_aligned_3d_nms_basic():
    # mirror of mmdet3d tests/test_utils/test_nms.py:test_aligned_3d_nms shape:
    # two heavily-overlapping boxes + one disjoint; keep top-score of the pair.
    boxes = np.array(
        [
            [0.0, 0.0, 0.0, 1.0, 1.0, 1.0],
            [0.05, 0.05, 0.0, 1.05, 1.05, 1.0],
            [5.0, 5.0, 5.0, 6.0, 6.0, 6.0],
        ],
        np.float32,
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    classes = np.array([0, 0, 1])
    keep = aligned_3d_nms(boxes, scores, classes, 0.25)
    assert keep.tolist() == [0, 2]


def test_aligned_3d_nms_class_gating():
    # same geometry, different classes: nothing suppressed
    boxes = np.array(
        [
            [0.0, 0.0, 0.0, 1.0, 1.0, 1.0],
            [0.05, 0.05, 0.0, 1.05, 1.05, 1.0],
        ],
        np.float32,
    )
    scores = np.array([0.9, 0.8], np.float32)
    classes = np.array([0, 1])
    keep = aligned_3d_nms(boxes, scores, classes, 0.25)
    assert sorted(keep.tolist()) == [0, 1]


def test_nms_bev_rotated():
    # corner-form (x1, y1, x2, y2, yaw)
    boxes = np.array(
        [
            [0, 0, 2, 2, 0.0],
            [0.1, 0.1, 2.1, 2.1, 0.0],
            [10, 10, 12, 12, 0.3],
        ],
        np.float32,
    )
    scores = np.array([0.5, 0.9, 0.3], np.float32)
    keep = nms_bev(boxes, scores, 0.3)
    assert keep.tolist() == [1, 2]


def test_box3d_multiclass_nms():
    n = 4
    bboxes = np.array(
        [
            [0, 0, 0, 1, 1, 1, 0],
            [0.02, 0.02, 0, 1, 1, 1, 0],
            [3, 3, 0, 1, 1, 1, 0],
            [3, 3, 0, 1, 1, 1, 0],
        ],
        np.float32,
    )
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
    # scores: class0 high for 0/1, class1 high for 2; col 2 is background
    scores = np.zeros((n, 3), np.float32)
    scores[0, 0] = 0.9
    scores[1, 0] = 0.8
    scores[2, 1] = 0.7
    scores[3, 1] = 0.6
    out_boxes, out_scores, out_labels = box3d_multiclass_nms(
        bboxes, bev, scores, score_thr=0.1, max_num=10, nms_thr=0.2
    )
    # box1 suppressed by box0 (same class), box3 by box2
    assert len(out_boxes) == 2
    assert out_labels.tolist() == [0, 1]
    np.testing.assert_allclose(out_scores, [0.9, 0.7])
