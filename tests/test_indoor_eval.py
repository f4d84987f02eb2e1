import numpy as np

from sgcdet_tpu.eval import average_precision, indoor_eval
from sgcdet_tpu.geometry import DepthBoxes3D


def test_average_precision_perfect():
    rec = np.array([[0.5, 1.0]])
    prec = np.array([[1.0, 1.0]])
    ap = average_precision(rec, prec)
    np.testing.assert_allclose(ap, [1.0])


def test_average_precision_half():
    # one TP then one FP over 1 GT: recall [1, 1], precision [1, 0.5]
    rec = np.array([[1.0, 1.0]])
    prec = np.array([[1.0, 0.5]])
    ap = average_precision(rec, prec)
    np.testing.assert_allclose(ap, [1.0])


def test_indoor_eval_perfect_and_miss():
    # scene 0: one GT of class 0, matched perfectly.
    # scene 1: one GT of class 1, detection far away -> FP + missed GT.
    gt_annos = [
        dict(
            gt_num=1,
            gt_boxes_upright_depth=np.array([[0, 0, 0.5, 1, 1, 1]], np.float32),
            **{"class": np.array([0])},
        ),
        dict(
            gt_num=1,
            gt_boxes_upright_depth=np.array([[5, 5, 0.5, 1, 1, 1]], np.float32),
            **{"class": np.array([1])},
        ),
    ]
    det0 = DepthBoxes3D(
        np.array([[0, 0, 0.5, 1, 1, 1]], np.float32), box_dim=6, with_yaw=False,
        origin=(0.5, 0.5, 0.5),
    )
    det1 = DepthBoxes3D(
        np.array([[9, 9, 0.5, 1, 1, 1]], np.float32), box_dim=6, with_yaw=False,
        origin=(0.5, 0.5, 0.5),
    )
    dt_annos = [
        dict(boxes_3d=det0, scores_3d=np.array([0.9]), labels_3d=np.array([0])),
        dict(boxes_3d=det1, scores_3d=np.array([0.8]), labels_3d=np.array([1])),
    ]
    ret = indoor_eval(gt_annos, dt_annos, [0.25, 0.5], {0: "chair", 1: "table"})
    np.testing.assert_allclose(ret["chair_AP_0.25"], 1.0)
    np.testing.assert_allclose(ret["table_AP_0.25"], 0.0)
    np.testing.assert_allclose(ret["mAP_0.25"], 0.5)
    np.testing.assert_allclose(ret["mAR_0.25"], 0.5)
    np.testing.assert_allclose(ret["mAP_0.50"], 0.5)


def test_indoor_eval_duplicate_detection_is_fp():
    # two detections on one GT: second (lower score) must count as FP
    gt_annos = [
        dict(
            gt_num=1,
            gt_boxes_upright_depth=np.array([[0, 0, 0.5, 1, 1, 1]], np.float32),
            **{"class": np.array([0])},
        )
    ]
    det = DepthBoxes3D(
        np.array([[0, 0, 0.5, 1, 1, 1], [0.02, 0, 0.5, 1, 1, 1]], np.float32),
        box_dim=6,
        with_yaw=False,
        origin=(0.5, 0.5, 0.5),
    )
    dt_annos = [
        dict(boxes_3d=det, scores_3d=np.array([0.9, 0.7]), labels_3d=np.array([0, 0]))
    ]
    ret = indoor_eval(gt_annos, dt_annos, [0.25], {0: "chair"})
    # precision curve: [1, 0.5]; recall [1, 1]; area AP = 1.0, recall = 1
    np.testing.assert_allclose(ret["chair_AP_0.25"], 1.0)
    np.testing.assert_allclose(ret["mAR_0.25"], 1.0)


def test_indoor_eval_yawed_boxes():
    gt_annos = [
        dict(
            gt_num=1,
            gt_boxes_upright_depth=np.array([[0, 0, 0.5, 2, 1, 1, 0.4]], np.float32),
            **{"class": np.array([0])},
        )
    ]
    det = DepthBoxes3D(
        np.array([[0, 0, 0.5, 2, 1, 1, 0.4]], np.float32), origin=(0.5, 0.5, 0.5)
    )
    dt_annos = [
        dict(boxes_3d=det, scores_3d=np.array([0.9]), labels_3d=np.array([0]))
    ]
    ret = indoor_eval(gt_annos, dt_annos, [0.25, 0.5], {0: "bed"})
    np.testing.assert_allclose(ret["bed_AP_0.50"], 1.0)
