"""Exact-value golden tests ported verbatim from the vendored mmdet3d suite.

Box/score fixtures and expected values are copied from
/root/reference/packages/mmdetection3d/tests/test_metrics/test_indoor_eval.py
(:9-183), tests/test_utils/test_nms.py (:7-120) and a self-contained slice of
tests/test_utils/test_box3d.py (:1190-1216) — the protocol must match
bit-for-bit, so the fixtures are intentionally identical.
"""
import numpy as np

from sgcdet_tpu.eval.indoor_eval import average_precision, indoor_eval
from sgcdet_tpu.geometry.boxes import DepthBoxes3D
from sgcdet_tpu.ops.nms import aligned_3d_nms, nms_bev, nms_normal_bev


def test_indoor_eval_golden():
    boxes = np.array([
        [-2.4089e-03, -3.3174e+00, 4.9438e-01, 2.1668e+00, 2.8431e-01, 1.6506e+00, 0.0],
        [-3.4269e-01, -2.7565e+00, 2.8144e-02, 6.8554e-01, 9.6854e-01, 6.1755e-01, 0.0],
        [-3.8320e+00, -1.0646e+00, 1.7074e-01, 2.4981e-01, 4.4708e-01, 6.2538e-01, 0.0],
        [4.1073e-01, 3.3757e+00, 3.4311e-01, 8.0617e-01, 2.8679e-01, 1.6060e+00, 0.0],
        [6.1199e-01, -3.1041e+00, 4.1873e-01, 1.2310e+00, 4.0162e-01, 1.7303e+00, 0.0],
        [-5.9877e-01, -2.6011e+00, 1.1148e+00, 1.5704e-01, 7.5957e-01, 9.6930e-01, 0.0],
        [2.7462e-01, -3.0088e+00, 6.5231e-02, 8.1208e-01, 4.1861e-01, 3.7339e-01, 0.0],
        [-1.4704e+00, -2.0024e+00, 2.7479e-01, 1.7888e+00, 1.0566e+00, 1.3704e+00, 0.0],
        [8.2727e-02, -3.1160e+00, 2.5690e-01, 1.4054e+00, 2.0772e-01, 9.6792e-01, 0.0],
        [2.6896e+00, 1.9881e+00, 1.1566e+00, 9.9885e-02, 3.5713e-01, 4.5638e-01, 0.0],
    ], np.float32)
    det_infos = [{
        "labels_3d": np.array([0, 1, 2, 2, 0, 3, 1, 2, 3, 2]),
        # the reference test constructs the detections with origin=(.5,.5,0)
        # (bottom-center input, the DepthInstance3DBoxes default)
        "boxes_3d": DepthBoxes3D(boxes, box_dim=7, with_yaw=True,
                                 origin=(0.5, 0.5, 0)),
        "scores_3d": np.array([
            1.7516e-05, 1.0167e-06, 8.4486e-07, 7.1048e-02, 6.4274e-05,
            1.5003e-07, 5.8102e-06, 1.9399e-08, 5.3126e-07, 1.8630e-09,
        ]),
    }]
    label2cat = {0: "cabinet", 1: "bed", 2: "chair", 3: "sofa"}
    gt_annos = [{
        "gt_num": 10,
        "gt_boxes_upright_depth": boxes.copy(),
        "class": np.array([0, 1, 2, 0, 0, 3, 1, 3, 3, 2]),
    }]

    ret = indoor_eval(gt_annos, det_infos, [0.25, 0.5], label2cat)
    assert np.isclose(ret["cabinet_AP_0.25"], 0.666667)
    assert np.isclose(ret["bed_AP_0.25"], 1.0)
    assert np.isclose(ret["chair_AP_0.25"], 0.5)
    assert np.isclose(ret["mAP_0.25"], 0.708333)
    assert np.isclose(ret["mAR_0.25"], 0.833333)


def test_indoor_eval_less_classes_golden():
    det_infos = [
        {
            "labels_3d": np.array([0]),
            "boxes_3d": DepthBoxes3D(np.array([[1., 1., 1., 1., 1., 1., 1.]])),
            "scores_3d": np.array([0.5]),
        },
        {
            "labels_3d": np.array([1]),
            "boxes_3d": DepthBoxes3D(np.array([[1., 1., 1., 1., 1., 1., 1.]])),
            "scores_3d": np.array([0.5]),
        },
    ]
    label2cat = {0: "cabinet", 1: "bed", 2: "chair"}
    gt_annos = [
        {
            "gt_num": 2,
            "gt_boxes_upright_depth": np.array(
                [[0., 0., 0., 1., 1., 1., 1.], [1., 1., 1., 1., 1., 1., 1.]]),
            "class": np.array([2, 0]),
        },
        {
            "gt_num": 1,
            "gt_boxes_upright_depth": np.array([[1., 1., 1., 1., 1., 1., 1.]]),
            "class": np.array([1]),
        },
    ]
    ret = indoor_eval(gt_annos, det_infos, [0.25, 0.5], label2cat)
    assert np.isclose(ret["mAP_0.25"], 0.666667)
    assert np.isclose(ret["mAR_0.25"], 0.666667)


def test_average_precision_11points_golden():
    ap = average_precision(
        np.array([[0.25, 0.5, 0.75], [0.25, 0.5, 0.75]]),
        np.array([[1., 1., 1.], [1., 1., 1.]]), "11points")
    assert abs(ap[0] - 0.06611571) < 0.001


def test_aligned_3d_nms_golden():
    boxes = np.array([[1.2261, 0.6679, -1.2678, 2.6547, 1.0428, 0.1000],
                      [5.0919, 0.6512, 0.7238, 5.4821, 1.2451, 2.1095],
                      [6.8392, -1.2205, 0.8570, 7.6920, 0.3220, 3.2223],
                      [3.6900, -0.4235, -1.0380, 4.4415, 0.2671, -0.1442],
                      [4.8071, -1.4311, 0.7004, 5.5788, -0.6837, 1.2487],
                      [2.1807, -1.5811, -1.1289, 3.0151, -0.1346, -0.5351],
                      [4.4631, -4.2588, -1.1403, 5.3012, -3.4463, -0.3212],
                      [4.7607, -3.3311, 0.5993, 5.2976, -2.7874, 1.2273],
                      [3.1265, 0.7113, -0.0296, 3.8944, 1.3532, 0.9785],
                      [5.5828, -3.5350, 1.0105, 8.2841, -0.0405, 3.3614],
                      [3.0003, -2.1099, -1.0608, 5.3423, 0.0328, 0.6252],
                      [2.7148, 0.6082, -1.1738, 3.6995, 1.2375, -0.0209],
                      [4.9263, -0.2152, 0.2889, 5.6963, 0.3416, 1.3471],
                      [5.0713, 1.3459, -0.2598, 5.6278, 1.9300, 1.2835],
                      [4.5985, -2.3996, -0.3393, 5.2705, -1.7306, 0.5698],
                      [4.1386, 0.5658, 0.0422, 4.8937, 1.1983, 0.9911],
                      [2.7694, -1.9822, -1.0637, 4.0691, 0.3575, -0.1393],
                      [4.6464, -3.0123, -1.0694, 5.1421, -2.4450, -0.3758],
                      [3.4754, 0.4443, -1.1282, 4.6727, 1.3786, 0.2550],
                      [2.5905, -0.3504, -1.1202, 3.1599, 0.1153, -0.3036],
                      [4.1336, -3.4813, 1.1477, 6.2091, -0.8776, 2.6757],
                      [3.9966, 0.2069, -1.1148, 5.0841, 1.0525, -0.0648],
                      [4.3216, -1.8647, 0.4733, 6.2069, 0.6671, 3.3363],
                      [4.7683, 0.4286, -0.0500, 5.5642, 1.2906, 0.8902],
                      [1.7337, 0.7625, -1.0058, 3.0675, 1.3617, 0.3849],
                      [4.7193, -3.3687, -0.9635, 5.1633, -2.7656, 1.1001],
                      [4.4704, -2.7744, -1.1127, 5.0971, -2.0228, -0.3150],
                      [2.7027, 0.6122, -0.9169, 3.3083, 1.2117, 0.6129],
                      [4.8789, -2.0025, 0.8385, 5.5214, -1.3668, 1.3552],
                      [3.7856, -1.7582, -0.1738, 5.3373, -0.6300, 0.5558]],
                     np.float32)
    scores = np.array([
        3.6414e-03, 2.2901e-02, 2.7576e-04, 1.2238e-02, 5.9310e-04,
        1.2659e-01, 2.4104e-02, 5.0742e-03, 2.3581e-03, 2.0946e-07,
        8.8039e-01, 1.9127e-01, 5.0469e-05, 9.3638e-03, 3.0663e-03,
        9.4350e-03, 5.3380e-02, 1.7895e-01, 2.0048e-01, 1.1294e-03,
        3.0304e-08, 2.0237e-01, 1.0894e-08, 6.7972e-02, 6.7156e-01,
        9.3986e-04, 7.9470e-01, 3.9736e-01, 1.8000e-04, 7.9151e-04,
    ], np.float32)
    cls = np.array([8, 8, 8, 3, 3, 1, 3, 3, 7, 8, 0, 6, 7, 8, 3, 7, 2, 7, 6,
                    3, 8, 6, 6, 7, 6, 8, 7, 6, 3, 1])
    pick = aligned_3d_nms(boxes, scores, cls, 0.25)
    expected_pick = np.array([
        10, 26, 24, 27, 21, 18, 17, 5, 23, 16, 6, 1, 3, 15, 13, 7, 0, 14, 8,
        19, 25, 29, 4, 2, 28, 12, 9, 20, 22,
    ])
    np.testing.assert_array_equal(pick, expected_pick)


def test_nms_bev_golden():
    np_boxes = np.array(
        [[6.0, 3.0, 8.0, 7.0, 2.0], [3.0, 6.0, 9.0, 11.0, 1.0],
         [3.0, 7.0, 10.0, 12.0, 1.0], [1.0, 4.0, 13.0, 7.0, 3.0]],
        dtype=np.float32)
    np_scores = np.array([0.6, 0.9, 0.7, 0.2], dtype=np.float32)
    inds = nms_bev(np_boxes, np_scores, thresh=0.3)
    np.testing.assert_array_equal(inds, np.array([1, 0, 3]))


def test_nms_normal_bev_golden():
    np_boxes = np.array(
        [[6.0, 3.0, 8.0, 7.0, 2.0], [3.0, 6.0, 9.0, 11.0, 1.0],
         [3.0, 7.0, 10.0, 12.0, 1.0], [1.0, 4.0, 13.0, 7.0, 3.0]],
        dtype=np.float32)
    np_scores = np.array([0.6, 0.9, 0.7, 0.2], dtype=np.float32)
    inds = nms_normal_bev(np_boxes, np_scores, thresh=0.3)
    np.testing.assert_array_equal(inds, np.array([1, 0, 3]))


def test_depth_boxes3d_properties_golden():
    """Self-contained slice of test_box3d.py:1198-1216."""
    np_boxes = np.array(
        [[1.4856, 2.5299, -0.5570, 0.9385, 2.1404, 0.8954, 3.0601],
         [2.3262, 3.3065, 0.44255, 0.8234, 0.5325, 1.0099, 2.9971]],
        dtype=np.float32)
    boxes = DepthBoxes3D(np_boxes)
    np.testing.assert_allclose(boxes.tensor, np_boxes)
    assert boxes.volume.shape[0] == 2
    np.testing.assert_allclose(boxes.bottom_center, np_boxes[:, :3])
    np.testing.assert_allclose(
        boxes.gravity_center,
        np.array([[1.4856, 2.5299, -0.1093], [2.3262, 3.3065, 0.9475]]),
        atol=1e-4)
    np.testing.assert_allclose(
        boxes.bev,
        np.array([[1.4856, 2.5299, 0.9385, 2.1404, 3.0601],
                  [2.3262, 3.3065, 0.8234, 0.5325, 2.9971]]),
        atol=1e-4)
