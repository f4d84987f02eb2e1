"""Tiny end-to-end test of the ARKit configuration (yawed boxes: SunRGBD-style
head, rotated IoU loss, rotated BEV NMS)."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgcdet_tpu.configs import arkit
from sgcdet_tpu.models import SGCDet
from sgcdet_tpu.models.detector import compute_losses
from tests.test_model_forward import make_scene, tiny_config


@pytest.fixture(scope="module")
def arkit_tiny():
    cfg = tiny_config(arkit(), head_type="sunrgbd")
    scene = make_scene(cfg.data.img_shape, cfg.data.pad_size)
    model = SGCDet(cfg=cfg.model, img_shape=cfg.data.img_shape, query_chunk=None)
    variables = jax.jit(
        lambda r, a, b, c, d: model.init({"params": r}, a, b, c, d, train=False)
    )(jax.random.PRNGKey(0), scene["imgs"], scene["proj_img"], scene["proj_feat4"],
      scene["origin"])
    return cfg, model, variables, scene


def test_arkit_forward_and_loss(arkit_tiny):
    cfg, model, variables, scene = arkit_tiny
    out = jax.jit(lambda v, a, b, c, d: model.apply(v, a, b, c, d, train=False))(
        variables, scene["imgs"], scene["proj_img"], scene["proj_feat4"],
        scene["origin"],
    )
    # 7 regression outputs: 6 distances + yaw
    assert out["head_outs"][0][1].shape[0] == 7
    b = cfg.data.max_boxes
    gt_boxes = np.zeros((b, 7), np.float32)
    gt_boxes[:2] = [[0, 0, 0.5, 1, 1, 1, 0.3], [0.5, 0.5, 0.8, 0.8, 0.6, 1.2, -0.5]]
    gt_labels = np.zeros(b, np.int32)
    gt_mask = np.zeros(b, bool)
    gt_mask[:2] = True
    losses, n_pos = jax.jit(
        lambda o, og, bb, ll, mm: compute_losses(cfg.model, o, og, bb, ll, mm)
    )(out, scene["origin"], jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
      jnp.asarray(gt_mask))
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_arkit_decode_rotated_nms(arkit_tiny):
    from sgcdet_tpu.models.det_head import decode_bboxes

    cfg, model, variables, scene = arkit_tiny
    out = jax.jit(lambda v, a, b, c, d: model.apply(v, a, b, c, d, train=False))(
        variables, scene["imgs"], scene["proj_img"], scene["proj_feat4"],
        scene["origin"],
    )
    head_outs = jax.tree_util.tree_map(np.asarray, out["head_outs"])
    boxes, scores, labels = decode_bboxes(
        head_outs, np.asarray(out["valid"]), np.asarray(scene["origin"]),
        cfg.model.voxel_size, cfg.model,
    )
    assert boxes.ndim == 2 and boxes.shape[1] == 7  # yawed boxes
    assert len(boxes) == len(scores) == len(labels)
