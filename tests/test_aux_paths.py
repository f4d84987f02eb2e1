"""Auxiliary config branches: gt-depth lifting, depth loss, checkpoint
round-trip, pose-knn neighbor selection."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgcdet_tpu.configs import scannet
from sgcdet_tpu.models import SGCDet
from sgcdet_tpu.models.detector import compute_losses
from tests.test_model_forward import make_scene, tiny_config


def test_use_gt_dpt_and_depth_loss_paths():
    base = tiny_config(scannet())
    # downsample_factor must match the stride-4 depth head for the loss to be
    # shape-consistent (the reference's ScanNet ds=8 is only ever used with
    # depth_loss=False; ARKit uses ds=4)
    mc = dataclasses.replace(base.model, depth_loss=True, downsample_factor=4)
    cfg = dataclasses.replace(base, model=mc)
    scene = make_scene(cfg.data.img_shape, cfg.data.pad_size)
    rng = np.random.RandomState(0)
    gt_depth = jnp.asarray(
        rng.uniform(0.5, 4.0, (3, *cfg.data.pad_size)).astype(np.float32)
    )
    model = SGCDet(cfg=mc, img_shape=cfg.data.img_shape, query_chunk=None)
    variables = jax.jit(
        lambda r, a, b, c, d, g: model.init(
            {"params": r}, a, b, c, d, gt_depth=g, train=False
        )
    )(jax.random.PRNGKey(0), scene["imgs"], scene["proj_img"],
      scene["proj_feat4"], scene["origin"], gt_depth)
    out = model.apply(
        variables, scene["imgs"], scene["proj_img"], scene["proj_feat4"],
        scene["origin"], gt_depth=gt_depth, train=False,
    )
    b = cfg.data.max_boxes
    gt_boxes = np.zeros((b, 7), np.float32)
    gt_boxes[0] = [0, 0, 0.5, 1, 1, 1, 0]
    losses, _ = compute_losses(
        mc, out, scene["origin"], jnp.asarray(gt_boxes),
        jnp.zeros(b, jnp.int32), jnp.asarray(np.arange(b) < 1), gt_depth=gt_depth,
    )
    assert "loss_dpt" in losses
    assert np.isfinite(float(losses["loss_dpt"]))

    # gt-depth lifting path (no depth net at all)
    mc2 = dataclasses.replace(base.model, use_gt_dpt=True)
    model2 = SGCDet(cfg=mc2, img_shape=cfg.data.img_shape, query_chunk=None)
    v2 = jax.jit(
        lambda r, a, b_, c, d, g: model2.init(
            {"params": r}, a, b_, c, d, gt_depth=g, train=False
        )
    )(jax.random.PRNGKey(0), scene["imgs"], scene["proj_img"],
      scene["proj_feat4"], scene["origin"], gt_depth)
    out2 = model2.apply(
        v2, scene["imgs"], scene["proj_img"], scene["proj_feat4"],
        scene["origin"], gt_depth=gt_depth, train=False,
    )
    d = np.asarray(out2["dpt_dist"])
    assert d.shape[1] == mc2.depth_channels
    # one-hot rows sum to 1 where depth valid
    sums = d.sum(axis=1)
    assert ((sums > 0.99) | (sums < 0.01)).all()


def test_checkpoint_roundtrip(tmp_path):
    import orbax.checkpoint as ocp
    from flax import struct

    @struct.dataclass
    class S:
        step: jnp.ndarray
        params: dict

    state = S(step=jnp.asarray(7), params={"w": jnp.arange(6.0).reshape(2, 3)})
    ckptr = ocp.StandardCheckpointer()
    path = tmp_path / "ckpt"
    ckptr.save(path / "step_7", jax.tree_util.tree_map(np.asarray, state))
    ckptr.wait_until_finished()
    restored = ckptr.restore(path / "step_7", state)
    assert int(restored.step) == 7
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.arange(6.0).reshape(2, 3))


def test_knn_pose_neighbors():
    from sgcdet_tpu.models.depth_net import get_nearest_pose_ids

    poses = []
    for i in range(5):
        p = np.eye(4, dtype=np.float32)
        p[:3, 3] = [float(i), 0, 0]
        poses.append(p)
    poses = jnp.asarray(np.stack(poses))
    ids = np.asarray(get_nearest_pose_ids(poses, poses, 2, maskself=True))
    # camera 2's nearest (excluding itself) are 1 and 3
    assert set(ids[2].tolist()) == {1, 3}
    assert 0 not in ids[0]  # self masked


def test_checkpoint_retention_and_latest(tmp_path):
    """save_checkpoint keeps every per-epoch dir and `last` names the newest;
    latest_checkpoint restores the kill/restart auto-resume entrypoint
    (reference ModelCheckpoint save_top_k=-1 + save_last, main.py:55-61)."""
    from flax import struct

    from sgcdet_tpu.train.checkpoint import (
        latest_checkpoint, restore_checkpoint, save_checkpoint)

    @struct.dataclass
    class S:
        step: jnp.ndarray
        params: dict

    path = str(tmp_path / "ckpt")
    for step in (3, 7):
        state = S(step=jnp.asarray(step), params={"w": jnp.full((2,), float(step))})
        save_checkpoint(path, state, step)
    assert (tmp_path / "ckpt" / "step_3").is_dir()  # retention: all kept
    last = latest_checkpoint(path)
    assert last is not None and last.endswith("step_7")
    restored = restore_checkpoint(last, S(step=jnp.asarray(0), params={"w": jnp.zeros(2)}))
    assert int(restored.step) == 7
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 7.0)
    # pointer file survives a missing dir: falls back to max step_N
    (tmp_path / "ckpt" / "last").write_text("step_999")
    assert latest_checkpoint(path).endswith("step_7")
    assert latest_checkpoint(str(tmp_path / "nope")) is None


def test_multihost_eval_gather(tmp_path):
    """Two simulated hosts shard the val set, ship detections through the
    gather dir, and host 0 merges in scene order (pl_model.py:59-74 analog)."""
    from sgcdet_tpu.eval.gather import gather_detections
    from sgcdet_tpu.geometry import DepthBoxes3D

    def det_for(i, n_boxes):
        boxes = np.tile(
            np.asarray([[i, i, 0.5, 1, 1, 1, 0]], np.float32), (n_boxes, 1))
        return dict(
            boxes_3d=DepthBoxes3D(boxes, box_dim=7, with_yaw=True,
                                  origin=(0.5, 0.5, 0.5)),
            scores_3d=np.full((n_boxes,), 0.5, np.float32),
            labels_3d=np.zeros((n_boxes,), np.int64),
        )

    n_scenes = 5
    shards = {0: list(range(0, n_scenes, 2)), 1: list(range(1, n_scenes, 2))}
    dt = {h: [det_for(i, n_boxes=i + 1) for i in idx] for h, idx in shards.items()}
    gdir = str(tmp_path / "gather")
    # host 1 first (writes + returns None), then host 0 (merges)
    assert gather_detections(gdir, 1, 2, shards[1], dt[1]) is None
    merged = gather_detections(gdir, 0, 2, shards[0], dt[0])
    assert len(merged) == n_scenes
    for i, det in enumerate(merged):
        assert len(det["boxes_3d"]) == i + 1
        src = det_for(i, i + 1)
        np.testing.assert_allclose(det["boxes_3d"].tensor,
                                   src["boxes_3d"].tensor, atol=1e-6)
        assert det["boxes_3d"].with_yaw
