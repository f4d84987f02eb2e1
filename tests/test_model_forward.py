"""End-to-end model tests on tiny shapes (compile-cached between runs)."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgcdet_tpu.configs import scannet, arkit, get_config
from sgcdet_tpu.geometry import compute_projection
from sgcdet_tpu.models import SGCDet
from sgcdet_tpu.models.detector import compute_losses


def tiny_config(base, head_type=None):
    mc = dataclasses.replace(
        base.model,
        n_voxels_list=((4, 4, 2), (8, 8, 4), (16, 16, 8)),
        topk_list=(32, 128),
        embed_dims=32,
        n_classes=5,
        limit=4,
        centerness_topk=4,
        **({"head_type": head_type, "n_reg_outs": 7} if head_type else {}),
    )
    dc = dataclasses.replace(base.data, img_shape=(60, 80), pad_size=(64, 80), max_boxes=8)
    return dataclasses.replace(base, model=mc, data=dc)


def make_scene(img_shape, pad, n_views=3, seed=0):
    rng = np.random.RandomState(seed)
    imgs = rng.randn(n_views, 3, *pad).astype(np.float32)
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 300
    intr[0, 2], intr[1, 2] = 160, 120
    exts = []
    for i in range(n_views):
        e = np.eye(4, dtype=np.float32)
        e[:3, 3] = [0.1 * i, 0, 2.0]
        exts.append(e)
    exts = np.stack(exts)
    ori_h = 240
    proj_img = compute_projection(intr, exts, ori_h, img_shape[0], 1)
    ratio4 = ori_h / (img_shape[0] / 4)
    intr4 = intr.copy()
    intr4[:2] /= ratio4
    proj4 = np.einsum("ij,njk->nik", intr4, exts)
    return dict(
        imgs=jnp.asarray(imgs),
        proj_img=jnp.asarray(proj_img),
        proj_feat4=jnp.asarray(proj4),
        origin=jnp.asarray([0.0, 0.0, 0.5]),
    )


@pytest.fixture(scope="module")
def scannet_tiny():
    cfg = tiny_config(scannet())
    scene = make_scene(cfg.data.img_shape, cfg.data.pad_size)
    model = SGCDet(cfg=cfg.model, img_shape=cfg.data.img_shape, query_chunk=None)
    variables = jax.jit(
        lambda r, a, b, c, d: model.init({"params": r}, a, b, c, d, train=False)
    )(jax.random.PRNGKey(0), scene["imgs"], scene["proj_img"], scene["proj_feat4"],
      scene["origin"])
    return cfg, model, variables, scene


def test_forward_shapes(scannet_tiny):
    cfg, model, variables, scene = scannet_tiny
    out = jax.jit(lambda v, a, b, c, d: model.apply(v, a, b, c, d, train=False))(
        variables, scene["imgs"], scene["proj_img"], scene["proj_feat4"], scene["origin"]
    )
    sizes = cfg.model.n_voxels_list[-1]
    assert out["valid"].shape == sizes
    assert out["dpt_dist"].shape == (3, cfg.model.depth_channels, 16, 20)  # padded-image stride 4
    for i, (c, b, s) in enumerate(out["head_outs"]):
        f = tuple(v // (2**i) for v in sizes)
        assert c.shape == (1, *f)
        assert b.shape == (cfg.model.n_reg_outs, *f)
        assert s.shape == (cfg.model.n_classes, *f)
    # depth dist is a distribution
    sums = np.asarray(out["dpt_dist"].sum(axis=1))
    np.testing.assert_allclose(sums, 1.0, atol=1e-4)
    # occ preds are probabilities over the two finer levels
    v1 = int(np.prod(cfg.model.n_voxels_list[1]))
    v2 = int(np.prod(cfg.model.n_voxels_list[2]))
    assert out["occ_preds"].shape == (v1 + v2,)


def test_losses_finite_and_positive(scannet_tiny):
    cfg, model, variables, scene = scannet_tiny
    out = jax.jit(lambda v, a, b, c, d: model.apply(v, a, b, c, d, train=False))(
        variables, scene["imgs"], scene["proj_img"], scene["proj_feat4"], scene["origin"]
    )
    b = cfg.data.max_boxes
    gt_boxes = np.zeros((b, 7), np.float32)
    gt_boxes[:2] = [[0, 0, 0.5, 1, 1, 1, 0], [0.5, 0.5, 0.8, 0.8, 0.6, 1.2, 0]]
    gt_labels = np.zeros(b, np.int32)
    gt_mask = np.zeros(b, bool)
    gt_mask[:2] = True
    losses, n_pos = jax.jit(
        lambda o, og, bb, ll, mm: compute_losses(cfg.model, o, og, bb, ll, mm)
    )(out, scene["origin"], jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
      jnp.asarray(gt_mask))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
        assert float(v) >= 0, k
    assert set(losses) == {"loss_centerness", "loss_bbox", "loss_cls", "loss_occ"}


def test_grad_flows_excluding_frozen(scannet_tiny):
    cfg, model, variables, scene = scannet_tiny
    b = cfg.data.max_boxes
    gt_boxes = np.zeros((b, 7), np.float32)
    gt_boxes[0] = [0, 0, 0.5, 1, 1, 1, 0]
    gt_labels = np.zeros(b, np.int32)
    gt_mask = np.zeros(b, bool)
    gt_mask[0] = True

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            scene["imgs"], scene["proj_img"], scene["proj_feat4"], scene["origin"],
            train=False,
        )
        losses, _ = compute_losses(
            cfg.model, out, scene["origin"], jnp.asarray(gt_boxes),
            jnp.asarray(gt_labels), jnp.asarray(gt_mask),
        )
        return sum(losses.values())

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for _, g in flat)
    assert nonzero > len(flat) * 0.5  # most params receive gradient
    # a deep one: the level-0 transformer value projection
    g = grads["voxel_head"]["base_head0"]["layer0"]["cross_attn"][
        "deformable_attention"]["value_proj"]["kernel"]
    assert float(jnp.abs(g).sum()) > 0


def test_decode_runs(scannet_tiny):
    from sgcdet_tpu.models.det_head import decode_bboxes

    cfg, model, variables, scene = scannet_tiny
    out = jax.jit(lambda v, a, b, c, d: model.apply(v, a, b, c, d, train=False))(
        variables, scene["imgs"], scene["proj_img"], scene["proj_feat4"], scene["origin"]
    )
    head_outs = jax.tree_util.tree_map(np.asarray, out["head_outs"])
    boxes, scores, labels = decode_bboxes(
        head_outs, np.asarray(out["valid"]), np.asarray(scene["origin"]),
        cfg.model.voxel_size, cfg.model,
    )
    assert boxes.ndim == 2 and boxes.shape[1] == 6
    assert len(boxes) == len(scores) == len(labels)
