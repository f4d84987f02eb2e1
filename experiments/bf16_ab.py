"""mAP-level bf16-vs-f32 A/B on synthetic scenes (reconstruction of the
2026-08-17 experiment whose results are tabled in docs/parity.md).

Output-level dtype deltas on RANDOM weights are a worst case: untrained
occupancy scores are noise, so rank flips in the sparse top-k look alarming
but say nothing about a trained model.  This script instead
  1. builds a real SGCDet (ScanNet heads; --scale small = shrunken volume,
     --scale released = the full released 40x40x16 / embed-256 config),
  2. OVERFITS it on n synthetic scenes with box/centerness/cls losses
     until the detector is confident (peaked scores around the decode/NMS
     thresholds, like a trained model),
  3. evaluates the SAME weights through forward -> decode -> NMS ->
     indoor_eval under compute_dtype float32 and bfloat16,
and prints the mAP/mAR table plus the max decoded box/score drift per
scene.  Run (TPU or CPU, CPU is slow):
    python -m experiments.bf16_ab [steps] [scale] [n_scenes] [n_views]
e.g. the round-4 released-scale run: python -m experiments.bf16_ab 600 released 20 8
"""
import dataclasses
import sys

import numpy as np


def synth_scene(cfg, n_views, rng, n_boxes=3):
    """Bench scene + synthetic axis-aligned GT boxes inside the volume."""
    import jax.numpy as jnp

    from __graft_entry__ import _example_scene

    scene = _example_scene(cfg.data.img_shape, cfg.data.pad_size, n_views,
                           rng=rng, trajectory="indoor")
    nv = np.asarray(cfg.model.n_voxels, np.float32)
    vs = np.asarray(cfg.model.voxel_size, np.float32)
    origin = np.asarray(scene["origin"], np.float32)
    lo = origin - nv * vs / 2.0
    hi = origin + nv * vs / 2.0
    centers = rng.uniform(lo + 0.35 * (hi - lo), hi - 0.35 * (hi - lo),
                          size=(n_boxes, 3)).astype(np.float32)
    sizes = rng.uniform(0.6, 1.4, size=(n_boxes, 3)).astype(np.float32)
    boxes = np.concatenate([centers, sizes], axis=1)  # (B, 6) scannet-style
    labels = rng.randint(0, len(cfg.data.classes), size=(n_boxes,))
    max_boxes = cfg.data.max_boxes
    gt_boxes = np.zeros((max_boxes, 6), np.float32)
    gt_labels = np.zeros((max_boxes,), np.int32)
    gt_mask = np.zeros((max_boxes,), bool)
    gt_boxes[:n_boxes] = boxes
    gt_labels[:n_boxes] = labels
    gt_mask[:n_boxes] = True
    scene = dict(scene)
    scene.update(
        gt_boxes=jnp.asarray(gt_boxes),
        gt_labels=jnp.asarray(gt_labels),
        gt_mask=jnp.asarray(gt_mask),
    )
    scene["_np_gt"] = (boxes, labels)
    return scene


def small_config():
    from sgcdet_tpu.configs.config import get_config

    cfg = get_config("scannet")
    model = dataclasses.replace(
        cfg.model,
        n_voxels_list=((5, 5, 2), (10, 10, 4), (20, 20, 8)),
        topk_list=(200, 1600),
        compute_dtype="float32")
    data = dataclasses.replace(cfg.data, img_shape=(120, 160),
                               pad_size=(120, 160), max_boxes=8)
    return dataclasses.replace(cfg, model=model, data=data)


def released_config():
    """The full released ScanNet scale (40x40x16 finest volume, embed 256,
    18 classes, 240x320 images) — only the image pad and GT pad stay
    data-side knobs."""
    from sgcdet_tpu.configs.config import get_config

    cfg = get_config("scannet")
    model = dataclasses.replace(cfg.model, compute_dtype="float32")
    data = dataclasses.replace(cfg.data, max_boxes=8)
    return dataclasses.replace(cfg, model=model, data=data)


def evaluate(cfg, model, params, batch_stats, scenes):
    import jax
    import jax.numpy as jnp

    from sgcdet_tpu.eval import indoor_eval
    from sgcdet_tpu.geometry import DepthBoxes3D
    from sgcdet_tpu.models.det_head import decode_bboxes

    @jax.jit
    def fwd(p, bs, imgs, proj_img, proj4, origin):
        return model.apply({"params": p, "batch_stats": bs}, imgs, proj_img,
                           proj4, origin, train=False)

    dt_annos, gt_annos = [], []
    for scene in scenes:
        out = fwd(params, batch_stats, scene["imgs"], scene["proj_img"],
                  scene["proj_feat4"], scene["origin"])
        head_outs = jax.tree_util.tree_map(np.asarray, out["head_outs"])
        valid = np.asarray(out["valid"])
        boxes, scores, labels = decode_bboxes(
            head_outs, valid, scene["origin"], cfg.model.voxel_size, cfg.model)
        det = DepthBoxes3D(
            boxes, box_dim=boxes.shape[-1] if len(boxes) else 6,
            with_yaw=False, origin=(0.5, 0.5, 0.5))
        dt_annos.append(dict(boxes_3d=det, scores_3d=scores, labels_3d=labels))
        gb, gl = scene["_np_gt"]
        gt_annos.append(dict(
            gt_boxes_upright_depth=gb, gt_num=len(gl),
            **{"class": gl.astype(np.int64)}))
    label2cat = dict(enumerate(cfg.data.classes))
    # yaw-less handling is inferred from the 6-dim boxes (with_yaw=False)
    metrics = indoor_eval(gt_annos, dt_annos, [0.25, 0.5], label2cat)
    return metrics, dt_annos


def main(steps=600, scale="small", n_scenes=3, n_views=8):
    import jax
    import jax.numpy as jnp
    import optax

    from sgcdet_tpu.models import SGCDet
    from sgcdet_tpu.models.layers import set_compute_dtype
    from sgcdet_tpu.train.loop import TrainState, make_train_step

    cfg = released_config() if scale == "released" else small_config()
    rng = np.random.RandomState(0)
    scenes = [synth_scene(cfg, n_views=n_views, rng=rng)
              for _ in range(n_scenes)]

    set_compute_dtype("float32")
    model = SGCDet(cfg=cfg.model, img_shape=cfg.data.img_shape,
                   query_chunk=100)
    s0 = scenes[0]
    variables = jax.jit(lambda r, a, b, c, d: model.init(
        {"params": r}, a, b, c, d, train=False))(
        jax.random.PRNGKey(0), s0["imgs"], s0["proj_img"], s0["proj_feat4"],
        s0["origin"])
    tx = optax.adamw(2e-4, weight_decay=1e-4)
    state = TrainState(
        step=0, params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]))
    step_fn = make_train_step(model, cfg, tx)

    key = jax.random.PRNGKey(1)
    for i in range(steps):
        key, k = jax.random.split(key)
        # the mesh-less train step strips a leading batch axis (bs=1)
        batch = {k2: v[None] for k2, v in scenes[i % len(scenes)].items()
                 if not k2.startswith("_")}
        state, metrics = step_fn(state, batch, k)
        if i % 50 == 0 or i == steps - 1:
            print(f"step {i}: " + " ".join(
                f"{k2}={float(v):.3f}" for k2, v in metrics.items()),
                flush=True)

    results, dets = {}, {}
    for dtype in ("float32", "bfloat16"):
        set_compute_dtype(dtype)
        mcfg = dataclasses.replace(cfg.model, compute_dtype=dtype)
        m = SGCDet(cfg=mcfg, img_shape=cfg.data.img_shape, query_chunk=100)
        cfg_d = dataclasses.replace(cfg, model=mcfg)
        jax.clear_caches()
        results[dtype], dets[dtype] = evaluate(
            cfg_d, m, state.params, state.batch_stats, scenes)
        print(f"[{dtype}] " + " ".join(
            f"{k}={v:.4f}" for k, v in results[dtype].items()
            if isinstance(v, float)), flush=True)

    # decoded-box / score drift per scene (same weights, dtype-only delta);
    # box counts can differ when a score crosses the decode threshold, so
    # compare the common prefix and report the count delta too
    drift_b = drift_s = 0.0
    n_delta = 0
    for da, db in zip(dets["float32"], dets["bfloat16"]):
        ba, bb = np.asarray(da["boxes_3d"].tensor), np.asarray(
            db["boxes_3d"].tensor)
        m0 = min(len(ba), len(bb))
        n_delta = max(n_delta, abs(len(ba) - len(bb)))
        if m0:
            drift_b = max(drift_b, float(np.abs(ba[:m0] - bb[:m0]).max()))
            sa = np.asarray(da["scores_3d"])[:m0]
            sb = np.asarray(db["scores_3d"])[:m0]
            drift_s = max(drift_s, float(np.abs(sa - sb).max()))
    print(f"\nmax decoded-box drift {drift_b:.4g}, max score drift "
          f"{drift_s:.4g}, max det-count delta {n_delta}")

    print(f"\n| metric ({scale}, {n_scenes} scenes, {n_views} views) "
          f"| float32 | bfloat16 | delta |")
    print("|---|---|---|---|")
    keys = [k for k, v in results["float32"].items() if isinstance(v, float)]
    for k in keys:
        a, b = results["float32"][k], results["bfloat16"][k]
        print(f"| {k} | {a:.4f} | {b:.4f} | {b - a:+.4f} |")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 600,
         sys.argv[2] if len(sys.argv) > 2 else "small",
         int(sys.argv[3]) if len(sys.argv) > 3 else 3,
         int(sys.argv[4]) if len(sys.argv) > 4 else 8)
