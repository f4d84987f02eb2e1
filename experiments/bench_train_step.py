"""On-chip training-step time at the reference's train setting (bs=1,
40 views, ScanNet).  The reference trains bs=1/GPU with 40 random views
(configs/SGCDet_ScanNet.py:139,194-207); this measures our full step —
forward + backward + AdamW — on one chip via the slope method.

Run: python -m experiments.bench_train_step [cfg] [n_views] [trajectory]
     [budget|'auto'|'none']
"""
import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _example_scene
from sgcdet_tpu.configs.config import get_config
from sgcdet_tpu.train.loop import init_train_state, make_train_step


def main(cfg_name="scannet", n_views=40, trajectory="indoor", budget="auto"):
    cfg = get_config(cfg_name)
    scene = _example_scene(cfg.data.img_shape, cfg.data.pad_size, n_views,
                           trajectory=trajectory)
    if budget == "auto":
        from sgcdet_tpu.utils.visibility import derive_visibility_budget

        budget = derive_visibility_budget(
            [(np.asarray(scene["origin"]), np.asarray(scene["proj_img"]))],
            cfg.data.img_shape, cfg.model,
        )
        print(f"auto visibility budget: {budget:.3f}")
        if budget >= 1.0:
            budget = None
    elif budget in ("none", None):
        budget = None
    else:
        budget = float(budget)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, visibility_budget=budget,
                                       depth_loss=True))

    rng = np.random.RandomState(3)
    max_boxes = 16
    boxes = np.zeros((max_boxes, 7), np.float32)  # loader pads GT to 7 cols
    boxes[:, :3] = rng.uniform(-2, 2, (max_boxes, 3))
    boxes[:, 3:6] = rng.uniform(0.3, 1.5, (max_boxes, 3))
    scene = dict(
        scene,
        gt_boxes=jnp.asarray(boxes),
        gt_labels=jnp.asarray(
            rng.randint(0, cfg.model.n_classes, max_boxes).astype(np.int32)),
        gt_mask=jnp.asarray((np.arange(max_boxes) < 8)),
        # GT depth at downsample_factor x the stride-4 prediction grid
        # (ScanNet: 480x640 native depth PNGs, ds=8; ARKit: ds=4)
        gt_depth=jnp.asarray(
            rng.uniform(
                0.5, 4.5,
                (n_views,
                 cfg.data.pad_size[0] // 4 * cfg.model.downsample_factor,
                 cfg.data.pad_size[1] // 4 * cfg.model.downsample_factor),
            ).astype(np.float32)),
    )

    model, state, tx = init_train_state(cfg, jax.random.PRNGKey(0), scene)
    step = make_train_step(model, cfg, tx)
    key = jax.random.PRNGKey(1)
    batch = {k: v[None] for k, v in scene.items()}  # bs=1 (mesh-less step)

    state, metrics = step(state, batch, key)  # compile + warm
    float(metrics["loss"])

    def run(m):
        s, mt = state, None
        t0 = time.perf_counter()
        for _ in range(m):
            s, mt = step(s, batch, key)
        float(mt["loss"])
        return time.perf_counter() - t0

    lo = min(run(1), run(1))
    hi = min(run(4), run(4))
    t = (hi - lo) / 3.0
    print(f"{cfg_name} {n_views}v {trajectory} budget={budget}: "
          f"{t:.3f} s/step ({1/t:.3f} steps/s)")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "scannet",
         int(a[1]) if len(a) > 1 else 40,
         a[2] if len(a) > 2 else "indoor",
         a[3] if len(a) > 3 else "auto")
