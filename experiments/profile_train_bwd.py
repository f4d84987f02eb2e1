"""Decompose the training step: where does the backward's time go?

Measures, at the bench's 40-view indoor+auto setting (depth_loss on, the
reference's train regime):
  1. full train step (fwd+bwd+AdamW)           — the bench number
  2. loss forward only (same loss assembly)     — fwd share
  3. value_and_grad of the loss                 — fwd+bwd share (no AdamW)
so bwd = (3) - (2) and optimizer/glue = (1) - (3).  Then the two dominant
gather kernels' fwd vs fwd+grad at their in-model shapes, to see how much
of the bwd is kernel scatter time vs everything else.

Run: python -m experiments.profile_train_bwd [n_views] [remat]
(pass literal "remat" to force depth_remat=True for the A/B)
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
from sgcdet_tpu.models.detector import compute_losses
from sgcdet_tpu.train.loop import init_train_state, make_train_step
from sgcdet_tpu.utils.visibility import derive_visibility_budgets


def slope(fn, *args, iters=4):
    out = fn(*args)
    jax.block_until_ready(out)

    def run(m):
        o = None
        t0 = time.perf_counter()
        for _ in range(m):
            o = fn(*args)
        jax.block_until_ready(o)
        return time.perf_counter() - t0

    lo = min(run(1), run(1))
    hi = min(run(1 + iters), run(1 + iters))
    return (hi - lo) / iters


def main(n_views=40, remat=False):
    cfg = get_config("scannet")
    if remat:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, depth_remat=True))
    print(f"depth_remat={cfg.model.depth_remat}", flush=True)
    scene = _example_scene(cfg.data.img_shape, cfg.data.pad_size, n_views,
                           trajectory="indoor")
    budget = derive_visibility_budgets(
        [(np.asarray(scene["origin"]), np.asarray(scene["proj_img"]))],
        cfg.data.img_shape, cfg.model,
    )
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, visibility_budget=budget,
                                       depth_loss=True))
    rng = np.random.RandomState(3)
    max_boxes = 16
    boxes = np.zeros((max_boxes, 7), np.float32)
    boxes[:, :3] = rng.uniform(-2, 2, (max_boxes, 3))
    boxes[:, 3:6] = rng.uniform(0.3, 1.5, (max_boxes, 3))
    dh = cfg.data.pad_size[0] // 4 * cfg.model.downsample_factor
    dw = cfg.data.pad_size[1] // 4 * cfg.model.downsample_factor
    scene = dict(
        scene,
        gt_boxes=jnp.asarray(boxes),
        gt_labels=jnp.asarray(
            rng.randint(0, cfg.model.n_classes, max_boxes).astype(np.int32)),
        gt_mask=jnp.asarray((np.arange(max_boxes) < 8)),
        gt_depth=jnp.asarray(
            rng.uniform(0.5, 4.5, (n_views, dh, dw)).astype(np.float32)),
    )
    model, state, tx = init_train_state(cfg, jax.random.PRNGKey(0), scene)
    step = make_train_step(model, cfg, tx)
    batch = {k: v[None] for k, v in scene.items()}
    key = jax.random.PRNGKey(1)
    t_step = slope(lambda: step(state, batch, key)[1]["loss"])
    print(f"full train step      {t_step*1e3:7.1f} ms", flush=True)

    def loss_fn(params):
        outputs, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            scene["imgs"], scene["proj_img"], scene["proj_feat4"],
            scene["origin"], gt_depth=scene.get("gt_depth"), train=True,
            rngs={"dropout": key}, mutable=["batch_stats"],
        )
        losses, _ = compute_losses(
            cfg.model, outputs, scene["origin"], scene["gt_boxes"],
            scene["gt_labels"], scene["gt_mask"],
            gt_depth=scene.get("gt_depth"), axis_name=None,
        )
        return sum(losses.values())

    f_fwd = jax.jit(loss_fn)
    t_fwd = slope(f_fwd, state.params)
    print(f"loss forward only    {t_fwd*1e3:7.1f} ms", flush=True)

    def vg(p):
        v, g = jax.value_and_grad(loss_fn)(p)
        # keep every grad live (returning only v lets XLA DCE the backward)
        return v + sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                       for x in jax.tree_util.tree_leaves(g))

    f_vg = jax.jit(vg)
    t_vg = slope(f_vg, state.params)
    print(f"value_and_grad       {t_vg*1e3:7.1f} ms  "
          f"(bwd = {1e3*(t_vg - t_fwd):.1f}, opt/glue = "
          f"{1e3*(t_step - t_vg):.1f})", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40,
         remat="remat" in sys.argv[1:])
