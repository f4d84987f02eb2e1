"""Probe: where does dryrun_multichip's XLA:CPU compile time go, and what do
the diet levers buy?  Run: python experiments/probe_dryrun_compile.py [opt0]

Levers probed:
- full-topk tiny config (kills the _train_valid simulation programs)
- eager vs jitted init
- --xla_backend_optimization_level=0 (pass "opt0" argv)
"""
import os
import sys
import time

if "opt0" in sys.argv[1:]:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_backend_optimization_level=0"
    )
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
# no persistent cache: we want cold numbers
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()


def tick(msg):
    print(f"[{time.time() - t0:7.1f}s] {msg}", flush=True)


from sgcdet_tpu.configs import scannet
from sgcdet_tpu.parallel import make_mesh, batch_sharding, replicated_sharding
from sgcdet_tpu.train.loop import init_train_state, make_train_step

cfg = scannet()
tiny_model = dataclasses.replace(
    cfg.model,
    n_voxels_list=((2, 2, 1), (4, 4, 2), (8, 8, 4)),
    topk_list=(32, 256),  # == FULL voxel counts: top-k selects everything
    embed_dims=16,
    n_classes=3,
    limit=4,
    centerness_topk=4,
    num_heads=2,
    dbound=(0.2, 5.0, 0.8),  # 6 planes
)
tiny_data = dataclasses.replace(
    cfg.data, img_shape=(60, 80), pad_size=(64, 80), max_boxes=4
)
tiny = dataclasses.replace(cfg, model=tiny_model, data=tiny_data)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from __graft_entry__ import _example_scene

n_views = 3
scene = _example_scene(tiny.data.img_shape, tiny.data.pad_size, n_views)
tick("scene built")

mesh = make_mesh(jax.devices()[:8], ("data",))
model, state, tx = init_train_state(tiny, jax.random.PRNGKey(0), scene,
                                    query_chunk=None)
tick("init_train_state (jit init) done")

step_fn = make_train_step(model, tiny, tx, mesh=mesh, axis_name="data")

b = 8
from sgcdet_tpu.geometry.voxel_grid import voxel_centers_zero_origin
nvox = tiny.model.n_voxels_list[-1]
centers = np.asarray(voxel_centers_zero_origin(
    nvox, tiny.model.voxel_size_list[-1]))[[0, 37, 200]]
boxes = np.zeros((tiny.data.max_boxes, 7), np.float32)
boxes[:3, :3] = centers + np.asarray(scene["origin"])[None]
boxes[:3, 3:6] = 1.2 * np.asarray(tiny.model.voxel_size_list[-1],
                                  np.float32)[None]
batch = {
    "imgs": jnp.tile(scene["imgs"][None], (b, 1, 1, 1, 1)),
    "proj_img": jnp.tile(scene["proj_img"][None], (b, 1, 1, 1)),
    "proj_feat4": jnp.tile(scene["proj_feat4"][None], (b, 1, 1, 1)),
    "origin": jnp.tile(scene["origin"][None], (b, 1)),
    "gt_boxes": jnp.tile(jnp.asarray(boxes)[None], (b, 1, 1)),
    "gt_labels": jnp.zeros((b, tiny.data.max_boxes), jnp.int32),
    "gt_mask": jnp.asarray(np.arange(tiny.data.max_boxes)[None, :] < 3).repeat(b, 0),
}
bs = batch_sharding(mesh)
batch = {k: jax.device_put(v, bs) for k, v in batch.items()}
state = jax.device_put(state, replicated_sharding(mesh))
tick("batch staged")

new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
jax.block_until_ready(metrics)
tick(f"dp train step compiled+ran: {dict((k, float(v)) for k, v in metrics.items())}")
assert float(metrics["n_pos"]) > 0, metrics
assert float(metrics["loss_bbox"]) > 0, metrics
tick("asserts OK")
