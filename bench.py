"""Benchmark: multi-view scenes/sec on the flagship ScanNet SGCDet inference
path (backbone -> FPN -> depth -> lifting -> neck -> head) on whatever device
jax sees (the driver runs this on one real TPU chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md); the
PyTorch+CUDA reference measured on a consumer GPU runs ~1 scene/sec at the
40-view train setting (order-of-magnitude anchor) — we report value/1.0 until
a measured reference number lands in BASELINE.json.
"""
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import jax

    from __graft_entry__ import _example_scene
    from sgcdet_tpu.configs import scannet

    from sgcdet_tpu.models import SGCDet

    cfg = scannet()
    n_views = 40  # the reference's training view count per scene
    scene = _example_scene(cfg.data.img_shape, cfg.data.pad_size, n_views)
    model = SGCDet(cfg=cfg.model, img_shape=cfg.data.img_shape, query_chunk=100)

    init = jax.jit(lambda r, a, b, c, d: model.init(
        {"params": r}, a, b, c, d, train=False))
    variables = init(jax.random.PRNGKey(0), scene["imgs"], scene["proj_img"],
                     scene["proj_feat4"], scene["origin"])

    import jax.numpy as jnp

    @jax.jit
    def fwd(v, imgs, proj_img, proj4, origin):
        out = model.apply(v, imgs, proj_img, proj4, origin, train=False)
        # reduce on device so the per-iteration host fetch is one scalar
        checksum = sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(out["head_outs"]))
        return out["head_outs"], out["valid"], checksum

    args = (variables, scene["imgs"], scene["proj_img"], scene["proj_feat4"],
            scene["origin"])
    # warmup / compile; force with a real host fetch (block_until_ready alone
    # does not reliably wait on the axon-tunnel platform)
    float(fwd(*args)[2])

    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        s = float(fwd(*args)[2])
    dt = time.perf_counter() - t0
    assert np.isfinite(s)
    scenes_per_sec = n_iters / dt

    print(json.dumps({
        "metric": "multiview_scenes_per_sec_40views",
        "value": round(scenes_per_sec, 4),
        "unit": "scenes/sec/chip",
        "vs_baseline": round(scenes_per_sec / 1.0, 4),
    }))


if __name__ == "__main__":
    main()
