"""Cross-scene pipelining A/B: does processing TWO scenes in one program
beat 2x the single-scene time on one chip?

Hypothesis under test (round-3 verdict item 2a): the lifting is
copy-issue-bound while the trunk is MXU-bound, so overlapping scene p+1's
trunk with scene p's lifting could hide up to ~1.3x for a THROUGHPUT
metric.  On a single TPU core, however, XLA executes one op at a time per
program and one program at a time per core — a Pallas gather kernel
occupies the core even though the MXU idles, so the overlap is only real
if XLA's scheduler interleaves independent HLOs' DMA phases.  This measures
it directly: jit(vmap(fwd)) over 2 stacked scenes vs 2x jit(fwd).

MEASURED (v5e, 2026-08-20, 40 views, indoor+auto budget): single scene
155.8 ms (6.417 scenes/s); 2-scene vmap 339.0 ms = 5.900 scenes/s =
**0.919x vs 2x single** — a clean NEGATIVE.  There is no idle engine to
overlap into; vmap only doubles each op's working set (slightly hurting
the gather kernels' locality).  Not shipped anywhere.

Run: python -m experiments.bench_batch2 [n_views]
"""
import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _example_scene
from sgcdet_tpu.configs.config import get_config
from sgcdet_tpu.models import SGCDet
from sgcdet_tpu.utils.visibility import derive_visibility_budgets


def main():
    n_views = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    cfg = get_config("scannet")
    scenes = [
        _example_scene(cfg.data.img_shape, cfg.data.pad_size, n_views,
                       rng=np.random.RandomState(s), trajectory="indoor")
        for s in (0, 1)
    ]
    budget = derive_visibility_budgets(
        [(np.asarray(s["origin"]), np.asarray(s["proj_img"])) for s in scenes],
        cfg.data.img_shape, cfg.model,
    )
    mcfg = dataclasses.replace(cfg.model, visibility_budget=budget)
    model = SGCDet(cfg=mcfg, img_shape=cfg.data.img_shape, query_chunk=100)
    s0 = scenes[0]
    variables = jax.jit(lambda r, a, b, c, d: model.init(
        {"params": r}, a, b, c, d, train=False))(
        jax.random.PRNGKey(0), s0["imgs"], s0["proj_img"], s0["proj_feat4"],
        s0["origin"])

    def fwd(v, imgs, proj_img, proj4, origin):
        out = model.apply(v, imgs, proj_img, proj4, origin, train=False)
        return sum(jnp.sum(jnp.abs(x))
                   for x in jax.tree_util.tree_leaves(out["head_outs"]))

    f1 = jax.jit(fwd)
    f2 = jax.jit(lambda v, a, b, c, d: jnp.sum(
        jax.vmap(lambda aa, bb, cc, dd: fwd(v, aa, bb, cc, dd))(a, b, c, d)))

    args1 = (variables, s0["imgs"], s0["proj_img"], s0["proj_feat4"],
             s0["origin"])
    stack = lambda k: jnp.stack([s[k] for s in scenes])
    args2 = (variables, stack("imgs"), stack("proj_img"), stack("proj_feat4"),
             stack("origin"))

    def slope(fn, args, iters=6):
        float(fn(*args))

        def run(m):
            o = None
            t0 = time.perf_counter()
            for _ in range(m):
                o = fn(*args)
            float(o)
            return time.perf_counter() - t0

        lo = min(run(1), run(1))
        hi = min(run(1 + iters), run(1 + iters))
        return (hi - lo) / iters

    t1 = slope(f1, args1)
    t2 = slope(f2, args2)
    print(f"single scene: {t1*1e3:7.1f} ms  ({1/t1:.3f} scenes/s)")
    print(f"2-scene vmap: {t2*1e3:7.1f} ms  ({2/t2:.3f} scenes/s, "
          f"{2*t1/t2:.3f}x vs 2x single)")


if __name__ == "__main__":
    main()
