"""Decompose the lifting stage's device time at the 40-view ScanNet setting.

Times standalone pieces at the exact model shapes (slope method, forcing
host fetch): point_sampling, the stage-1 depth-weighted sample, the full
stage-2 MSDeformableAttention3D module (projections + kernel), the
inter-view fusion (masked mean + output proj + MHA pooling), and the whole
DeformCrossAttention per level.  Sum vs the ~202 ms lifting total from
experiments/profile_stages.py shows where the non-kernel time hides.

Run on the TPU: python -m experiments.profile_lifting
"""
import time

import jax
import jax.numpy as jnp

from sgcdet_tpu.configs.config import get_config
from sgcdet_tpu.models.layers import set_compute_dtype
from sgcdet_tpu.models.view_transformer import (
    DeformCrossAttention,
    MSDeformableAttention3D,
    point_sampling,
)
from sgcdet_tpu.ops.dfa3d import dfa3d_attend


def slope_time(fn, *args, iters=6):
    @jax.jit
    def scalar_fn(*a):
        out = fn(*a)
        return sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                   for x in jax.tree_util.tree_leaves(out))

    float(scalar_fn(*args))

    def run(m):
        t0 = time.perf_counter()
        o = None
        for _ in range(m):
            o = scalar_fn(*args)
        float(o)
        return time.perf_counter() - t0

    lo = min(run(1), run(1))
    hi = min(run(1 + iters), run(1 + iters))
    return (hi - lo) / iters


def main():
    cfg = get_config("scannet")
    set_compute_dtype(cfg.model.compute_dtype)
    cdt = jnp.bfloat16
    n = 40
    levels = [  # (K, H, W)
        (400, 15, 20),
        (3200, 30, 40),
        (6400, 60, 80),
    ]
    d_size, c = 12, 256
    key = jax.random.PRNGKey(0)
    total = 0.0
    for k, h, w in levels:
        ks = jax.random.split(key, 8)
        v_img = jax.random.normal(ks[0], (n, h, w, c), cdt)
        dpt = jax.nn.softmax(
            jax.random.normal(ks[1], (n, h, w, d_size)), -1).astype(cdt)
        ref_pts = jax.random.uniform(ks[2], (k, 3), jnp.float32, -3, 3)
        origin = jnp.asarray([0.0, 0.0, 0.5])
        proj = jax.random.normal(ks[3], (n, 3, 4), jnp.float32)
        query = jax.random.normal(ks[4], (k, c), cdt)
        ref_cam = jax.random.uniform(ks[5], (n, k, 3), jnp.float32, 0.05, 0.95)
        mask = jax.random.uniform(ks[6], (n, k)) > 0.2

        t_ps = slope_time(
            lambda rp, o, p: point_sampling(rp, o, p, (240, 320),
                                            (0.25, 5.05, 0.4)),
            ref_pts, origin, proj)

        locs1 = ref_cam[:, :, None, None, :].astype(jnp.float32)
        attn1 = jnp.ones((n, k, 1, 1), jnp.float32)
        t_s1 = slope_time(
            lambda v, dp, l, a: dfa3d_attend(v, dp, l, a, num_heads=1,
                                             query_chunk=100),
            v_img, dpt, locs1, attn1)

        m3 = MSDeformableAttention3D(embed_dims=c, num_heads=8, num_levels=1,
                                     num_points=4, query_chunk=100)
        qpi = jax.random.normal(ks[7], (n, k, c), cdt)
        vars3 = jax.jit(m3.init)(jax.random.PRNGKey(1), qpi, v_img, dpt,
                                 ref_cam[:, :, None, :], ((h, w),))
        t_s2 = slope_time(
            lambda p, q, v, dp, r: m3.apply(p, q, v, dp, r, ((h, w),)),
            vars3, qpi, v_img, dpt, ref_cam[:, :, None, :])

        dca = DeformCrossAttention(embed_dims=c, num_heads=8, num_points=4,
                                   num_levels=1, query_chunk=100)
        vars_d = jax.jit(
            lambda r, q, v, dp, rc, m: dca.init(
                {"params": r}, q, v, dp, rc, m, ((h, w),))
        )(jax.random.PRNGKey(2), query, v_img, dpt, ref_cam, mask)
        t_dca = slope_time(
            lambda p, q, v, dp, rc, m: dca.apply(p, q, v, dp, rc, m,
                                                 ((h, w),)),
            vars_d, query, v_img, dpt, ref_cam, mask)

        dca_ns = DeformCrossAttention(embed_dims=c, num_heads=8, num_points=4,
                                      num_levels=1, query_chunk=100,
                                      sort_queries=False)
        t_dca_ns = slope_time(
            lambda p, q, v, dp, rc, m: dca_ns.apply(p, q, v, dp, rc, m,
                                                    ((h, w),)),
            vars_d, query, v_img, dpt, ref_cam, mask)

        glue = t_dca - t_s1 - t_s2
        print(f"K={k:5d} {h}x{w}: point_sampling {t_ps*1e3:6.1f}  "
              f"stage1 {t_s1*1e3:6.1f}  stage2(mod) {t_s2*1e3:6.1f}  "
              f"DCA {t_dca*1e3:6.1f} (fusion+compaction glue {glue*1e3:6.1f})"
              f"  DCA-nosort {t_dca_ns*1e3:6.1f}", flush=True)
        total += t_dca + t_ps
    print(f"sum over levels (DCA+point_sampling): {total*1e3:.1f} ms")


if __name__ == "__main__":
    main()
