"""On-chip A/B for the sweep gather group-skip at the HEADLINE (indoor
walkthrough) rig: fraction of fully-invalid 8-sample groups + fwd/bwd time.

The group-skip gate only pays when a meaningful fraction of 8-sample gather
groups have all four bilinear weights zero (sample projects outside the
neighbor image). The ring/orbit rig sees ~0% such groups (gate = pure
overhead, measured +2.4 ms); the indoor walkthrough — the headline and the
realistic ScanNet regime — projects ~1/3 of sweep samples off-image.

Run twice (with / without the change via git stash) and compare:
    python -m experiments.bench_sweep_skip
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _example_scene
from sgcdet_tpu.models.depth_net import _warp_grid, get_closest_frame_ids
from sgcdet_tpu.ops.sweep_pallas import (
    _sweep_rows_weights, plane_sweep_correlation_pallas)


def timeit(fn, *args, iters=8):
    @jax.jit
    def scalar(*a):
        return jnp.sum(jnp.abs(fn(*a).astype(jnp.float32)))

    float(scalar(*args))

    def run(m):
        o = None
        t0 = time.perf_counter()
        for _ in range(m):
            o = scalar(*args)
        float(o)
        return time.perf_counter() - t0

    lo = min(run(1), run(1))
    hi = min(run(1 + iters), run(1 + iters))
    return (hi - lo) / iters


def main():
    n, c = 40, 128
    scene = _example_scene((239, 320), (240, 320), n, trajectory="indoor")
    proj = np.asarray(scene["proj_feat4"])  # quarter-res projection
    h, w = 60, 80
    dv = jnp.asarray(np.arange(0.25, 5.45, 0.4, np.float32) + 0.2)
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(n, c, h, w).astype(np.float32)).astype(
        jnp.bfloat16)
    ref = jnp.asarray(rng.randn(n, c, h, w).astype(np.float32)).astype(
        jnp.bfloat16)
    nei = np.asarray(get_closest_frame_ids(n, 2))[:, 0]
    pj, pn = jnp.asarray(proj), jnp.asarray(proj[nei])

    x_eff, y_eff = _warp_grid(pn, pj, dv, h, w)
    _, w4 = _sweep_rows_weights(
        x_eff.reshape(n, dv.shape[0], -1), y_eff.reshape(n, dv.shape[0], -1),
        h, w, 8 * ((h * w + 7) // 8))
    valid = np.asarray(jnp.sum(w4, -1) > 0).reshape(-1, 8)
    frac_skip = 1.0 - np.any(valid, -1).mean()
    print(f"indoor rig: {frac_skip:.1%} of 8-sample groups fully invalid")

    t_f = timeit(plane_sweep_correlation_pallas, src[nei], ref, pn, pj, dv)
    print(f"fwd  {t_f * 1e3:7.2f} ms")

    def fwd_loss(s, r):
        o = plane_sweep_correlation_pallas(s, r, pn, pj, dv)
        return jnp.sum(jnp.abs(o.astype(jnp.float32)))

    g = jax.grad(lambda s, r: fwd_loss(s, r), argnums=(0, 1))
    t_b = timeit(lambda s, r: sum(
        jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in g(s, r)).reshape(
            1, 1, 1), src[nei], ref)
    print(f"f+b  {t_b * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
