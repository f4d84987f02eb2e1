"""On-chip A/B: banded-Gram sweep (ops/sweep_band.py) vs the Pallas
gather kernel (ops/sweep_pallas.py) at the production 40-view shape.

Run: python -m experiments.bench_sweep_band [band] [rows_per_step]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from sgcdet_tpu.ops.sweep_band import (
    plane_sweep_band_violations, plane_sweep_correlation_banded)
from sgcdet_tpu.ops.sweep_pallas import plane_sweep_correlation_pallas


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


def rig(n=40, h=60, w=80, c=128, d=12, seed=0):
    """Ring rig matching __graft_entry__._example_scene's geometry scale."""
    rng = np.random.RandomState(seed)
    src = jnp.asarray(rng.randn(n, c, h, w).astype(np.float32)).astype(
        jnp.bfloat16)
    ref = jnp.asarray(rng.randn(n, c, h, w).astype(np.float32)).astype(
        jnp.bfloat16)
    projs = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        ca, sa = np.cos(ang), np.sin(ang)
        e = np.eye(4, dtype=np.float32)
        e[:3, :3] = np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], np.float32)
        e[:3, 3] = [0.1 * np.sin(3 * ang), 0.05 * np.cos(2 * ang), 2.5]
        k = np.eye(4, dtype=np.float32)
        k[0, 0] = k[1, 1] = 0.25 * 288.0
        k[0, 2], k[1, 2] = w / 2, h / 2
        projs.append(k @ e)
    proj = jnp.asarray(np.stack(projs))
    nei = np.roll(np.arange(n), 1)
    dv = jnp.asarray((np.arange(0.2, 5.0, 0.4) + 0.2).astype(np.float32))
    return src, ref, proj, nei, dv


def main():
    band = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    rps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    src, ref, proj, nei, dv = rig()
    h, w = src.shape[2:]

    viol = int(plane_sweep_band_violations(proj[nei], proj, dv, h, w, band))
    print(f"band={band} rows_per_step={rps} violations={viol}")

    a = plane_sweep_correlation_pallas(src[nei], ref, proj[nei], proj, dv)
    b = plane_sweep_correlation_banded(src[nei], ref, proj[nei], proj, dv,
                                       band, rps)
    err = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
    print(f"max |pallas - banded| = {err:.2e}")

    t_pal = timeit(plane_sweep_correlation_pallas, src[nei], ref, proj[nei],
                   proj, dv)
    t_band = timeit(
        lambda s, r, sp, rp, d: plane_sweep_correlation_banded(
            s, r, sp, rp, d, band, rps), src[nei], ref, proj[nei], proj, dv)
    print(f"fwd: pallas {t_pal*1e3:7.1f} ms   banded {t_band*1e3:7.1f} ms "
          f"({t_pal/t_band:.2f}x)")

    def loss_p(s, r):
        return jnp.sum(plane_sweep_correlation_pallas(
            s, r, proj[nei], proj, dv).astype(jnp.float32) ** 2)

    def loss_b(s, r):
        return jnp.sum(plane_sweep_correlation_banded(
            s, r, proj[nei], proj, dv, band, rps).astype(jnp.float32) ** 2)

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1)))
    gb = jax.jit(jax.grad(loss_b, argnums=(0, 1)))
    t_gp = timeit(lambda s, r: gp(s, r)[0], src[nei], ref)
    t_gb = timeit(lambda s, r: gb(s, r)[0], src[nei], ref)
    print(f"grad: pallas {t_gp*1e3:6.1f} ms   banded {t_gb*1e3:7.1f} ms "
          f"({t_gp/t_gb:.2f}x)")


if __name__ == "__main__":
    main()
