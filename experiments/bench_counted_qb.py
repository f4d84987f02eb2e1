"""On-chip qb (query-block) sweep for the count-gated v2 DFA3D kernel.

The block skip quantizes its savings to whole qb-sized blocks: smaller qb
skips finer, but each grid step pays pipeline overhead (measured ~15 us for
FULL steps — unknown for skipped steps, which is exactly what this measures).
Run: python -m experiments.bench_counted_qb [count_lo] [count_hi]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from sgcdet_tpu.ops.dfa3d_pallas2 import _bwd_cams_v2, _fwd_cams_v2


def timeit(fn, *args, iters=8):
    @jax.jit
    def scalar(*a):
        out = fn(*a)
        return sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                   for x in jax.tree_util.tree_leaves(out))

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
    # ScanNet L2 stage-2 at the headline budget: B = ceil(0.7028*6400/128)*128
    n, h, w, k, heads, c, p, d = 40, 30, 40, 4608, 8, 32, 4, 12
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 900
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 1400
    rng = np.random.RandomState(0)
    value_img = jnp.asarray(rng.randn(n, h, w, heads * c), jnp.float32)
    dpt_img = jax.nn.softmax(
        jnp.asarray(rng.randn(n, h, w, d), jnp.float32), -1)
    locs = jnp.asarray(rng.rand(n, k, heads, p, 3) * 1.2 - 0.1, jnp.float32)
    attn = jax.nn.softmax(
        jnp.asarray(rng.randn(n, k, heads, p), jnp.float32), -1)
    g = jnp.asarray(rng.randn(n, k, heads * c), jnp.float32)
    counts = jnp.asarray(rng.randint(lo, hi + 1, n), jnp.float32)
    print(f"shape n={n} k={k} heads={heads} c={c} p={p}; "
          f"counts ~ U[{lo},{hi}] mean {float(counts.mean()):.0f}")

    for qb in (2304, 1152, 768, 512, 256):
        if qb % 128 or (p * qb) % 1024:
            continue
        pick = lambda kk, pp, _qb=qb: _qb
        t_f = timeit(
            lambda v, dp, l, a, cn: _fwd_cams_v2(
                v, dp, l, a, heads, pick_qb=pick, counts=cn),
            value_img, dpt_img, locs, attn, counts)
        t_b = timeit(
            lambda v, dp, l, a, gg, cn: _bwd_cams_v2(
                v, dp, l, a, gg, heads, pick_qb=pick, counts=cn),
            value_img, dpt_img, locs, attn, g, counts)
        t_f0 = timeit(
            lambda v, dp, l, a: _fwd_cams_v2(
                v, dp, l, a, heads, pick_qb=pick),
            value_img, dpt_img, locs, attn)
        print(f"qb={qb:5d} nblk={-(-k // qb)}: fwd {t_f*1e3:6.1f} ms  "
              f"bwd {t_b*1e3:6.1f} ms  (no-counts fwd {t_f0*1e3:6.1f} ms)")


if __name__ == "__main__":
    main()
