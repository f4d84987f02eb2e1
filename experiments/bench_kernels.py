"""On-chip A/B of the DFA3D Pallas kernel variants at real model shapes.

Decision queue left from mid-round-3 (docs/roadmap.md): (a) does the
spatial-scan-sorted top-k (commit 3db5f0e) make the row gathers coherent
enough to matter, (b) is the packed-quad bf16 forward (dfa3d_pallas3)
faster than the current dispatch (v1 pair-row at cfull>=256, v2 quad at
cfull=128)?

Run on the TPU:  python experiments/bench_kernels.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from sgcdet_tpu.ops.dfa3d import dfa3d_attention_pallas_pq_s1
from experiments.dfa3d_variants import (
    dfa3d_attention_pallas_mixed,
    dfa3d_attention_pallas_pq_s2,
)
from sgcdet_tpu.ops.dfa3d_pallas import dfa3d_attention_pallas
from sgcdet_tpu.ops.dfa3d_pallas2 import dfa3d_attention_pallas_v2


def make_case(n, h, w, k, heads, c, p, d, coherent, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    value_img = jax.random.normal(ks[0], (n, h, w, heads * c), jnp.float32)
    dpt_img = jax.nn.softmax(jax.random.normal(ks[1], (n, h, w, d)), axis=-1)
    if coherent:
        # queries in spatial scan order project to smoothly-varying image
        # locations (the post-sort regime): base location is a scanline
        # sweep over the image, with small per-(head, point) jitter.
        t = jnp.arange(k, dtype=jnp.float32) / max(k - 1, 1)
        u = (t * 13.0) % 1.0
        v = t
        base = jnp.stack([u, v, t], axis=-1)  # (k, 3)
        jit = jax.random.uniform(ks[2], (n, k, heads, p, 3),
                                 minval=-0.03, maxval=0.03)
        locs = base[None, :, None, None, :] + jit
    else:
        locs = jax.random.uniform(ks[2], (n, k, heads, p, 3),
                                  minval=-0.15, maxval=1.15)
    attn = jax.nn.softmax(jax.random.normal(ks[3], (n, k, heads, p)), axis=-1)
    return value_img, dpt_img, locs, attn


def slope_time(fn, args, iters=6):
    """fn must return a SCALAR: the axon tunnel's block_until_ready can
    return early, so completion is forced by a host fetch of the scalar."""
    float(fn(*args))

    def run(m):
        t0 = time.perf_counter()
        o = None
        for _ in range(m):
            o = fn(*args)
        float(o)
        return time.perf_counter() - t0

    lo = min(run(1), run(1))
    hi = min(run(1 + iters), run(1 + iters))
    return (hi - lo) / iters


def bench_variant(name, op, case, heads, bwd=True):
    v, dp, locs, attn = case

    @jax.jit
    def fwd(v, dp, locs, attn):
        return jnp.sum(jnp.abs(op(v, dp, locs, attn, heads)))

    t_f = slope_time(fwd, (v, dp, locs, attn))

    t_b = None
    if bwd:
        def loss(v, dp, locs, attn):
            return jnp.sum(op(v, dp, locs, attn, heads) ** 2)

        @jax.jit
        def g(v, dp, locs, attn):
            gs = jax.grad(loss, argnums=(0, 1, 2, 3))(v, dp, locs, attn)
            return sum(jnp.sum(jnp.abs(x)) for x in gs)

        t_b = slope_time(g, (v, dp, locs, attn), iters=4)
    return t_f, t_b


SHAPES = {
    # name: (n, h, w, k, heads, c, p, d)
    "scannet_L2_s2": (40, 60, 80, 6400, 8, 32, 4, 12),
    "scannet_L2_s1": (40, 60, 80, 6400, 1, 256, 1, 12),
    "large_L2_s2": (40, 60, 80, 51200, 8, 16, 4, 12),
    "large_L2_s1": (40, 60, 80, 51200, 1, 128, 1, 12),
}

S2_VARIANTS = [
    ("v1", dfa3d_attention_pallas),
    ("v2", dfa3d_attention_pallas_v2),
    ("mixed", dfa3d_attention_pallas_mixed),
    ("pq_s2", dfa3d_attention_pallas_pq_s2),
]
S1_VARIANTS = [
    ("v1", dfa3d_attention_pallas),
    ("pq_s1", dfa3d_attention_pallas_pq_s1),
]


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    for shape_name, (n, h, w, k, heads, c, p, d) in SHAPES.items():
        variants = S2_VARIANTS if heads > 1 else S1_VARIANTS
        for coherent in (False, True):
            case = make_case(n, h, w, k, heads, c, p, d, coherent)
            tag = "coh" if coherent else "rnd"
            for vname, op in variants:
                try:
                    t_f, t_b = bench_variant(vname, op, case, heads)
                except Exception as e:  # noqa: BLE001
                    print(f"{shape_name} {tag} {vname:6s} FAILED: "
                          f"{type(e).__name__}: {str(e)[:120]}")
                    continue
                print(f"{shape_name} {tag} {vname:6s} "
                      f"fwd {t_f*1e3:8.1f} ms   bwd {t_b*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
