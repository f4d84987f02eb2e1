"""Backward split of the two lifting kernels at the in-model L2 shape.

The train step's backward (296 ms at 40v, profile_train_bwd 2026-08-21) is
dominated by the lifting; this times fwd vs fwd+grad of the COUNTED stage-2
(v2c) and stage-1 (pq_s1c / v1c) ops at the headline-budget L2 shape
(B=4608 padded queries, counts ~U[900,1400] like the indoor rig), giving
the kernel-level bwd shares the train target (#6, round-5) needs.

Run on the TPU: python -m experiments.profile_lifting_bwd
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

from sgcdet_tpu.ops.dfa3d import (
    dfa3d_attention_pallas_pq_s1c,
    dfa3d_attention_pallas_v2c,
)
from sgcdet_tpu.ops.dfa3d_pallas import dfa3d_attention_pallas_c


def slope(fn, *args, iters=6):
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


def bench(name, op, n, h, w, k, heads, c, p, d, dtype):
    rng = np.random.RandomState(0)
    value_img = jnp.asarray(rng.randn(n, h, w, heads * c), jnp.float32)
    dpt_img = jax.nn.softmax(
        jnp.asarray(rng.randn(n, h, w, d), jnp.float32), -1)
    if dtype == jnp.bfloat16:
        value_img = value_img.astype(dtype)
        dpt_img = dpt_img.astype(dtype)
    locs = jnp.asarray(rng.rand(n, k, heads, p, 3) * 1.2 - 0.1, jnp.float32)
    attn = jax.nn.softmax(
        jnp.asarray(rng.randn(n, k, heads, p), jnp.float32), -1)
    counts = jnp.asarray(rng.randint(900, 1401, n), jnp.float32)

    @jax.jit
    def fwd(v, dp, l, a):
        return jnp.sum(jnp.abs(op(v, dp, l, a, counts, heads)
                               .astype(jnp.float32)))

    @jax.jit
    def fb(v, dp, l, a):
        def loss(v, dp, l, a):
            return jnp.sum(op(v, dp, l, a, counts, heads)
                           .astype(jnp.float32) ** 2)

        gs = jax.grad(loss, argnums=(0, 1, 2, 3))(v, dp, l, a)
        return sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in gs)

    t_f = slope(fwd, value_img, dpt_img, locs, attn)
    t_b = slope(fb, value_img, dpt_img, locs, attn, iters=4)
    print(f"{name:22s} fwd {t_f*1e3:7.1f} ms   f+b {t_b*1e3:7.1f} ms   "
          f"(bwd {1e3*(t_b-t_f):7.1f})", flush=True)


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    n, h, w, k, d = 40, 30, 40, 4608, 12
    bench("s2 v2c f32in", dfa3d_attention_pallas_v2c, n, h, w, k, 8, 32, 4,
          d, jnp.float32)
    bench("s2 v2c bf16in", dfa3d_attention_pallas_v2c, n, h, w, k, 8, 32, 4,
          d, jnp.bfloat16)
    bench("s1 pq_s1c bf16", dfa3d_attention_pallas_pq_s1c, n, h, w, k, 1,
          256, 1, d, jnp.bfloat16)
    bench("s1 v1c f32", dfa3d_attention_pallas_c, n, h, w, k, 1, 256, 1,
          d, jnp.float32)


if __name__ == "__main__":
    main()
