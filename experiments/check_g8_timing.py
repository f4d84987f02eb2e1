import time, jax, jax.numpy as jnp
from sgcdet_tpu.ops.dfa3d_pallas2 import dfa3d_attention_pallas_v2

n, h, w, k, heads, c, p, d = 40, 60, 80, 6400, 8, 32, 4, 12
ks = jax.random.split(jax.random.PRNGKey(3), 4)
value_img = jax.random.normal(ks[0], (n, h, w, heads * c), jnp.float32)
dpt_img = jax.nn.softmax(jax.random.normal(ks[1], (n, h, w, d)), axis=-1)
locs = jax.random.uniform(ks[2], (n, k, heads, p, 3), minval=0.02, maxval=0.98)
attn = jax.nn.softmax(jax.random.normal(ks[3], (n, k, heads, p)), axis=-1)

g = jax.jit(lambda v, dp: jnp.sum(jnp.abs(
    dfa3d_attention_pallas_v2(v, dp, locs, attn, 8))))
float(g(value_img, dpt_img))
def run(m):
    t0 = time.perf_counter(); o = None
    for _ in range(m): o = g(value_img, dpt_img)
    float(o); return time.perf_counter() - t0
lo = min(run(1), run(1)); hi = min(run(4), run(4))
print(f"v2 fwd L2: {(hi-lo)/3*1e3:.1f} ms", flush=True)
