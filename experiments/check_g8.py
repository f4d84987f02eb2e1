import time, jax, jax.numpy as jnp
from sgcdet_tpu.ops.msda import dfa3d_attention
from sgcdet_tpu.ops.dfa3d_pallas import dfa3d_attention_pallas
from sgcdet_tpu.ops.dfa3d_pallas2 import dfa3d_attention_pallas_v2
from sgcdet_tpu.ops.dfa3d_pallas3 import dfa3d_attention_pallas_pq

# correctness at small shapes (oracle)
n, h, w, k, heads, c, p, d = 2, 10, 12, 40, 4, 16, 2, 6
ks = jax.random.split(jax.random.PRNGKey(7), 4)
value_img = jax.random.normal(ks[0], (n, h, w, heads * c), jnp.float32)
dpt_img = jax.nn.softmax(jax.random.normal(ks[1], (n, h, w, d)), axis=-1)
locs = jax.random.uniform(ks[2], (n, k, heads, p, 3), minval=-0.1, maxval=1.1)
attn = jax.nn.softmax(jax.random.normal(ks[3], (n, k, heads, p)), axis=-1)
ref, _ = dfa3d_attention(
    value_img.reshape(n, h * w, heads, c), dpt_img.reshape(n, h * w, d),
    ((h, w),), locs[:, :, :, None], attn[:, :, :, None])
for name, fn in (("v1", dfa3d_attention_pallas), ("v2", dfa3d_attention_pallas_v2)):
    out = fn(value_img, dpt_img, locs, attn, heads)
    print(name, "max err", float(jnp.abs(out - ref).max()), flush=True)
# bf16 pq stage-1-like single-head case
vb = value_img.astype(jnp.bfloat16); db = dpt_img.astype(jnp.bfloat16)
l1 = locs[:, :, :1, :1]; a1 = jnp.ones((n, k, 1, 1), jnp.float32)
ref1, _ = dfa3d_attention(
    vb.astype(jnp.float32).reshape(n, h * w, 1, heads * c),
    db.astype(jnp.float32).reshape(n, h * w, d),
    ((h, w),), l1[:, :, :, None], a1[:, :, :, None])
o1 = dfa3d_attention_pallas_pq(vb, db, l1, a1, 1)
print("pq s1 max err", float(jnp.abs(o1 - ref1).max()), flush=True)

# grads of v2 at small shape vs oracle autodiff
def loss_o(v, dp):
    o, _ = dfa3d_attention(v.reshape(n, h*w, heads, c), dp.reshape(n, h*w, d),
                           ((h, w),), locs[:, :, :, None], attn[:, :, :, None])
    return jnp.sum(jnp.sin(o))
def loss_k(v, dp):
    return jnp.sum(jnp.sin(dfa3d_attention_pallas_v2(v, dp, locs, attn, heads)))
go = jax.grad(loss_o, (0, 1))(value_img.reshape(n, h*w, heads*c), dpt_img.reshape(n, h*w, d))
gk = jax.grad(loss_k, (0, 1))(value_img, dpt_img)
print("v2 grad err", float(jnp.abs(gk[0].reshape(go[0].shape) - go[0]).max()),
      float(jnp.abs(gk[1].reshape(go[1].shape) - go[1]).max()), flush=True)

# timing at ScanNet L2 stage-2 shape
n, h, w, k, heads, c, p, d = 40, 60, 80, 6400, 8, 32, 4, 12
ks = jax.random.split(jax.random.PRNGKey(3), 4)
value_img = jax.random.normal(ks[0], (n, h, w, heads * c), jnp.float32)
dpt_img = jax.nn.softmax(jax.random.normal(ks[1], (n, h, w, d)), axis=-1)
locs = jax.random.uniform(ks[2], (n, k, heads, p, 3), minval=0.02, maxval=0.98)
attn = jax.nn.softmax(jax.random.normal(ks[3], (n, k, heads, p)), axis=-1)

def timeit(name, f, *a):
    g = jax.jit(lambda *x: jnp.sum(jnp.abs(f(*x))))
    float(g(*a))
    def run(m):
        t0 = time.perf_counter(); o=None
        for _ in range(m): o = g(*a)
        float(o); return time.perf_counter()-t0
    lo = min(run(1), run(1)); hi = min(run(4), run(4))
    print(f"{name}: {(hi-lo)/3*1e3:.1f} ms", flush=True)

timeit("v2 fwd L2", dfa3d_attention_pallas_v2, value_img, dpt_img, locs, attn, 8)

def gloss(v, dp):
    return jnp.sum(jnp.abs(dfa3d_attention_pallas_v2(v, dp, locs, attn, 8)))
gf = jax.jit(jax.grad(gloss, (0, 1)))
def timeit2(name, f, *a):
    float(jnp.sum(jnp.abs(f(*a)[0])))
    def run(m):
        t0 = time.perf_counter(); o=None
        for _ in range(m): o = f(*a)
        float(jnp.sum(jnp.abs(o[0]))); return time.perf_counter()-t0
    lo = min(run(1), run(1)); hi = min(run(4), run(4))
    print(f"{name}: {(hi-lo)/3*1e3:.1f} ms", flush=True)
timeit2("v2 grad L2", gf, value_img, dpt_img)
