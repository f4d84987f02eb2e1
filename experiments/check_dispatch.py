import jax, jax.numpy as jnp
from sgcdet_tpu.ops.dfa3d import dfa3d_attend
from sgcdet_tpu.ops.msda import dfa3d_attention

def case(n,h,w,k,heads,c,p,d,seed=3):
    ks = jax.random.split(jax.random.PRNGKey(seed),4)
    v = jax.random.normal(ks[0],(n,h,w,heads*c),jnp.float32)
    dp = jax.nn.softmax(jax.random.normal(ks[1],(n,h,w,d)),axis=-1)
    locs = jax.random.uniform(ks[2],(n,k,heads,p,3),minval=-0.1,maxval=1.1)
    attn = jax.nn.softmax(jax.random.normal(ks[3],(n,k,heads,p)),axis=-1)
    return v,dp,locs,attn

for (n,h,w,k,heads,c,p,d,label) in [
    (3,12,16,256,8,32,4,6,"s2_c256"),
    (3,12,16,256,8,16,4,6,"s2_c128"),
    (3,12,16,256,1,256,1,6,"s1_c256"),
    (3,12,16,256,1,128,1,6,"s1_c128"),
]:
    v,dp,locs,attn = case(n,h,w,k,heads,c,p,d)
    ref,_ = dfa3d_attention(v.reshape(n,h*w,heads,c), dp.reshape(n,h*w,d),
                            ((h,w),), locs[:,:,:,None], attn[:,:,:,None])
    # f32 path: must stay exact
    out32 = dfa3d_attend(v,dp,locs,attn,heads)
    e32 = float(jnp.abs(out32-ref).max())
    # bf16 path: packed-quad, tolerance at bf16 level
    vb, dpb = v.astype(jnp.bfloat16), dp.astype(jnp.bfloat16)
    outb = dfa3d_attend(vb,dpb,locs,attn,heads)
    refb,_ = dfa3d_attention(vb.reshape(n,h*w,heads,c).astype(jnp.float32),
                             dpb.reshape(n,h*w,d).astype(jnp.float32),
                             ((h,w),), locs[:,:,:,None], attn[:,:,:,None])
    eb = float(jnp.abs(outb.astype(jnp.float32)-refb).max())
    # bf16 grads flow
    def loss(vb,dpb,locs,attn):
        return jnp.sum(dfa3d_attend(vb,dpb,locs,attn,heads).astype(jnp.float32)**2)
    gs = jax.grad(loss, argnums=(0,1,2,3))(vb,dpb,locs,attn)
    gfin = all(bool(jnp.isfinite(g.astype(jnp.float32)).all()) for g in gs)
    print(f"{label}: f32 err {e32:.2e}  bf16 err {eb:.2e}  grads finite {gfin}")
    assert e32 < 2e-4, label
    assert eb < 0.05, label
    assert gfin, label
print("dispatch OK")
