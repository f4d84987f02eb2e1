"""Packed-quad (pq) DFA3D forward vs the jnp oracle (TPU-only).

The pq kernel packs bilinear-corner PAIRS as bf16 into f32 words (one
2*(C+D)-word row copy per sample — half the bytes of the v1 pair layout).
Packing rounds values/depth to bf16, so the oracle gets the same
bf16-rounded inputs; the comparison is then tight (f32 compute both sides).
Reference semantics: wms_deform_attn_cuda_kernel.cuh:24-159.
"""
import pytest

import jax
import jax.numpy as jnp

on_tpu = "TPU" in (getattr(jax.devices()[0], "device_kind", "") or "").upper()
pytestmark = pytest.mark.skipif(not on_tpu, reason="Pallas kernel needs TPU")


def _case(n, h, w, k, heads, c, p, d, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    cfull = heads * c
    value_img = jax.random.normal(k1, (n, h, w, cfull), jnp.float32)
    dpt_img = jax.nn.softmax(jax.random.normal(k2, (n, h, w, d)), axis=-1)
    locs = jax.random.uniform(k3, (n, k, heads, p, 3), minval=-0.15,
                              maxval=1.15)
    attn = jax.nn.softmax(jax.random.normal(k4, (n, k, heads, p)), axis=-1)
    return value_img, dpt_img, locs, attn


def _oracle_bf16_rounded(value_img, dpt_img, locs, attn, heads, c):
    from sgcdet_tpu.ops.msda import dfa3d_attention

    n, h, w, _ = value_img.shape
    d = dpt_img.shape[-1]
    vr = value_img.astype(jnp.bfloat16).astype(jnp.float32)
    dr = dpt_img.astype(jnp.bfloat16).astype(jnp.float32)
    ref, _ = dfa3d_attention(
        vr.reshape(n, h * w, heads, c), dr.reshape(n, h * w, d),
        ((h, w),), locs[:, :, :, None], attn[:, :, :, None])
    return ref


@pytest.mark.parametrize(
    "n,h,w,k,heads,c,p,d",
    [
        (2, 8, 10, 24, 2, 8, 2, 5),     # tiny multi-head
        (3, 15, 20, 40, 1, 64, 1, 12),  # stage-1 style
        (2, 60, 80, 640, 8, 32, 4, 12),  # realistic stage-2
    ],
)
def test_pq_forward_matches_oracle(n, h, w, k, heads, c, p, d):
    from sgcdet_tpu.ops.dfa3d_pallas3 import dfa3d_attention_pallas_pq

    value_img, dpt_img, locs, attn = _case(n, h, w, k, heads, c, p, d)
    ref = _oracle_bf16_rounded(value_img, dpt_img, locs, attn, heads, c)
    out = dfa3d_attention_pallas_pq(value_img, dpt_img, locs, attn, heads)
    scale = max(float(jnp.abs(ref).max()), 1.0)
    assert float(jnp.abs(out - ref).max()) < 1e-4 * scale


@pytest.mark.parametrize(
    "n,h,w,k,heads,c,p,d",
    [
        (2, 8, 10, 24, 2, 8, 2, 5),      # pq fwd + v2 quad backward
        (3, 15, 20, 40, 1, 64, 1, 12),   # pq fwd + v1 pair backward (stage-1)
    ],
)
def test_pq_mixed_vjp_grads_match_oracle(n, h, w, k, heads, c, p, d):
    """The production wiring pairs the pq forward with the v1/v2 backward
    (ops.dfa3d); the VJP composition must reproduce oracle autodiff grads
    (backward runs from exact f32 primals — full precision)."""
    from sgcdet_tpu.ops.dfa3d import dfa3d_attention_pallas_pq_s1
    from experiments.dfa3d_variants import dfa3d_attention_pallas_pq_s2
    from sgcdet_tpu.ops.msda import dfa3d_attention

    wrapper = (dfa3d_attention_pallas_pq_s1 if heads * p == 1
               else dfa3d_attention_pallas_pq_s2)
    value_img, dpt_img, locs, attn = _case(n, h, w, k, heads, c, p, d)
    cos_w = jnp.cos(jnp.arange(n * k * heads * c, dtype=jnp.float32)).reshape(
        n, k, heads * c)

    def loss_ref(vi, di, lo, at):
        o, _ = dfa3d_attention(
            vi.reshape(n, h * w, heads, c), di.reshape(n, h * w, d),
            ((h, w),), lo[:, :, :, None], at[:, :, :, None])
        return jnp.sum(o * cos_w)

    def loss_pq(vi, di, lo, at):
        return jnp.sum(wrapper(vi, di, lo, at, heads) * cos_w)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(value_img, dpt_img, locs, attn)
    gp = jax.grad(loss_pq, argnums=(0, 1, 2, 3))(value_img, dpt_img, locs, attn)
    for name, a, b in zip(["d_value", "d_dpt", "d_locs", "d_attn"], gr, gp):
        scale = max(float(jnp.abs(a).max()), 1.0)
        assert float(jnp.abs(a - b).max()) < 5e-4 * scale, name
