"""Windowed-matmul DFA3D kernels vs the jnp oracle (TPU-only).

Covers the experimental MXU one-hot gather variants (ops/dfa3d_pallas4:
full-width "w" and per-head "wh"; ops/dfa3d_pallas5: windowed-SPMM "ws") in
both regimes — spatially-coherent sampling (the windowed fast path) and
random sampling (the exact fallbacks: per-chunk copy loop for w/wh, the
whole-image segment sweep for ws).  These ops are not dispatched by
production code (they tie or lose to the copy-loop kernels on v5e — see
docs/roadmap.md round-3 notes) but are kept correct and benchable.
"""
import jax
import jax.numpy as jnp
import pytest

from sgcdet_tpu.ops.msda import dfa3d_attention

on_tpu = "TPU" in (getattr(jax.devices()[0], "device_kind", "") or "").upper()
pytestmark = pytest.mark.skipif(not on_tpu, reason="Pallas kernel needs TPU")


def _case(n, h, w, k, heads, c, p, d, coherent, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    value_img = jax.random.normal(
        k1, (n, h, w, heads * c), jnp.float32).astype(jnp.bfloat16)
    dpt_img = jax.nn.softmax(
        jax.random.normal(k2, (n, h, w, d)), axis=-1).astype(jnp.bfloat16)
    if coherent:
        t = jnp.arange(k, dtype=jnp.float32) / max(k - 1, 1)
        base = jnp.stack([(t * 7.0) % 1.0, t, t], axis=-1)
        jit = jax.random.uniform(k3, (n, k, heads, p, 3), minval=-0.03,
                                 maxval=0.03)
        locs = base[None, :, None, None, :] + jit
    else:
        locs = jax.random.uniform(k3, (n, k, heads, p, 3), minval=-0.15,
                                  maxval=1.15)
    attn = jax.nn.softmax(jax.random.normal(k4, (n, k, heads, p)), axis=-1)
    return value_img, dpt_img, locs, attn


def _oracle(value_img, dpt_img, locs, attn, heads):
    n, h, w, cfull = value_img.shape
    d = dpt_img.shape[-1]
    c = cfull // heads
    ref, _ = dfa3d_attention(
        value_img.reshape(n, h * w, heads, c).astype(jnp.float32),
        dpt_img.reshape(n, h * w, d).astype(jnp.float32),
        ((h, w),),
        locs[:, :, :, None].astype(jnp.float32),
        attn[:, :, :, None].astype(jnp.float32),
    )
    return ref


OPS = {}


def _get_op(name):
    if not OPS:
        from experiments.dfa3d_pallas4 import (
            dfa3d_attention_pallas_w,
            dfa3d_attention_pallas_wh,
        )
        from experiments.dfa3d_pallas5 import dfa3d_attention_pallas_ws

        OPS.update(w=dfa3d_attention_pallas_w, wh=dfa3d_attention_pallas_wh,
                   ws=dfa3d_attention_pallas_ws)
    return OPS[name]


@pytest.mark.parametrize("name", ["w", "wh", "ws"])
@pytest.mark.parametrize("coherent", [True, False])
def test_forward_matches_oracle(name, coherent):
    n, h, w, k, heads, c, p, d = 2, 10, 12, 512, 4, 32, 2, 6
    value_img, dpt_img, locs, attn = _case(n, h, w, k, heads, c, p, d,
                                           coherent)
    op = _get_op(name)
    out = jax.jit(lambda *a: op(*a, heads))(value_img, dpt_img, locs, attn)
    ref = _oracle(value_img, dpt_img, locs, attn, heads)
    scale = max(float(jnp.abs(ref).max()), 1.0)
    # bf16 inputs: the oracle on bf16-cast values differs from the kernels
    # only by bf16 output rounding
    assert float(jnp.abs(out.astype(jnp.float32) - ref).max()) < 8e-3 * scale


@pytest.mark.parametrize("name", ["wh", "ws"])
@pytest.mark.parametrize("coherent", [True, False])
def test_grads_match_oracle(name, coherent):
    n, h, w, k, heads, c, p, d = 2, 10, 12, 256, 4, 32, 2, 6
    value_img, dpt_img, locs, attn = _case(n, h, w, k, heads, c, p, d,
                                           coherent)
    op = _get_op(name)

    def loss(op_):
        def f(v, dp, lo, at):
            return jnp.sum(op_(v, dp, lo, at, heads).astype(jnp.float32) ** 2)
        return f

    g = jax.jit(jax.grad(loss(op), argnums=(0, 1, 2, 3)))(
        value_img, dpt_img, locs, attn)

    def oracle_op(v, dp, lo, at, heads_):
        return _oracle(v, dp, lo, at, heads_).astype(v.dtype)

    g_ref = jax.jit(jax.grad(loss(oracle_op), argnums=(0, 1, 2, 3)))(
        value_img, dpt_img, locs, attn)
    for a, b in zip(g, g_ref):
        scale = max(float(jnp.abs(b.astype(jnp.float32)).max()), 1.0)
        err = float(jnp.abs(a.astype(jnp.float32)
                            - b.astype(jnp.float32)).max())
        assert err < 2e-2 * scale, (err, scale)
