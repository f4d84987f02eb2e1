"""The TPU-fast patch-gather DFA3D op must match the reference-semantics op
bit-for-bit (incl. out-of-bounds handling and gradients)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgcdet_tpu.ops.msda import dfa3d_attention
from sgcdet_tpu.ops.dfa3d_fast import dfa3d_attention_fast


def rand_case(seed, n=3, hh=6, ww=9, heads=4, c=8, k=10, p=4, d=7, loc_range=(-0.2, 1.2)):
    rng = np.random.RandomState(seed)
    hw = hh * ww
    value = rng.randn(n, hw, heads, c).astype(np.float32)
    dpt = rng.rand(n, hw, d).astype(np.float32)
    locs = rng.uniform(*loc_range, (n, k, heads, 1, p, 3)).astype(np.float32)
    attn = rng.rand(n, k, heads, 1, p).astype(np.float32)
    return value, dpt, locs, attn, (n, hh, ww, heads, c, d)


def run_both(value, dpt, locs, attn, dims, chunk=None):
    n, hh, ww, heads, c, d = dims
    ref, _ = dfa3d_attention(
        jnp.asarray(value), jnp.asarray(dpt), ((hh, ww),),
        jnp.asarray(locs), jnp.asarray(attn),
    )
    fast = dfa3d_attention_fast(
        jnp.asarray(value.reshape(n, hh, ww, heads * c)),
        jnp.asarray(dpt.reshape(n, hh, ww, d)),
        jnp.asarray(locs[:, :, :, 0]),
        jnp.asarray(attn[:, :, :, 0]),
        num_heads=heads,
        query_chunk=chunk,
    )
    return np.asarray(ref), np.asarray(fast)


def test_fast_matches_reference_with_oob():
    ref, fast = run_both(*rand_case(0))
    np.testing.assert_allclose(fast, ref, atol=1e-5)


def test_fast_matches_reference_in_bounds():
    ref, fast = run_both(*rand_case(1, loc_range=(0.05, 0.95)))
    np.testing.assert_allclose(fast, ref, atol=1e-5)


def test_fast_single_head_full_width():
    # stage-1 configuration: heads=1, P=1, c = full embed width
    ref, fast = run_both(*rand_case(2, heads=1, c=32, p=1))
    np.testing.assert_allclose(fast, ref, atol=1e-5)


def test_fast_chunked_equals_unchunked():
    value, dpt, locs, attn, dims = rand_case(3, k=12)
    _, fast_unchunked = run_both(value, dpt, locs, attn, dims, chunk=None)
    _, fast_chunked = run_both(value, dpt, locs, attn, dims, chunk=4)
    np.testing.assert_allclose(fast_chunked, fast_unchunked, atol=1e-6)


def test_fast_gradients_match_reference():
    value, dpt, locs, attn, dims = rand_case(4, n=2, k=6)
    n, hh, ww, heads, c, d = dims

    def loss_ref(v, dd, l, a):
        out, _ = dfa3d_attention(v, dd, ((hh, ww),), l, a)
        return jnp.sum(out**2)

    def loss_fast(v, dd, l, a):
        out = dfa3d_attention_fast(
            v.reshape(n, hh, ww, heads * c), dd.reshape(n, hh, ww, d),
            l[:, :, :, 0], a[:, :, :, 0], num_heads=heads,
        )
        return jnp.sum(out**2)

    args = (jnp.asarray(value), jnp.asarray(dpt), jnp.asarray(locs), jnp.asarray(attn))
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    g_fast = jax.grad(loss_fast, argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g_ref, g_fast, ("value", "dpt", "locs", "attn")):
        np.testing.assert_allclose(
            np.asarray(b).reshape(np.asarray(a).shape), np.asarray(a),
            atol=2e-4, err_msg=name,
        )
