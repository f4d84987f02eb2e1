"""The TPU-fast 2D MSDA op must match the reference-semantics jnp op
(incl. out-of-bounds handling, multi-level, and gradients)."""
import numpy as np

import jax
import jax.numpy as jnp

from sgcdet_tpu.ops.msda import msda_2d
from sgcdet_tpu.ops.dfa3d_fast import msda_2d_fast


def rand_case(seed, n=3, shapes=((6, 9), (3, 5)), heads=4, c=8, k=10, p=4,
              loc_range=(-0.2, 1.2)):
    rng = np.random.RandomState(seed)
    levels = len(shapes)
    nv = sum(h * w for h, w in shapes)
    value = rng.randn(n, nv, heads, c).astype(np.float32)
    locs = rng.uniform(*loc_range, (n, k, heads, levels, p, 2)).astype(np.float32)
    attn = rng.rand(n, k, heads, levels, p).astype(np.float32)
    attn /= attn.reshape(n, k, heads, -1).sum(-1)[..., None, None]
    return value, locs, attn, shapes, (n, heads, c)


def run_both(value, locs, attn, shapes, dims, chunk=None):
    n, heads, c = dims
    ref = msda_2d(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(attn))
    imgs = []
    start = 0
    for h, w in shapes:
        imgs.append(
            jnp.asarray(
                value[:, start:start + h * w].reshape(n, h, w, heads * c)
            )
        )
        start += h * w
    fast = msda_2d_fast(imgs, jnp.asarray(locs), jnp.asarray(attn),
                        num_heads=heads, query_chunk=chunk)
    return np.asarray(ref), np.asarray(fast)


def test_msda2d_fast_matches_reference_with_oob():
    ref, fast = run_both(*rand_case(0))
    np.testing.assert_allclose(fast, ref, atol=1e-5)


def test_msda2d_fast_single_level_in_bounds():
    ref, fast = run_both(*rand_case(1, shapes=((7, 8),), loc_range=(0.05, 0.95)))
    np.testing.assert_allclose(fast, ref, atol=1e-5)


def test_msda2d_fast_grads_match():
    value, locs, attn, shapes, dims = rand_case(2, shapes=((6, 9),), k=8)
    n, heads, c = dims
    h, w = shapes[0]
    cos_w = np.cos(np.arange(n * 8 * heads * c)).reshape(n, 8, heads * c)
    cos_j = jnp.asarray(cos_w.astype(np.float32))

    def loss_ref(v, l, a):
        return jnp.sum(msda_2d(v, shapes, l, a) * cos_j)

    def loss_fast(v, l, a):
        img = v.reshape(n, h, w, heads * c)
        return jnp.sum(msda_2d_fast([img], l, a, heads) * cos_j)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(locs), jnp.asarray(attn))
    gf = jax.grad(loss_fast, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(locs), jnp.asarray(attn))
    for name, a, b in zip(["d_value", "d_locs", "d_attn"], gr, gf):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4,
                                   err_msg=name)
