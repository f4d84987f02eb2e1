import numpy as np

import jax
import jax.numpy as jnp

from sgcdet_tpu.models.layers import grid_sample_2d
from sgcdet_tpu.ops.dfa3d_fast import bilinear_sample_patch


def test_bilinear_patch_matches_take_sampler():
    rng = np.random.RandomState(0)
    h, w, c = 9, 13, 16
    img = rng.randn(h, w, c).astype(np.float32)
    x = rng.uniform(-1.5, w + 1.5, 200).astype(np.float32)
    y = rng.uniform(-1.5, h + 1.5, 200).astype(np.float32)
    ref = grid_sample_2d(jnp.asarray(img.transpose(2, 0, 1)), jnp.asarray(x), jnp.asarray(y))
    out = bilinear_sample_patch(jnp.asarray(img), jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref).T, atol=1e-5)


def test_bilinear_patch_grad_matches():
    rng = np.random.RandomState(1)
    h, w, c = 6, 8, 4
    img = rng.randn(h, w, c).astype(np.float32)
    x = rng.uniform(0, w - 1, 20).astype(np.float32)
    y = rng.uniform(0, h - 1, 20).astype(np.float32)

    g_ref = jax.grad(
        lambda im: jnp.sum(grid_sample_2d(im.transpose(2, 0, 1), jnp.asarray(x), jnp.asarray(y)) ** 2)
    )(jnp.asarray(img))
    g_new = jax.grad(
        lambda im: jnp.sum(bilinear_sample_patch(im, jnp.asarray(x), jnp.asarray(y)) ** 2)
    )(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), atol=2e-4)
