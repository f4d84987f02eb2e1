import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgcdet_tpu.models.depth_net import (
    get_closest_frame_ids,
    homo_warping,
    plane_sweep_correlation,
    downsample_gt_depth,
)


def test_closest_frame_ids_boundaries():
    ids = get_closest_frame_ids(6, 2)
    # interior rows: [i-1, i+1]; boundary rows shifted inward by k/2+1
    np.testing.assert_array_equal(ids[2], [1, 3])
    np.testing.assert_array_equal(ids[0], [1, 3])   # [-1, 1] + 2
    np.testing.assert_array_equal(ids[5], [2, 4])   # [4, 6] - 2


def test_plane_sweep_correlation_matches_explicit_warp():
    rng = np.random.RandomState(0)
    n, c, h, w, d = 3, 16, 12, 16, 5
    fea = jnp.asarray(rng.randn(n, c, h, w).astype(np.float32))
    ref_fea = jnp.asarray(rng.randn(n, c, h, w).astype(np.float32))
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 10.0
    intr[0, 2], intr[1, 2] = w / 2, h / 2
    projs = []
    for i in range(n):
        e = np.eye(4, dtype=np.float32)
        e[:3, 3] = [0.05 * i, -0.02 * i, 0.1]
        projs.append(intr @ e)
    projs = jnp.asarray(np.stack(projs))
    depths = jnp.asarray(np.linspace(0.5, 3.0, d).astype(np.float32))

    warped = homo_warping(fea, projs, jnp.asarray(np.stack([np.asarray(projs[0])] * n)), depths)
    explicit = (warped * ref_fea[:, :, None]).sum(axis=1) / jnp.sqrt(jnp.float32(c))
    fused = plane_sweep_correlation(
        fea, ref_fea, projs, jnp.asarray(np.stack([np.asarray(projs[0])] * n)), depths
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(explicit).reshape(n, d, h, w), atol=1e-5
    )


def test_downsampled_gt_depth_one_hot():
    torch = pytest.importorskip("torch")
    # one valid pixel in each 2x2 block -> min-pooled depth -> one-hot bin
    g = np.zeros((1, 4, 4), np.float32)
    g[0, 0, 0] = 1.0   # bin index: (1.0 - (0.2 - 0.4)) / 0.4 = 3 -> one-hot[2]
    g[0, 2, 2] = 4.9   # close to max
    out = downsample_gt_depth(jnp.asarray(g), 2, (0.2, 5.0, 0.4), 12)
    out = np.asarray(out).reshape(2, 2, 12)
    assert out[0, 0].sum() == 1 and out[0, 0].argmax() == 2
    assert out[1, 1].sum() == 1
    # blocks with no valid depth -> all-zero row
    assert out[0, 1].sum() == 0
