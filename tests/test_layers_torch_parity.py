"""Layer primitives vs torch ground truth (conversion correctness depends on
these semantics matching exactly)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgcdet_tpu.models.layers import (
    BatchNorm,
    Conv,
    ConvTranspose,
    Linear,
    LayerNorm,
    MultiheadAttention,
    interpolate_linear,
    interpolate_nearest_size,
    grid_sample_2d,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_conv2d_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 10, 12).astype(np.float32)
    w = rng.randn(5, 3, 3, 3).astype(np.float32)
    b = rng.randn(5).astype(np.float32)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                   stride=2, padding=1).numpy()
    m = Conv(5, 3, 2, 1)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                         "bias": jnp.asarray(b)}}
    out = m.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_conv3d_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 6, 6, 4).astype(np.float32)
    w = rng.randn(8, 4, 3, 3, 3).astype(np.float32)
    ref = F.conv3d(torch.from_numpy(x), torch.from_numpy(w), None,
                   stride=1, padding=1).numpy()
    m = Conv(8, 3, 1, 1, use_bias=False, ndim=3)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0))}}
    out = m.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_conv_transpose2d_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 4, 7, 9).astype(np.float32)
    w = rng.randn(4, 6, 3, 3).astype(np.float32)  # torch (in, out, kh, kw)
    ref = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w), None,
                             stride=2, padding=1, output_padding=1).numpy()
    m = ConvTranspose(6, 3, 2, padding=1, output_padding=1, use_bias=False)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}}
    out = m.apply(params, jnp.asarray(x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_conv_transpose3d_k2s2_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(1, 4, 3, 4, 5).astype(np.float32)
    w = rng.randn(4, 2, 2, 2, 2).astype(np.float32)
    ref = F.conv_transpose3d(torch.from_numpy(x), torch.from_numpy(w), None,
                             stride=2).numpy()
    m = ConvTranspose(2, 2, 2, use_bias=False, ndim=3)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0))}}
    out = m.apply(params, jnp.asarray(x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_batchnorm_train_and_eval_match_torch():
    rng = np.random.RandomState(4)
    x = rng.randn(4, 3, 5, 6).astype(np.float32)
    bn_t = torch.nn.BatchNorm2d(3)
    bn_t.weight.data = torch.from_numpy(rng.randn(3).astype(np.float32))
    bn_t.bias.data = torch.from_numpy(rng.randn(3).astype(np.float32))

    m = BatchNorm()
    variables = {
        "params": {"scale": jnp.asarray(bn_t.weight.data.numpy()),
                   "bias": jnp.asarray(bn_t.bias.data.numpy())},
        "batch_stats": {"mean": jnp.zeros(3), "var": jnp.ones(3)},
    }
    # train mode: outputs + updated running stats
    bn_t.train()
    ref = bn_t(torch.from_numpy(x)).detach().numpy()
    out, mut = m.apply(variables, jnp.asarray(x), train=True,
                       mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]), bn_t.running_mean.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["var"]), bn_t.running_var.numpy(), atol=1e-4
    )
    # eval mode with the updated stats
    bn_t.eval()
    ref_e = bn_t(torch.from_numpy(x)).detach().numpy()
    variables["batch_stats"] = mut["batch_stats"]
    out_e = m.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out_e), ref_e, atol=1e-4)


def test_multihead_attention_matches_torch():
    rng = np.random.RandomState(5)
    e, h, lq, lk, b = 16, 4, 1, 6, 5
    mha_t = torch.nn.MultiheadAttention(e, h, batch_first=False)
    q = rng.randn(lq, b, e).astype(np.float32)
    k = rng.randn(lk, b, e).astype(np.float32)
    pad = rng.rand(b, lk) > 0.6
    pad[:, 0] = False  # keep at least one key
    ref, _ = mha_t(torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(k),
                   key_padding_mask=torch.from_numpy(pad))
    m = MultiheadAttention(embed_dims=e, num_heads=h)
    params = {"params": {
        "in_proj_kernel": jnp.asarray(mha_t.in_proj_weight.detach().numpy().T),
        "in_proj_bias": jnp.asarray(mha_t.in_proj_bias.detach().numpy()),
        "out_proj": {"kernel": jnp.asarray(mha_t.out_proj.weight.detach().numpy().T),
                     "bias": jnp.asarray(mha_t.out_proj.bias.detach().numpy())},
    }}
    out = m.apply(params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(k),
                  jnp.asarray(pad))
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(), atol=1e-5)


def test_interpolate_trilinear_matches_torch():
    rng = np.random.RandomState(6)
    x = rng.randn(1, 2, 4, 5, 3).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=(8, 10, 6), mode="trilinear",
                        align_corners=False).numpy()
    out = interpolate_linear(jnp.asarray(x), (8, 10, 6), align_corners=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_interpolate_nearest_matches_torch():
    rng = np.random.RandomState(7)
    x = rng.randn(1, 3, 8, 10).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=(15, 20), mode="nearest").numpy()
    out = interpolate_nearest_size(jnp.asarray(x), (15, 20))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)
    # and downscale by 2 (the depth-dist pyramid path)
    ref2 = F.interpolate(torch.from_numpy(x), size=(4, 5), mode="nearest").numpy()
    out2 = interpolate_nearest_size(jnp.asarray(x), (4, 5))
    np.testing.assert_allclose(np.asarray(out2), ref2, atol=1e-6)


def test_grid_sample_matches_torch_align_false():
    rng = np.random.RandomState(8)
    img = rng.randn(1, 3, 7, 9).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, (1, 5, 4, 2)).astype(np.float32)
    ref = F.grid_sample(torch.from_numpy(img), torch.from_numpy(grid),
                        mode="bilinear", padding_mode="zeros",
                        align_corners=False).numpy()
    h, w = 7, 9
    gx = (grid[0, ..., 0] + 1) * w / 2 - 0.5
    gy = (grid[0, ..., 1] + 1) * h / 2 - 0.5
    out = grid_sample_2d(jnp.asarray(img[0]), jnp.asarray(gx), jnp.asarray(gy))
    np.testing.assert_allclose(np.asarray(out), ref[0], atol=1e-5)
