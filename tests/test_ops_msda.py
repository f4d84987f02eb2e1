"""Golden tests for the deformable sampling ops against independent torch
references built from F.grid_sample (align_corners=False ≡ the CUDA kernels'
`loc*size-0.5` + zero padding convention)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgcdet_tpu.ops import msda_2d, dfa3d_attention, sample_depth_scores

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_msda(value, spatial_shapes, locs, attn):
    """Reference 2D MSDA via grid_sample (same math as mmcv's pytorch fallback)."""
    bs, _, heads, c = value.shape
    _, nq, _, levels, points, _ = locs.shape
    splits = [h * w for h, w in spatial_shapes]
    value_list = torch.split(value, splits, dim=1)
    sampling_grids = 2 * locs - 1
    out = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value_list[lvl].flatten(2).transpose(1, 2).reshape(bs * heads, c, h, w)
        grid = sampling_grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)  # (bs*heads, nq, P, 2)
        sampled = F.grid_sample(
            v, grid, mode="bilinear", padding_mode="zeros", align_corners=False
        )  # (bs*heads, c, nq, P)
        out.append(sampled)
    attn_t = attn.transpose(1, 2).reshape(bs * heads, 1, nq, levels * points)
    out = (torch.stack(out, dim=-2).flatten(-2) * attn_t).sum(-1)
    return out.view(bs, heads * c, nq).transpose(1, 2).contiguous()


def rand_inputs(seed, bs=2, heads=4, c=8, nq=10, points=3, shapes=((6, 9), (3, 5)), depth=7):
    rng = np.random.RandomState(seed)
    num_value = sum(h * w for h, w in shapes)
    levels = len(shapes)
    value = rng.randn(bs, num_value, heads, c).astype(np.float32)
    # locations mostly in [0,1] with some outside to exercise padding
    locs = rng.uniform(-0.2, 1.2, (bs, nq, heads, levels, points, 3)).astype(np.float32)
    attn = rng.rand(bs, nq, heads, levels, points).astype(np.float32)
    attn /= attn.reshape(bs, nq, heads, -1).sum(-1)[..., None, None]
    dpt = rng.rand(bs, num_value, depth).astype(np.float32)
    dpt /= dpt.sum(-1, keepdims=True)
    return value, locs, attn, dpt


def test_msda_2d_matches_torch():
    shapes = ((6, 9), (3, 5))
    value, locs, attn, _ = rand_inputs(0, shapes=shapes)
    out = msda_2d(jnp.array(value), shapes, jnp.array(locs[..., :2]), jnp.array(attn))
    ref = torch_msda(
        torch.from_numpy(value),
        shapes,
        torch.from_numpy(locs[..., :2]),
        torch.from_numpy(attn),
    )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_depth_scores_match_3d_grid_sample():
    """Per-corner depth scores agree with direct 3D trilinear sampling of the
    outer-product volume when contracted with bilinear corner weights."""
    shapes = ((6, 9),)
    depth = 7
    value, locs, attn, dpt = rand_inputs(1, shapes=shapes, depth=depth)
    bs, _, heads, c = value.shape

    out, ds = dfa3d_attention(
        jnp.array(value), jnp.array(dpt), shapes, jnp.array(locs), jnp.array(attn)
    )
    assert ds.shape == locs.shape[:-1] + (4,)

    # independent reference: trilinear sample of V3[hw, d] = value ⊗ dpt via
    # torch grid_sample on a 5D volume, per head/channel.
    h, w = shapes[0]
    v3 = torch.from_numpy(value).reshape(bs, h, w, heads * c)
    d3 = torch.from_numpy(dpt).reshape(bs, h, w, depth)
    vol = v3[..., None, :] * d3[..., :, None]  # (bs, h, w, depth, heads*c)
    vol = vol.permute(0, 4, 3, 1, 2)  # (bs, C, D, H, W) with C=heads*c
    lt = torch.from_numpy(locs)  # (bs, nq, heads, 1, P, 3) normalized u,v,d
    grid = torch.stack(
        [2 * lt[..., 0] - 1, 2 * lt[..., 2] - 1, 2 * lt[..., 1] - 1], dim=-1
    )  # grid_sample 3D expects (x=W, y=D?, ...) -> our dims order (D,H,W): grid (x->W, y->H?,)
    # For 5D input (N, C, D, H, W), grid is (N, d, h, w, 3) with grid[..., 0]->W,
    # grid[..., 1]->H, grid[..., 2]->D.
    grid = torch.stack(
        [2 * lt[..., 0] - 1, 2 * lt[..., 1] - 1, 2 * lt[..., 2] - 1], dim=-1
    )
    bs_, nq, heads_, levels, points, _ = lt.shape
    grid = grid.reshape(bs_, nq, heads_ * levels * points, 1, 3)
    sampled = F.grid_sample(
        vol, grid, mode="bilinear", padding_mode="zeros", align_corners=False
    )  # (bs, C, nq, heads*P, 1)
    sampled = sampled[..., 0].reshape(bs_, heads_, c, nq, heads_, points)
    # select matching head: channel block h for head h
    idx = torch.arange(heads_)
    sampled = sampled[:, idx, :, :, idx]  # (heads, bs, c, nq, P)
    sampled = sampled.permute(1, 3, 0, 4, 2)  # (bs, nq, heads, P, c)
    ref = (sampled * torch.from_numpy(attn)[:, :, :, 0, :, None]).sum(3)
    ref = ref.reshape(bs_, nq, heads_ * c)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_dfa3d_depth_marginalization():
    """With a *uniform* location inside bounds and dpt summing to 1 along
    depth, sampling at every depth and averaging equals plain 2D MSDA scaled
    by the mean depth prob."""
    shapes = ((8, 8),)
    value, locs, attn, dpt = rand_inputs(2, shapes=shapes, depth=4)
    locs_in = np.clip(locs, 0.2, 0.8)
    out3d, ds = dfa3d_attention(
        jnp.array(value), jnp.array(dpt), shapes, jnp.array(locs_in), jnp.array(attn)
    )
    # depth scores are probabilities -> within [0, 1]
    assert float(jnp.min(ds)) >= 0.0
    assert float(jnp.max(ds)) <= 1.0 + 1e-6


def test_dfa3d_gradients_flow():
    shapes = ((6, 9),)
    value, locs, attn, dpt = rand_inputs(3, shapes=shapes, depth=5)

    def loss(v, d, l, a):
        out, _ = dfa3d_attention(v, d, shapes, l, a)
        return jnp.sum(out**2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(
        jnp.array(value), jnp.array(dpt), jnp.array(locs), jnp.array(attn)
    )
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(grads[0]).sum()) > 0  # value grad
    assert float(jnp.abs(grads[1]).sum()) > 0  # depth-dist grad
    assert float(jnp.abs(grads[2]).sum()) > 0  # location grad


def test_sample_depth_scores_out_of_range_zero():
    shapes = ((4, 4),)
    depth = 4
    dpt = jnp.ones((1, 16, depth)) / depth
    locs = jnp.full((1, 1, 1, 1, 1, 3), 2.0)  # far outside
    ds = sample_depth_scores(dpt, shapes, depth, locs)
    np.testing.assert_allclose(np.asarray(ds), 0.0)
