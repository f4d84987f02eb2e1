"""Multi-scale deformable sampling ops — pure-jnp reference implementations.

These define the *semantics* (and serve as the autodiff-correct oracle for
the TPU-fast implementations in ``dfa3d_fast.py``) of the two device ops the
reference implements in CUDA:

* 2D multi-scale deformable attention (mmcv ``ms_deform_attn``), used by
  ``Grid_Sample_2D_Feature`` / ``MSDeformableAttention3D``
  (/root/reference/mmdet3d_plugin/models/im2voxel/transformer_utils/
  deformable_cross_attention.py:21-340).
* DFA3D fused depth-weighted attention (``ms_depth_score_sample`` +
  ``wms_deform_attn``, /root/reference/packages/3D-deformable-attention/DFA3D/
  dfa3D/ops/csrc/): for every sampling location (u, v, d) the four bilinear
  corners are each re-weighted by the depth probability trilinearly sampled at
  that corner — i.e. the op is attention-weighted **trilinear sampling of the
  outer-product volume** ``value[h, w] * dpt_dist[h, w, d]``.

Conventions (matching the CUDA kernels exactly):
  pixel = loc * size - 0.5 (for u, v and d); corners out of bounds contribute
  zero; corner order for depth scores is (left-top, right-top, right-bottom,
  left-bottom) — see ms_depth_score_sample_cuda_kernel.cuh:89-92 and
  wms_deform_attn_cuda_kernel.cuh:47-78.

Shapes:
  value:       (bs, num_value, heads, c)    num_value = sum(H_l * W_l)
  dpt_dist:    (bs, num_value, D)           categorical depth distribution
  locations:   (bs, nq, heads, L, P, 2|3)   normalized to [0, 1]
  attn:        (bs, nq, heads, L, P)
  output:      (bs, nq, heads * c)

``spatial_shapes`` is a static tuple of (H, W) pairs so everything stays
shape-static under jit.
"""
from __future__ import annotations

import jax.numpy as jnp


def _level_starts(spatial_shapes):
    starts = [0]
    for h, w in spatial_shapes[:-1]:
        starts.append(starts[-1] + h * w)
    return starts


def _corner_setup(x, y, h, w):
    """Bilinear corner indices/weights with per-corner validity.

    x, y: continuous pixel coords (already loc*size-0.5). Returns per corner
    (iy, ix, weight, valid) in order lt, rt, rb, lb.
    """
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    hx = 1.0 - lx
    hy = 1.0 - ly
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1
    vx0 = (x0i >= 0) & (x0i <= w - 1)
    vx1 = (x1i >= 0) & (x1i <= w - 1)
    vy0 = (y0i >= 0) & (y0i <= h - 1)
    vy1 = (y1i >= 0) & (y1i <= h - 1)
    # (index_y, index_x, bilinear weight, valid)
    return (
        (y0i, x0i, hy * hx, vy0 & vx0),  # left-top
        (y0i, x1i, hy * lx, vy0 & vx1),  # right-top
        (y1i, x1i, ly * lx, vy1 & vx1),  # right-bottom
        (y1i, x0i, ly * hx, vy1 & vx0),  # left-bottom
    )


def _flat_idx(iy, ix, h, w, start):
    iy = jnp.clip(iy, 0, h - 1)
    ix = jnp.clip(ix, 0, w - 1)
    return start + iy * w + ix


def msda_2d(value, spatial_shapes, sampling_locations, attention_weights):
    """2D multi-scale deformable attention (reference semantics of mmcv op).

    Args:
      value: (bs, num_value, heads, c)
      spatial_shapes: static tuple of (H, W)
      sampling_locations: (bs, nq, heads, L, P, 2) normalized (u, v)
      attention_weights: (bs, nq, heads, L, P)
    Returns:
      (bs, nq, heads * c)
    """
    bs, _, heads, c = value.shape
    nq = sampling_locations.shape[1]
    levels = len(spatial_shapes)
    points = sampling_locations.shape[4]
    starts = _level_starts(spatial_shapes)

    # value laid out (bs, heads, num_value, c) for per-head gathers
    value_t = jnp.transpose(value, (0, 2, 1, 3))
    out = jnp.zeros((bs, nq, heads, c), value.dtype)
    for lvl in range(levels):
        h, w = spatial_shapes[lvl]
        loc = sampling_locations[:, :, :, lvl]  # (bs, nq, heads, P, 2)
        attn = attention_weights[:, :, :, lvl]  # (bs, nq, heads, P)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        acc = jnp.zeros((bs, nq, heads, points, c), value.dtype)
        for iy, ix, wgt, valid in _corner_setup(x, y, h, w):
            idx = _flat_idx(iy, ix, h, w, starts[lvl])  # (bs, nq, heads, P)
            idx_t = jnp.transpose(idx, (0, 2, 1, 3)).reshape(bs, heads, nq * points)
            g = jnp.take_along_axis(value_t, idx_t[..., None], axis=2)
            g = g.reshape(bs, heads, nq, points, c).transpose(0, 2, 1, 3, 4)
            wv = jnp.where(valid, wgt, 0.0).astype(value.dtype)
            acc = acc + g * wv[..., None]
        out = out + jnp.sum(acc * attn[..., None].astype(value.dtype), axis=3)
    return out.reshape(bs, nq, heads * c)


def sample_depth_scores(dpt_dist, spatial_shapes, depth_dim, sampling_locations):
    """Per-corner trilinear depth probabilities.

    Args:
      dpt_dist: (bs, num_value, D) depth distributions (not head-duplicated;
        the reference repeats over heads but values are identical).
      spatial_shapes: static tuple of (H, W)
      depth_dim: D (static)
      sampling_locations: (bs, nq, heads, L, P, 3) normalized (u, v, d)
    Returns:
      (bs, nq, heads, L, P, 4) depth scores, corner order lt, rt, rb, lb.
    """
    bs = dpt_dist.shape[0]
    _, nq, heads, levels, points, _ = sampling_locations.shape
    starts = _level_starts(spatial_shapes)
    d_size = depth_dim

    per_level = []
    for lvl in range(levels):
        h, w = spatial_shapes[lvl]
        loc = sampling_locations[:, :, :, lvl]  # (bs, nq, heads, P, 3)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        d = loc[..., 2] * d_size - 0.5
        d0 = jnp.floor(d)
        ld = d - d0
        hd = 1.0 - ld
        d0i = d0.astype(jnp.int32)
        d1i = d0i + 1
        vd0 = (d0i >= 0) & (d0i <= d_size - 1)
        vd1 = (d1i >= 0) & (d1i <= d_size - 1)
        d0c = jnp.clip(d0i, 0, d_size - 1)
        d1c = jnp.clip(d1i, 0, d_size - 1)

        corner_scores = []
        for iy, ix, _wgt, valid in _corner_setup(x, y, h, w):
            idx = _flat_idx(iy, ix, h, w, starts[lvl])  # (bs, nq, heads, P)
            flat = idx.reshape(bs, -1)
            rows = jnp.take_along_axis(dpt_dist, flat[..., None], axis=1)
            rows = rows.reshape(bs, nq, heads, points, d_size)
            v_lo = jnp.take_along_axis(rows, d0c[..., None], axis=-1)[..., 0]
            v_hi = jnp.take_along_axis(rows, d1c[..., None], axis=-1)[..., 0]
            score = jnp.where(vd0, v_lo, 0.0) * hd + jnp.where(vd1, v_hi, 0.0) * ld
            corner_scores.append(jnp.where(valid, score, 0.0))
        per_level.append(jnp.stack(corner_scores, axis=-1))  # (bs,nq,heads,P,4)
    return jnp.stack(per_level, axis=3)  # (bs, nq, heads, L, P, 4)


def dfa3d_attention(value, dpt_dist, spatial_shapes, sampling_locations, attention_weights):
    """Fused DFA3D: depth-weighted multi-scale deformable attention.

    output[q] = sum_{l,p} attn[l,p] * sum_corners w_bilinear * depth_score * v

    Args:
      value: (bs, num_value, heads, c)
      dpt_dist: (bs, num_value, D)
      spatial_shapes: static tuple of (H, W)
      sampling_locations: (bs, nq, heads, L, P, 3) normalized (u, v, d)
      attention_weights: (bs, nq, heads, L, P)
    Returns:
      output (bs, nq, heads * c), depth_score (bs, nq, heads, L, P, 4)
    """
    bs, _, heads, c = value.shape
    nq = sampling_locations.shape[1]
    levels = len(spatial_shapes)
    points = sampling_locations.shape[4]
    starts = _level_starts(spatial_shapes)
    d_size = dpt_dist.shape[-1]

    depth_score = sample_depth_scores(dpt_dist, spatial_shapes, d_size, sampling_locations)

    value_t = jnp.transpose(value, (0, 2, 1, 3))
    out = jnp.zeros((bs, nq, heads, c), value.dtype)
    for lvl in range(levels):
        h, w = spatial_shapes[lvl]
        loc = sampling_locations[:, :, :, lvl]
        attn = attention_weights[:, :, :, lvl]
        ds = depth_score[:, :, :, lvl]  # (bs, nq, heads, P, 4)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        acc = jnp.zeros((bs, nq, heads, points, c), value.dtype)
        for ci, (iy, ix, wgt, valid) in enumerate(_corner_setup(x, y, h, w)):
            idx = _flat_idx(iy, ix, h, w, starts[lvl])
            idx_t = jnp.transpose(idx, (0, 2, 1, 3)).reshape(bs, heads, nq * points)
            g = jnp.take_along_axis(value_t, idx_t[..., None], axis=2)
            g = g.reshape(bs, heads, nq, points, c).transpose(0, 2, 1, 3, 4)
            wv = jnp.where(valid, wgt * ds[..., ci], 0.0).astype(value.dtype)
            acc = acc + g * wv[..., None]
        out = out + jnp.sum(acc * attn[..., None].astype(value.dtype), axis=3)
    return out.reshape(bs, nq, heads * c), depth_score
