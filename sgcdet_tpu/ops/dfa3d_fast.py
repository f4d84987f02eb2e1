"""TPU-fast DFA3D: patch-gather formulation.

Measured on v5e, XLA's gather cost is ~constant per gathered row (~25M rows/s)
regardless of row width, and sub-128-lane rows pad 4x. The reference-semantics
op in ``msda.py`` gathers 4 corner rows of 32 lanes per (cam, head, query,
point) — the worst possible shape. This formulation instead issues ONE
``lax.gather`` of a (2, 2, C+D) patch per sampling point from an image-layout
operand that carries the value channels and the depth distribution together:

  * 4x fewer gather descriptors (corners ride along in the patch),
  * full-width (>=128-lane) transfers,
  * the depth-score trilinear lerp runs on the already-resident patch.

The (camera, query-chunk) grid is walked with a sequential ``lax.map`` so the
gather output buffer stays ~100 MB instead of materializing all cameras at
once, and the corner reduction happens before the per-head channel slice to
keep the largest intermediate 4x smaller.

Semantics are bit-identical to ``msda.dfa3d_attention`` (loc*size-0.5
denormalization, per-corner zero padding out of bounds, corner order) — tested
in tests/test_dfa3d_fast.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _patch_gather_raw(img, y0, x0):
    """Gather (2, 2, C) patches from img (H, W, C) at clipped integer starts."""
    c = img.shape[-1]
    starts = jnp.stack([y0, x0], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    return jax.lax.gather(img, starts, dn, slice_sizes=(2, 2, c), mode="clip")


@jax.custom_vjp
def _patch_gather(img, y0, x0):
    """Patch gather with a hand-written backward.

    The autodiff VJP of a windowed lax.gather is a windowed lax.scatter-add,
    which lowers to XLA's slow serial scatter path on TPU (~50x slower than
    needed). The backward here flattens the four patch positions into plain
    row updates — `.at[rows].add(updates)` hits the fast scatter path
    (measured 52M rows/s on v5e vs the windowed form's ~0.2M/s).
    Callers must pass CLIPPED starts (y0 in [0, H-2], x0 in [0, W-2]).
    """
    return _patch_gather_raw(img, y0, x0)


def _patch_gather_fwd(img, y0, x0):
    return _patch_gather_raw(img, y0, x0), (y0, x0, img.shape)


def _patch_gather_bwd(res, g):
    y0, x0, shape = res
    h, w, c = shape
    m = y0.shape[0]
    # flat pixel row per patch position (dy, dx); starts are pre-clipped so
    # every position is in bounds
    base = y0 * w + x0  # (M,)
    offs = jnp.asarray([0, 1, w, w + 1], jnp.int32)  # (dy,dx)=(0,0),(0,1),(1,0),(1,1)
    rows = (base[:, None] + offs[None, :]).reshape(-1)  # (M*4,)
    upd = g.reshape(m, 2 * 2, c).reshape(m * 4, c)
    dimg = jnp.zeros((h * w, c), g.dtype).at[rows].add(upd)
    return dimg.reshape(h, w, c), None, None


_patch_gather.defvjp(_patch_gather_fwd, _patch_gather_bwd)


def _one_cam_chunk(vd_img, locs, attn, heads, c, d_size):
    """Fused sample for one camera / one query chunk.

    vd_img: (H, W, cfull + D) value+depth operand.
    locs: (Kc, heads, P, 3) normalized; attn: (Kc, heads, P).
    Returns (Kc, heads * c).

    The gathered patch tensor is consumed in its NATIVE (2x2 patch-position)
    order — corner weights are re-positioned onto patch slots instead of
    reordering the big gathered tensor, which would force a layout copy.
    """
    hh, ww, _ = vd_img.shape
    kc, _, p, _ = locs.shape
    cfull = heads * c
    dtype = vd_img.dtype

    u = locs[..., 0] * ww - 0.5
    v = locs[..., 1] * hh - 0.5
    d = locs[..., 2] * d_size - 0.5
    x0f = jnp.floor(u)
    y0f = jnp.floor(v)
    d0f = jnp.floor(d)
    lx = (u - x0f).astype(dtype)
    ly = (v - y0f).astype(dtype)
    ld = (d - d0f).astype(dtype)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    d0 = d0f.astype(jnp.int32)

    # per-corner validity (zero-pad semantics of the CUDA kernels)
    vx = jnp.stack([(x0 >= 0) & (x0 <= ww - 1), (x0 + 1 >= 0) & (x0 + 1 <= ww - 1)], -1)
    vy = jnp.stack([(y0 >= 0) & (y0 <= hh - 1), (y0 + 1 >= 0) & (y0 + 1 <= hh - 1)], -1)
    wy = jnp.stack([1 - ly, ly], -1)
    wx = jnp.stack([1 - lx, lx], -1)
    w_corner = (
        wy[..., :, None] * wx[..., None, :]
        * (vy[..., :, None] & vx[..., None, :]).astype(dtype)
    ).reshape(kc, heads, p, 4)

    # depth lerp factors with validity
    vd0 = (d0 >= 0) & (d0 <= d_size - 1)
    vd1 = (d0 + 1 >= 0) & (d0 + 1 <= d_size - 1)
    d0c = jnp.clip(d0, 0, d_size - 1)
    d1c = jnp.clip(d0 + 1, 0, d_size - 1)
    wd0 = jnp.where(vd0, 1 - ld, 0.0).astype(dtype)
    wd1 = jnp.where(vd1, ld, 0.0).astype(dtype)

    # gather starts are clipped; corner (dy, dx) sits at patch position
    # (dy + y0 - sy, dx + x0 - sx) — valid corners always land in {0, 1}.
    sy = jnp.clip(y0, 0, hh - 2)
    sx = jnp.clip(x0, 0, ww - 2)
    g = _patch_gather(vd_img, sy.reshape(-1), sx.reshape(-1))
    g = g.reshape(kc, heads, p, 4, cfull + d_size)
    gv = g[..., :cfull]
    gd = g[..., cfull:]

    dyg = jnp.arange(2).reshape(2, 1)
    dxg = jnp.arange(2).reshape(1, 2)
    py = jnp.clip(dyg[None, None, None] + (y0 - sy)[..., None, None], 0, 1)
    px = jnp.clip(dxg[None, None, None] + (x0 - sx)[..., None, None], 0, 1)
    flat_corner = (py * 2 + px).reshape(kc, heads, p, 4)

    # move corner weights onto patch positions: w_pos[pos] = sum_c w_c [c->pos]
    pos_onehot = (
        flat_corner[..., None] == jnp.arange(4)[None, None, None, None, :]
    ).astype(dtype)  # (Kc, heads, P, 4corners, 4pos)
    w_pos = jnp.einsum("khpc,khpcq->khpq", w_corner * attn[..., None], pos_onehot)

    # depth score per PATCH POSITION via a one-hot lerp vector: lane-indexed
    # take_along_axis lowers terribly on TPU; a 12-wide dot is pure VPU.
    dvec = (
        wd0[..., None] * jax.nn.one_hot(d0c, d_size, dtype=dtype)
        + wd1[..., None] * jax.nn.one_hot(d1c, d_size, dtype=dtype)
    )  # (Kc, heads, P, D)
    ds_pos = jnp.einsum("khpqd,khpd->khpq", gd, dvec)  # (Kc, heads, P, 4pos)

    # contract in native order; per-head slice after the 4x reduction
    wsum = jnp.einsum("khpq,khpqc->khc", w_pos * ds_pos, gv)
    wsum = wsum.reshape(kc, heads, heads, c)
    out = jnp.einsum("khhc->khc", wsum)
    return out.reshape(kc, heads * c)


def bilinear_sample_patch(img, x, y):
    """Bilinear sample img (H, W, C) at pixel coords x, y (M,) — zero padding.

    Same semantics as layers.grid_sample_2d but via one (2,2,C) patch gather
    per sample (half the descriptors) and the fast row-scatter custom VJP
    (the take-based sampler's autodiff backward hits XLA's slow scatter).
    Returns (M, C).
    """
    h, w, c = img.shape
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    lx = x - x0f
    ly = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    vx = jnp.stack([(x0 >= 0) & (x0 <= w - 1), (x0 + 1 >= 0) & (x0 + 1 <= w - 1)], -1)
    vy = jnp.stack([(y0 >= 0) & (y0 <= h - 1), (y0 + 1 >= 0) & (y0 + 1 <= h - 1)], -1)
    wy = jnp.stack([1 - ly, ly], -1)
    wx = jnp.stack([1 - lx, lx], -1)
    w_corner = (
        wy[:, :, None] * wx[:, None, :]
        * (vy[:, :, None] & vx[:, None, :]).astype(img.dtype)
    ).reshape(-1, 4)

    sy = jnp.clip(y0, 0, h - 2)
    sx = jnp.clip(x0, 0, w - 2)
    g = _patch_gather(img, sy, sx).reshape(-1, 4, c)
    dyg = jnp.arange(2).reshape(2, 1)
    dxg = jnp.arange(2).reshape(1, 2)
    py = jnp.clip(dyg[None] + (y0 - sy)[:, None, None], 0, 1)
    px = jnp.clip(dxg[None] + (x0 - sx)[:, None, None], 0, 1)
    flat_corner = (py * 2 + px).reshape(-1, 4)
    pos_onehot = (flat_corner[:, :, None] == jnp.arange(4)[None, None, :]).astype(img.dtype)
    w_pos = jnp.einsum("mc,mcq->mq", w_corner, pos_onehot)
    return jnp.einsum("mq,mqc->mc", w_pos, g)


def msda_2d_fast(value_img_list, sampling_locations, attention_weights,
                 num_heads, query_chunk=None, attend=None):
    """TPU-fast 2D multi-scale deformable attention (mmcv ``ms_deform_attn``
    semantics, reference usage deformable_cross_attention.py:119-340).

    2D MSDA is DFA3D with a uniform depth distribution sampled at the bin
    center: the depth lerp weights then sum to exactly 1 for every in-bounds
    sample, so the depth reweighting is the identity and only the bilinear
    corner weights and attention remain — letting this ride the same
    patch-gather machinery (and its fast custom-VJP scatter backward), or the
    Pallas TPU kernel when ``attend`` is the hardware dispatcher
    (``dfa3d.msda_2d_attend``).

    Args:
      value_img_list: list of (N, H_l, W_l, heads*c) per-level feature maps.
      sampling_locations: (N, K, heads, L, P, 2) normalized (u, v).
      attention_weights: (N, K, heads, L, P); softmax over L*P.
      num_heads: static head count.
      attend: optional DFA3D backend with the ``dfa3d_attention_fast``
        signature; defaults to the XLA patch-gather path.
    Returns (N, K, heads*c).
    """
    if attend is None:
        attend = dfa3d_attention_fast
    out = None
    for lvl, vimg in enumerate(value_img_list):
        locs = sampling_locations[:, :, :, lvl]
        attn = attention_weights[:, :, :, lvl]
        # d = 0.5 centers the sample in a 2-bin uniform distribution:
        # wd0 + wd1 = 1 and both bins hold 1.0, so the depth score is 1.
        locs3 = jnp.concatenate(
            [locs, jnp.full(locs.shape[:-1] + (1,), 0.5, locs.dtype)], axis=-1
        )
        ones = jnp.ones(vimg.shape[:-1] + (2,), vimg.dtype)
        o = attend(vimg, ones, locs3, attn, num_heads, query_chunk)
        out = o if out is None else out + o
    return out


def dfa3d_attention_fast(value_img, dpt_img, sampling_locations, attention_weights,
                         num_heads, query_chunk=None):
    """Fused depth-weighted deformable attention, image-layout operands.

    Args:
      value_img: (N, H, W, heads*c) camera features.
      dpt_img:   (N, H, W, D) depth distributions.
      sampling_locations: (N, K, heads, P, 3) normalized (u, v, d) — single
        level (the SGCDet configs always use num_levels=1).
      attention_weights: (N, K, heads, P).
      num_heads: static head count.
      query_chunk: chunk size along K for the sequential (cam, chunk) walk.

    Returns (N, K, heads*c).
    """
    n, hh, ww, cfull = value_img.shape
    d_size = dpt_img.shape[-1]
    heads = num_heads
    c = cfull // heads
    k = sampling_locations.shape[1]
    p = sampling_locations.shape[3]

    vd = jnp.concatenate([value_img, dpt_img.astype(value_img.dtype)], axis=-1)

    # remat: without it AD saves the gathered patch tensor of EVERY chunk as a
    # residual (tens of GB across a lax.map); recomputing the gathers in the
    # backward is far cheaper than spilling them
    @jax.checkpoint
    def run_chunk(locs, attn):
        # vmap over cameras; gathers for all cameras of one chunk in flight
        return jax.vmap(
            lambda img, lc, ac: _one_cam_chunk(img, lc, ac, heads, c, d_size)
        )(vd, locs, attn)

    chunk = query_chunk if (query_chunk and k % query_chunk == 0 and k > query_chunk) else k
    if chunk == k:
        return run_chunk(sampling_locations, attention_weights)
    nch = k // chunk
    locs_c = jnp.moveaxis(
        sampling_locations.reshape(n, nch, chunk, heads, p, 3), 1, 0
    )
    attn_c = jnp.moveaxis(attention_weights.reshape(n, nch, chunk, heads, p), 1, 0)
    out = jax.lax.map(lambda args: run_chunk(*args), (locs_c, attn_c))
    return jnp.moveaxis(out, 0, 1).reshape(n, k, cfull)
