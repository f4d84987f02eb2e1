"""Banded-Gram plane-sweep correlation (pure XLA, MXU-first).

The plane-sweep cost volume (reference: depth_est_fusion.py:85-126
``homo_warping`` + :232-237 dot-product correlation) is

    corr[d, p] = < bilinear(src, warp_d(p)), ref[p] > / sqrt(C)

Bilinear interpolation is linear, so the channel contraction commutes with
it EXACTLY:

    corr[d, p] = bilinear_{yx}( <src[y, x, :], ref[p, :]> ) at warp_d(p)

i.e. interpolate the scalar Gram field G[(y, x), p] = <src[y,x], ref[p]>
instead of gathering C-wide feature rows per sample.  The Gram matmul is
MXU work, and because warp rows of one *output scanline* stay inside a
narrow band of *source rows* (the homography is smooth and epipolar
geometry bounds the vertical spread over the depth planes), G only needs a
(band x W) x W tile per output row:

    per output row py:
      band  = src[v0(py) : v0(py)+B]                  (dynamic row slice)
      G     = band @ ref_row^T                        (B*W, C) @ (C, W) MXU
      corr  = sum_b Wv[d,b,q] * sum_x Wu[d,x,q] * G[b,x,q]   (VPU, factorized
              bilinear: w = wv(y)*wu(x), valid masks factor the same way)

Exactness: identical to the gather path (zeros padding, same corner/validity
convention as ops/sweep_pallas._sweep_rows_weights) whenever every in-image
source row needed by an output row lies inside its band — `band_violations`
reports the number of samples that do not (0 on all rig geometries we
generate; bench asserts 0).  Out-of-image corners carry zero weight
regardless of the band, exactly like grid_sample(zeros).

No custom VJP: the whole op is jnp (scan + dynamic_slice + einsum), so JAX
AD differentiates it; sample coordinates are stop_gradient'ed to match the
kernel path's semantics (locations are functions of the projections only).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _corner_weights(x_eff, y_eff, h, w):
    """Per-sample bilinear corner data, identical in convention to
    ops/sweep_pallas._sweep_rows_weights.

    Returns (x0, y0) int32 floor corners and the four factor pairs
    (wu0, wu1) along x and (wv0, wv1) along y, validity-masked so that
    w_corner = wv * wu reproduces the gather path's weights exactly.
    """
    x = jnp.clip(x_eff, -4.0, w + 4.0)
    y = jnp.clip(y_eff, -4.0, h + 4.0)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    lx = x - x0f
    ly = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    vx0 = ((x0 >= 0) & (x0 <= w - 1)).astype(x.dtype)
    vx1 = ((x0 + 1 >= 0) & (x0 + 1 <= w - 1)).astype(x.dtype)
    vy0 = ((y0 >= 0) & (y0 <= h - 1)).astype(y.dtype)
    vy1 = ((y0 + 1 >= 0) & (y0 + 1 <= h - 1)).astype(y.dtype)
    return x0, y0, (1 - lx) * vx0, lx * vx1, (1 - ly) * vy0, ly * vy1


def _band_starts(y0, vy0, vy1, h, band):
    """Band start row per (pair, output-row): the smallest in-image source
    row with nonzero vertical weight, clamped so the band fits the image.

    y0/vy0/vy1: (N, D, H, W).  Returns v0 (N, H) int32 and the needed max
    row (N, H) for violation accounting.
    """
    big = jnp.int32(10 * h)
    lo0 = jnp.where(vy0 > 0, y0, big)
    lo1 = jnp.where(vy1 > 0, y0 + 1, big)
    lo = jnp.minimum(lo0, lo1).min(axis=(1, 3))  # (N, H)
    v0 = jnp.clip(lo, 0, max(h - band, 0))
    return v0, lo


def band_violations(x_eff, y_eff, h, w, band):
    """Number of (pair, d, pixel) samples whose in-image source rows do not
    fit the band — 0 means the banded result is exact."""
    _, y0, _, _, wv0, wv1 = _corner_weights(x_eff.reshape(y_eff.shape), y_eff, h, w)
    n, d, hw = y_eff.shape[0], y_eff.shape[1], y_eff.shape[2]
    y0 = y0.reshape(n, d, h, w)
    wv0 = wv0.reshape(n, d, h, w)
    wv1 = wv1.reshape(n, d, h, w)
    v0, _ = _band_starts(y0, wv0, wv1, h, band)
    top0 = jnp.where(wv0 > 0, y0, -1)
    top1 = jnp.where(wv1 > 0, y0 + 1, -1)
    top = jnp.maximum(top0, top1)
    bad = top > (v0[:, None, :, None] + band - 1)
    return jnp.sum(bad.astype(jnp.int32))


def sweep_correlation_banded(src_img, ref_img, x_eff, y_eff, band,
                             rows_per_step=4):
    """src_img/ref_img: (N, H, W, C); x_eff/y_eff: (N, D, H*W).
    Returns corr (N, D, H*W) f32, pre-scaled by 1/sqrt(C)."""
    n, h, w, c = src_img.shape
    d = x_eff.shape[1]
    band = min(band, h)
    while h % rows_per_step:
        rows_per_step -= 1
    x_eff = jax.lax.stop_gradient(x_eff.reshape(n, d, h, w))
    y_eff = jax.lax.stop_gradient(y_eff.reshape(n, d, h, w))
    x0, y0, wu0, wu1, wv0, wv1 = _corner_weights(x_eff, y_eff, h, w)
    v0, _ = _band_starts(y0, wv0, wv1, h, band)

    # bf16 Gram inputs with f32 accumulation: exact for bf16 features, and
    # the model's compute dtype is bf16 on TPU anyway
    gram_dtype = jnp.bfloat16 if src_img.dtype == jnp.bfloat16 else src_img.dtype
    src = src_img.astype(gram_dtype)
    ref = ref_img.astype(gram_dtype)

    xs = jnp.arange(w, dtype=jnp.int32)
    bs = jnp.arange(band, dtype=jnp.int32)
    r = rows_per_step
    s = h // r

    def by_step(a):  # (N, D, H, W) -> (S, N, D, R, W)
        return jnp.moveaxis(a.reshape(n, d, s, r, w), 2, 0)

    scan_xs = (
        jnp.moveaxis(v0.reshape(n, s, r), 1, 0),          # (S, N, R)
        jnp.moveaxis(ref.reshape(n, s, r, w, c), 1, 0),   # (S, N, R, W, C)
        by_step(x0), by_step(y0),
        by_step(wu0), by_step(wu1), by_step(wv0), by_step(wv1),
    )

    def step(_, inp):
        v0s, ref_rows, x0s, y0s, wu0s, wu1s, wv0s, wv1s = inp
        # one contiguous band row-slice per (pair, output row) — coherent
        bandv = jax.vmap(
            lambda img, starts: jax.vmap(
                lambda st: jax.lax.dynamic_slice_in_dim(img, st, band, axis=0)
            )(starts)
        )(src, v0s)  # (N, R, B, W, C)
        # Gram tile: (N, R, B, W, Wq) f32
        g = jnp.einsum("nrbxc,nrqc->nrbxq", bandv, ref_rows,
                       preferred_element_type=jnp.float32)
        yl = y0s - v0s[:, None, :, None]  # band-local row of the top corner
        # factorized one-hot bilinear: Wu (N,D,R,X,Wq), Wv (N,D,R,B,Wq)
        wu = (wu0s[:, :, :, None, :] * (xs[:, None] == x0s[:, :, :, None, :])
              + wu1s[:, :, :, None, :] * (xs[:, None] == x0s[:, :, :, None, :] + 1))
        wv = (wv0s[:, :, :, None, :] * (bs[:, None] == yl[:, :, :, None, :])
              + wv1s[:, :, :, None, :] * (bs[:, None] == yl[:, :, :, None, :] + 1))
        t = jnp.einsum("ndrxq,nrbxq->ndrbq", wu.astype(jnp.float32), g)
        corr = jnp.einsum("ndrbq,ndrbq->ndrq", wv.astype(jnp.float32), t)
        return 0, corr  # (N, D, R, Wq)

    _, out = jax.lax.scan(step, 0, scan_xs)
    # (S, N, D, R, W) -> (N, D, H, W)
    out = jnp.moveaxis(out, 0, 2).reshape(n, d, h, w)
    return out.reshape(n, d, h * w) / jnp.sqrt(jnp.float32(c))


def plane_sweep_correlation_banded(src_fea, ref_fea, src_proj, ref_proj,
                                   depth_values, band, rows_per_step=4):
    """Drop-in banded replacement for depth_net.plane_sweep_correlation.
    src_fea/ref_fea: (N, C, H, W); returns (N, D, H, W) in src_fea's dtype."""
    from ..models.depth_net import _warp_grid

    n, c, h, w = src_fea.shape
    x_eff, y_eff = _warp_grid(src_proj, ref_proj, depth_values, h, w)
    src_img = jnp.transpose(src_fea, (0, 2, 3, 1))
    ref_img = jnp.transpose(ref_fea, (0, 2, 3, 1))
    corr = sweep_correlation_banded(
        src_img, ref_img, x_eff.astype(jnp.float32),
        y_eff.astype(jnp.float32), band, rows_per_step
    )
    return corr.reshape(n, -1, h, w).astype(src_fea.dtype)


def plane_sweep_band_violations(src_proj, ref_proj, depth_values, h, w, band):
    """Violation count for a concrete rig (0 -> banded == exact)."""
    from ..models.depth_net import _warp_grid

    x_eff, y_eff = _warp_grid(src_proj, ref_proj, depth_values, h, w)
    return band_violations(x_eff.astype(jnp.float32),
                           y_eff.astype(jnp.float32), h, w, band)
