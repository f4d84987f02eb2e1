"""Fused DFA3D sampling as a Pallas (Mosaic) TPU kernel.

This is the TPU-native replacement for the reference's two CUDA kernels
(`ms_depth_score_sample` + `wms_deform_attn`,
/root/reference/packages/3D-deformable-attention/DFA3D/dfa3D/ops/csrc/common/
cuda/wms_deform_attn_cuda_kernel.cuh:24-159 and
ms_depth_score_sample_cuda_kernel.cuh:24-148): for every sampling location
(u, v, d), the four bilinear corners of the camera feature map are each
re-weighted by the depth probability linearly interpolated (along d) at that
corner, then attention-weighted and summed over points.

Semantics are bit-compatible with the jnp oracle ``msda.dfa3d_attention``
(loc*size-0.5 denormalization, per-corner zero padding, depth lerp with
per-side validity) — tested in tests/test_dfa3d_pallas.py against both the
oracle and the XLA patch-gather path.

Why this shape of kernel (all rates measured on v5e):

* XLA's ``lax.gather`` moves ~14-25M descriptors/s regardless of row width
  and round-trips every gathered patch through HBM.  Inside Pallas, a
  ``fori_loop`` of single-row dynamic-slice copies out of a VMEM-resident
  operand sustains ~150M rows/s.  Multi-row dynamic-offset READS at
  arbitrary (data-dependent) row indices and strided sublane reads do NOT
  lower on this toolchain — each gathered source row is a single-row slice
  — but multi-row STORES at sublane-ALIGNED dynamic offsets
  (``pl.multiple_of(i, 8)``) do lower, so the gather loop accumulates 8
  rows in registers and writes one (8, width) store
  (experiments/probe_gather_batch.py).  bf16 refs also lower (the
  packed-quad kernel in dfa3d_pallas3.py relies on that).
* The camera feature map is stored as **x-pair rows**: row (y, x') holds the
  channels+depth of pixels (y, x'-1) and (y, x') side by side (536 lanes for
  C=256, D=12), with an extra border column so any in-image bilinear footprint
  maps to two rows (y0 and y0+1) at one x index.  One sample therefore needs
  exactly TWO row gathers for its four corners.
* The (query, head, point) sample axis is flattened head-major so the
  epilogue can slice contiguous per-head row blocks; the point/query
  reduction runs on the MXU against an iota-built selection matrix, and the
  depth lerp is a 12-lane VPU reduction on the already-resident rows.
* The backward re-gathers the same rows (remat — saving the forward's
  gathered tensor would spill tens of MB/block), computes all per-corner
  grads vectorized, and scatters into a pair-layout gradient image with the
  same single-row ``+=`` loop (~147M rows/s), which is un-paired outside the
  kernel.  Gradients w.r.t. sampling locations and attention weights chain
  through plain XLA elementwise math outside the kernel.

The kernel grid is (num_cams, num_query_blocks); the per-camera operand is
revisited across query blocks so it is DMA'd HBM->VMEM once per camera.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# host-side prep (plain XLA, fused into the surrounding jit)
# ---------------------------------------------------------------------------


def _build_pair_image(value_img, dpt_img):
    """(N, H, W, C) + (N, H, W, D) -> (N, HWp, 2*(C+D)) f32 x-pair rows.

    Row (y, x') = [pixel(y, x'-1) | pixel(y, x')] for x' in 0..W (border
    columns duplicate edge pixels; they are only ever read with zero weight).
    Rows are padded up to a multiple of 8 for the block spec.
    """
    n, h, w, _ = value_img.shape
    v = value_img.astype(jnp.float32)
    dp = dpt_img.astype(jnp.float32)
    v_left = jnp.concatenate([v[:, :, :1], v], axis=2)  # pixel x'-1
    v_right = jnp.concatenate([v, v[:, :, -1:]], axis=2)  # pixel x'
    d_left = jnp.concatenate([dp[:, :, :1], dp], axis=2)
    d_right = jnp.concatenate([dp, dp[:, :, -1:]], axis=2)
    # [vA | vB | dA | dB]: value slices land on tile-aligned lane offsets
    pair = jnp.concatenate([v_left, v_right, d_left, d_right], axis=-1)
    hwp = h * (w + 1)
    pair = pair.reshape(n, hwp, pair.shape[-1])
    hwp_pad = _round_up(hwp, 8)
    if hwp_pad != hwp:
        pair = jnp.pad(pair, ((0, 0), (0, hwp_pad - hwp), (0, 0)))
    return pair


def _sample_quantities(locs, attn, h, w, d_size, qb):
    """Per-sample rows and packed weight info, block-ordered.

    locs: (N, K, heads, P, 3) normalized; attn: (N, K, heads, P).
    Returns rows (N, nblk, 2M) int32 (y0 rows then y1 rows); winfo
    (N, nblk, M, 8) f32 = [w4 | wd0 | wd1 | d0c | d1c]; lerp residuals for
    the bwd chain; kpad. Sample order within a block is (head, query, point).
    """
    n, k, heads, p, _ = locs.shape
    kpad = _round_up(k, qb)
    locs = jnp.moveaxis(locs, 2, 1)  # (N, heads, K, P, 3)
    attn = jnp.moveaxis(attn, 2, 1)  # (N, heads, K, P)
    if kpad != k:
        locs = jnp.pad(locs, ((0, 0), (0, 0), (0, kpad - k), (0, 0), (0, 0)))
        attn = jnp.pad(attn, ((0, 0), (0, 0), (0, kpad - k), (0, 0)))
    locs = locs.astype(jnp.float32)
    attn = attn.astype(jnp.float32)

    # clip far-out-of-frame coords (invisible voxels) so the int cast below
    # is safe; anything this far out has zero weight on every corner anyway
    u = jnp.clip(locs[..., 0] * w - 0.5, -4.0, w + 4.0)
    v = jnp.clip(locs[..., 1] * h - 0.5, -4.0, h + 4.0)
    d = jnp.clip(locs[..., 2] * d_size - 0.5, -4.0, d_size + 4.0)
    x0f = jnp.floor(u)
    y0f = jnp.floor(v)
    d0f = jnp.floor(d)
    lx = u - x0f
    ly = v - y0f
    ld = d - d0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    d0 = d0f.astype(jnp.int32)

    vx0 = (x0 >= 0) & (x0 <= w - 1)
    vx1 = (x0 + 1 >= 0) & (x0 + 1 <= w - 1)
    vy0 = (y0 >= 0) & (y0 <= h - 1)
    vy1 = (y0 + 1 >= 0) & (y0 + 1 <= h - 1)
    # corner order: A=(y0,x0) B=(y0,x1) C=(y1,x0) D=(y1,x1)
    wb = jnp.stack(
        [
            (1 - ly) * (1 - lx) * (vy0 & vx0),
            (1 - ly) * lx * (vy0 & vx1),
            ly * (1 - lx) * (vy1 & vx0),
            ly * lx * (vy1 & vx1),
        ],
        axis=-1,
    )  # (N, heads, Kpad, P, 4)
    w4 = wb * attn[..., None]

    # row indices in the pair layout (border column at x'=0)
    xc = jnp.clip(x0, -1, w - 1) + 1  # x' in [0, W]
    r0 = jnp.clip(y0, 0, h - 1) * (w + 1) + xc
    r1 = jnp.clip(y0 + 1, 0, h - 1) * (w + 1) + xc

    # depth lerp factors with per-side validity; the per-bin one-hot lerp
    # vector is built IN-kernel from (wd0, wd1, d0c, d1c) to avoid
    # materializing a (samples, D) array in HBM
    vd0 = (d0 >= 0) & (d0 <= d_size - 1)
    vd1 = (d0 + 1 >= 0) & (d0 + 1 <= d_size - 1)
    d0c = jnp.clip(d0, 0, d_size - 1)
    d1c = jnp.clip(d0 + 1, 0, d_size - 1)
    wd0 = jnp.where(vd0, 1 - ld, 0.0)
    wd1 = jnp.where(vd1, ld, 0.0)
    winfo = jnp.concatenate(
        [
            w4,
            wd0[..., None], wd1[..., None],
            d0c.astype(jnp.float32)[..., None],
            d1c.astype(jnp.float32)[..., None],
        ],
        axis=-1,
    )  # (N, heads, Kpad, P, 8)

    nblk = kpad // qb
    m = heads * qb * p

    def blockify(x, lanes):
        # (N, heads, Kpad, P, lanes?) -> (N, nblk, heads*qb*P[, lanes])
        shp = (n, x.shape[1], nblk, qb) + x.shape[3:]
        x = x.reshape(shp)
        x = jnp.moveaxis(x, 2, 1)  # (N, nblk, heads, qb, P, ...)
        return x.reshape((n, nblk, m) + ((lanes,) if lanes else ()))

    rows = jnp.concatenate(
        [blockify(r0, None), blockify(r1, None)], axis=-1
    )  # (N, nblk, 2M): y0 rows then y1 rows
    winfob = blockify(winfo, 8)
    resid = (wb, attn, lx, ly, ld, vd0, vd1, d0c, d1c, vx0, vx1, vy0, vy1)
    return rows, winfob, resid, kpad


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _gather_loop(rows_ref, img_ref, sc0, sc1, m, bound=None):
    """Per pair-row stream, 8 samples' rows accumulated in registers and
    written as ONE sublane-aligned (8, width) store (measured 1.8x over
    per-row stores — experiments/probe_gather_batch.py, v5e 2026-08-19).
    Nested loops keep the SMEM index math add-only (div/mod on the critical
    path costs ~40%).  rows_ref packs y0 rows in the first m//128 sublane
    rows and y1 rows in the next m//128.

    bound (dynamic scalar, optional): gather only the first `bound` of the
    m//128 sample groups (the counted partial-block clamp); scratch rows
    beyond keep STALE contents — callers must jnp.where-mask past the
    count."""
    half = m // 128

    def outer(j, _):
        def inner(l, _):
            i = pl.multiple_of(j * 128 + l * 8, 8)
            r0 = [img_ref[pl.ds(rows_ref[j, l * 8 + t], 1), :]
                  for t in range(8)]
            sc0[pl.ds(i, 8), :] = jnp.concatenate(r0, axis=0)
            r1 = [img_ref[pl.ds(rows_ref[half + j, l * 8 + t], 1), :]
                  for t in range(8)]
            sc1[pl.ds(i, 8), :] = jnp.concatenate(r1, axis=0)
            return 0

        jax.lax.fori_loop(0, 16, inner, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, half if bound is None else bound, outer, 0,
                      unroll=False)


def _build_dvec(winfo, m, d_size):
    """Depth one-hot lerp vector from packed (wd0, wd1, d0c, d1c) lanes."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (m, d_size), 1).astype(jnp.float32)
    return (
        jnp.where(iota == winfo[:, 6:7], winfo[:, 4:5], 0.0)
        + jnp.where(iota == winfo[:, 7:8], winfo[:, 5:6], 0.0)
    )


def _corner_contribs(s0, s1, w4, dvec, cfull, d_size):
    """Per-corner depth scores and the weighted value accumulation.

    Row layout [vA | vB | dA | dB]: value slices sit at tile-aligned lane
    offsets (no lane-shift relayouts on the wide slices).
    Returns (contrib, ds_list, (va, vb, vc, vd_)).
    """
    ds_all = []
    vals = []
    contrib = None
    for s, (ja, jb) in ((s0, (0, 1)), (s1, (2, 3))):
        va = s[:, :cfull]
        vb = s[:, cfull:2 * cfull]
        da = s[:, 2 * cfull:2 * cfull + d_size]
        db = s[:, 2 * cfull + d_size:2 * cfull + 2 * d_size]
        dsa = jnp.sum(da * dvec, axis=1, keepdims=True)
        dsb = jnp.sum(db * dvec, axis=1, keepdims=True)
        term = (w4[:, ja:ja + 1] * dsa) * va + (w4[:, jb:jb + 1] * dsb) * vb
        contrib = term if contrib is None else contrib + term
        ds_all.extend([dsa, dsb])
        vals.extend([va, vb])
    return contrib, ds_all, vals


def _counts_smem(counts, n, heads, kpad):
    """(1, N) int32 per-camera visible-query counts for the kernels' block
    skip (see _fwd_kernel_s1); None -> kpad everywhere (every block active)."""
    if counts is None:
        return jnp.full((1, n), kpad, jnp.int32)
    return jnp.asarray(counts, jnp.int32).reshape(1, n)


def _fwd_kernel(counts_ref, rows_ref, winfo_ref, img_ref, out_ref, sc0, sc1,
                rsel_sc, hmask_sc, *, heads, c, p, qb, cd):
    m = sc0.shape[0]
    cfull = heads * c
    d_size = cd - cfull
    qbp = qb * p

    # selection/head-mask matrices are invariant across the grid; build them
    # once into persistent scratch instead of re-deriving iotas every step
    # (unconditionally at step (0, 0) — it may be a skipped block)
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        hm_row = jax.lax.broadcasted_iota(jnp.int32, (m, cfull), 0) // qbp
        hm_col = jax.lax.broadcasted_iota(jnp.int32, (m, cfull), 1) // c
        hmask_sc[:] = (hm_row == hm_col).astype(jnp.float32)
        r_row = jax.lax.broadcasted_iota(jnp.int32, (qb, m), 0)
        r_col = jax.lax.broadcasted_iota(jnp.int32, (qb, m), 1)
        rsel_sc[:] = ((r_col % qbp) // p == r_row).astype(jnp.float32)

    active = pl.program_id(1) * qb < counts_ref[0, pl.program_id(0)]

    @pl.when(active)
    def _():
        _gather_loop(rows_ref, img_ref, sc0, sc1, m)
        winfo = winfo_ref[:]
        dvec = _build_dvec(winfo, m, d_size)
        contrib, _, _ = _corner_contribs(sc0[:], sc1[:], winfo, dvec, cfull,
                                         d_size)

        # mask each sample row to its own head block, then reduce all
        # (head, query, point) rows of a query with ONE selection matmul (MXU)
        contrib = contrib * hmask_sc[:]
        out_ref[:] = jnp.dot(rsel_sc[:], contrib,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


def _fwd_kernel_s1(counts_ref, rows_ref, winfo_ref, img_ref, out_ref, sc0, sc1,
                   *, cfull, cd):
    """Stage-1 (heads=1, P=1): rows ARE queries; no selection reduce.

    counts_ref (SMEM (1, N)): per-camera visible-query count — whole blocks
    past it are skipped with zero output (the budget compaction packs
    visible queries first and downstream masks the rest; see
    dfa3d_pallas2._fwd_kernel_v2 for the full argument)."""
    m = sc0.shape[0]
    d_size = cd - cfull
    rem = counts_ref[0, pl.program_id(0)] - pl.program_id(1) * m
    active = rem > 0

    @pl.when(active)
    def _():
        # partial-block clamp: gather only ceil(rem/128) groups; rows past
        # rem use stale scratch and are where-masked (NaN-safe)
        bound = jnp.minimum(m // 128, (rem + 127) // 128)
        _gather_loop(rows_ref, img_ref, sc0, sc1, m, bound)
        winfo = winfo_ref[:]
        dvec = _build_dvec(winfo, m, d_size)
        contrib, _, _ = _corner_contribs(sc0[:], sc1[:], winfo, dvec, cfull,
                                         d_size)
        rowmask = jax.lax.broadcasted_iota(jnp.int32, contrib.shape, 0) < rem
        out_ref[:] = jnp.where(rowmask, contrib, 0.0)

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


def _bwd_compute(sc0, sc1, winfo, dvec, gm, dw4_ref, ddvec_ref, u0, u1,
                 cfull, d_size, rowmask=None):
    m = sc0.shape[0]
    _, ds_list, vals = _corner_contribs(sc0[:], sc1[:], winfo, dvec, cfull,
                                        d_size)
    s0 = sc0[:]
    s1 = sc1[:]
    dpts = (
        s0[:, 2 * cfull:2 * cfull + d_size],
        s0[:, 2 * cfull + d_size:2 * cfull + 2 * d_size],
        s1[:, 2 * cfull:2 * cfull + d_size],
        s1[:, 2 * cfull + d_size:2 * cfull + 2 * d_size],
    )
    # rowmask: counted partial blocks leave stale scratch past the count —
    # jnp.where (not a multiply) so NaN bit patterns cannot leak
    mask = (lambda x: jnp.where(rowmask, x, 0.0)) if rowmask is not None \
        else (lambda x: x)
    t_list = [jnp.sum(v * gm, axis=1, keepdims=True) for v in vals]  # (M, 1)
    ddvec = jnp.zeros((m, d_size), jnp.float32)
    for j in range(4):
        ddvec = ddvec + (winfo[:, j:j + 1] * t_list[j]) * dpts[j]
    dw4_ref[:] = mask(jnp.concatenate(
        [ds_list[j] * t_list[j] for j in range(4)], axis=1
    ))
    ddvec_ref[:] = mask(ddvec)

    def upd(j):
        return ((winfo[:, j:j + 1] * ds_list[j]) * gm,
                (winfo[:, j:j + 1] * t_list[j]) * dvec)

    dv0, dd0 = upd(0)
    dv1, dd1 = upd(1)
    u0[:] = mask(jnp.concatenate([dv0, dv1, dd0, dd1], axis=1))
    dv2, dd2 = upd(2)
    dv3, dd3 = upd(3)
    u1[:] = mask(jnp.concatenate([dv2, dv3, dd2, dd3], axis=1))


def _scatter_loop(rows_ref, dimg_ref, u0, u1, m, bound=None):
    half = m // 128

    def outer(j, _):
        base = j * 128

        def inner(l, _):
            i = base + l * 4
            for t in range(4):
                dimg_ref[pl.ds(rows_ref[j, l * 4 + t], 1), :] += u0[
                    pl.ds(i + t, 1), :]
                dimg_ref[pl.ds(rows_ref[half + j, l * 4 + t], 1), :] += u1[
                    pl.ds(i + t, 1), :]
            return 0

        jax.lax.fori_loop(0, 32, inner, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, half if bound is None else bound, outer, 0,
                      unroll=False)


def _bwd_kernel(counts_ref, rows_ref, winfo_ref, g_ref, img_ref, dimg_ref,
                dw4_ref, ddvec_ref, sc0, sc1, u0, u1, rfull_sc, hmask_sc,
                *, heads, c, p, qb, cd):
    m = sc0.shape[0]
    cfull = heads * c
    d_size = cd - cfull
    qbp = qb * p

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        r_row = jax.lax.broadcasted_iota(jnp.int32, (m, qb), 0)
        r_col = jax.lax.broadcasted_iota(jnp.int32, (m, qb), 1)
        rfull_sc[:] = ((r_row % qbp) // p == r_col).astype(jnp.float32)
        hm_row = jax.lax.broadcasted_iota(jnp.int32, (m, cfull), 0) // qbp
        hm_col = jax.lax.broadcasted_iota(jnp.int32, (m, cfull), 1) // c
        hmask_sc[:] = (hm_row == hm_col).astype(jnp.float32)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dimg_ref[:] = jnp.zeros_like(dimg_ref)

    # skipped blocks carry an exactly-zero incoming grad (visible-first
    # packing + masked fusion) — every product below would be zero
    active = pl.program_id(1) * qb < counts_ref[0, pl.program_id(0)]

    @pl.when(jnp.logical_not(active))
    def _():
        dw4_ref[:] = jnp.zeros_like(dw4_ref)
        ddvec_ref[:] = jnp.zeros_like(ddvec_ref)

    @pl.when(active)
    def _():
        _gather_loop(rows_ref, img_ref, sc0, sc1, m)
        winfo = winfo_ref[:]
        dvec = _build_dvec(winfo, m, d_size)
        # expand grad rows to sample rows, masked to each sample's head block
        g_rows = jnp.dot(rfull_sc[:], g_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        gm = g_rows * hmask_sc[:]
        _bwd_compute(sc0, sc1, winfo, dvec, gm, dw4_ref, ddvec_ref, u0, u1,
                     cfull, d_size)
        _scatter_loop(rows_ref, dimg_ref, u0, u1, m)


def _bwd_kernel_s1(counts_ref, rows_ref, winfo_ref, g_ref, img_ref, dimg_ref,
                   dw4_ref, ddvec_ref, sc0, sc1, u0, u1, *, cfull, cd):
    m = sc0.shape[0]
    d_size = cd - cfull

    @pl.when(pl.program_id(1) == 0)
    def _():
        dimg_ref[:] = jnp.zeros_like(dimg_ref)

    rem = counts_ref[0, pl.program_id(0)] - pl.program_id(1) * m
    active = rem > 0

    @pl.when(jnp.logical_not(active))
    def _():
        dw4_ref[:] = jnp.zeros_like(dw4_ref)
        ddvec_ref[:] = jnp.zeros_like(ddvec_ref)

    @pl.when(active)
    def _():
        bound = jnp.minimum(m // 128, (rem + 127) // 128)
        _gather_loop(rows_ref, img_ref, sc0, sc1, m, bound)
        winfo = winfo_ref[:]
        dvec = _build_dvec(winfo, m, d_size)
        rowmask = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) < rem
        _bwd_compute(sc0, sc1, winfo, dvec, g_ref[:], dw4_ref, ddvec_ref, u0,
                     u1, cfull, d_size, rowmask=rowmask)
        _scatter_loop(rows_ref, dimg_ref, u0, u1, m, bound)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _run_fwd(pair, rows, winfo, heads, c, p, qb, cd, counts_sm):
    n, nblk, m2 = rows.shape
    m = m2 // 2
    hwp = pair.shape[1]
    cfull = heads * c
    s1 = heads == 1 and p == 1
    if s1:
        kernel = functools.partial(_fwd_kernel_s1, cfull=cfull, cd=cd)
        extra_scratch = []
    else:
        kernel = functools.partial(_fwd_kernel, heads=heads, c=c, p=p, qb=qb,
                                   cd=cd)
        extra_scratch = [
            pltpu.VMEM((qb, m), jnp.float32),      # rsel (persistent)
            pltpu.VMEM((m, cfull), jnp.float32),   # head mask (persistent)
        ]
    out = pl.pallas_call(
        kernel,
        grid=(n, nblk),
        out_shape=jax.ShapeDtypeStruct((n * nblk * qb, cfull), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, n), lambda ci, bi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((2 * m // 128, 128), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((m, 8), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwp, 2 * cd), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qb, cfull), lambda ci, bi: (ci * nblk + bi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((m, 2 * cd), jnp.float32),
            pltpu.VMEM((m, 2 * cd), jnp.float32),
        ] + extra_scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        counts_sm,
        rows.reshape(-1, 128),
        winfo.reshape(n * nblk * m, 8),
        pair.reshape(n * hwp, 2 * cd),
    )
    return out.reshape(n, nblk * qb, cfull)


def _run_bwd(pair, rows, winfo, g, heads, c, p, qb, cd, counts_sm):
    n, nblk, m2 = rows.shape
    m = m2 // 2
    hwp = pair.shape[1]
    cfull = heads * c
    d_size = cd - cfull
    s1 = heads == 1 and p == 1
    if s1:
        kernel = functools.partial(_bwd_kernel_s1, cfull=cfull, cd=cd)
        extra_scratch = []
    else:
        kernel = functools.partial(_bwd_kernel, heads=heads, c=c, p=p, qb=qb,
                                   cd=cd)
        extra_scratch = [
            pltpu.VMEM((m, qb), jnp.float32),
            pltpu.VMEM((m, cfull), jnp.float32),
        ]
    dimg, dw4, ddvec = pl.pallas_call(
        kernel,
        grid=(n, nblk),
        out_shape=(
            jax.ShapeDtypeStruct((n * hwp, 2 * cd), jnp.float32),
            jax.ShapeDtypeStruct((n * nblk * m, 4), jnp.float32),
            jax.ShapeDtypeStruct((n * nblk * m, d_size), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((1, n), lambda ci, bi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((2 * m // 128, 128), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((m, 8), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, cfull), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwp, 2 * cd), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((hwp, 2 * cd), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 4), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, d_size), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((m, 2 * cd), jnp.float32),
            pltpu.VMEM((m, 2 * cd), jnp.float32),
            pltpu.VMEM((m, 2 * cd), jnp.float32),
            pltpu.VMEM((m, 2 * cd), jnp.float32),
        ] + extra_scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(
        counts_sm,
        rows.reshape(-1, 128),
        winfo.reshape(n * nblk * m, 8),
        g,
        pair.reshape(n * hwp, 2 * cd),
    )
    return dimg.reshape(n, hwp, 2 * cd), dw4, ddvec


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


def _pick_qb(k, heads, p, target=4096):
    """Query-block size: M = heads*qb*p ~ target samples, M % 1024 == 0
    (row indices ride in 2-D (M//128, 128) SMEM blocks needing >=8 full
    sublanes; the backward uses a smaller target to fit its extra
    gradient-image and update buffers in VMEM)."""
    hp = max(heads * p, 1)
    step = 1024 // math.gcd(hp, 1024)
    max_qb = max(step, (target // hp) // step * step)
    max_qb = min(max_qb, _round_up(k, step))
    # favor exact division of k to avoid padded-query blocks
    for cand in range(max_qb, step - 1, -step):
        if k % cand == 0:
            return cand
    return max_qb


def _pick_cam_chunk(n, samples_per_cam, limit=None, sample_budget=16 << 20):
    """Cameras are processed in lax.map chunks so the pair image / gradient
    image / prep arrays only materialize for `chunk` cameras at a time
    (SGCDet-L has 1.6M samples/camera at the finest level; prep+grad arrays
    run ~150 B/sample).  The budget is deliberately generous: every lax.map
    iteration pays ~4-5 ms of while-loop machinery on this backend (operand
    dynamic-slice copies + per-iteration sync — measured via jax.profiler at
    the ScanNet L2 shape, where 4 iterations cost 22 ms with every kernel
    block SKIPPED, docs/roadmap.md round-5), so chunking is worth it only
    when the alternative is GB-scale HBM.  16M samples ~ 2.4 GB prep leaves
    the ScanNet base model (5.9M samples at 40 views, 14.7M at the released
    100-view eval) UNCHUNKED; the backward call sites pass 8M (grad arrays
    double the footprint)."""
    limit = max(1, min(n if limit is None else limit,
                       sample_budget // max(samples_per_cam, 1)))
    for cand in range(min(limit, n), 0, -1):
        if n % cand == 0:
            return cand
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def dfa3d_attention_pallas(value_img, dpt_img, sampling_locations,
                           attention_weights, num_heads):
    """Fused depth-weighted deformable attention (Pallas TPU kernel).

    Args:
      value_img: (N, H, W, heads*c) camera features.
      dpt_img: (N, H, W, D) depth distributions.
      sampling_locations: (N, K, heads, P, 3) normalized (u, v, d).
      attention_weights: (N, K, heads, P).
      num_heads: static head count.
    Returns (N, K, heads*c), dtype of value_img.
    """
    out, _ = _fwd_impl(value_img, dpt_img, sampling_locations,
                       attention_weights, num_heads)
    return out


def _fwd_impl(value_img, dpt_img, sampling_locations, attention_weights,
              num_heads, counts=None):
    n, k = sampling_locations.shape[:2]
    hp = sampling_locations.shape[2] * sampling_locations.shape[3]
    chunk = _pick_cam_chunk(n, k * hp)
    if chunk == n:
        out = _fwd_cams(value_img, dpt_img, sampling_locations,
                        attention_weights, num_heads, counts=counts)
    else:
        groups = n // chunk

        def body(args):
            return _fwd_cams(*args[:4], num_heads,
                             counts=(args[4] if len(args) > 4 else None))

        xs = [value_img, dpt_img, sampling_locations, attention_weights]
        if counts is not None:
            xs.append(counts)
        out = jax.lax.map(
            body,
            tuple(x.reshape((groups, chunk) + x.shape[1:]) for x in xs),
        )
        out = out.reshape((n,) + out.shape[2:])
    return out, (value_img, dpt_img, sampling_locations, attention_weights)


def _fwd_cams(value_img, dpt_img, sampling_locations, attention_weights,
              num_heads, counts=None):
    n, h, w, cfull = value_img.shape
    d_size = dpt_img.shape[-1]
    k = sampling_locations.shape[1]
    p = sampling_locations.shape[3]
    heads = num_heads
    c = cfull // heads
    cd = cfull + d_size
    qb = _pick_qb(k, heads, p)

    pair = _build_pair_image(value_img, dpt_img)
    rows, winfo, resid, kpad = _sample_quantities(
        sampling_locations, attention_weights, h, w, d_size, qb
    )
    out = _run_fwd(pair, rows, winfo, heads, c, p, qb, cd,
                   _counts_smem(counts, n, heads, kpad))
    return out[:, :k].astype(value_img.dtype)


def _vjp_fwd(value_img, dpt_img, sampling_locations, attention_weights, num_heads):
    return _fwd_impl(value_img, dpt_img, sampling_locations, attention_weights,
                     num_heads)


def _bwd_impl(value_img, dpt_img, sampling_locations, attention_weights, g,
              num_heads, counts=None):
    n, k = sampling_locations.shape[:2]
    hp = sampling_locations.shape[2] * sampling_locations.shape[3]
    chunk = _pick_cam_chunk(n, k * hp, sample_budget=8 << 20)
    if chunk == n:
        return _bwd_cams(value_img, dpt_img, sampling_locations,
                         attention_weights, g, num_heads, counts=counts)
    groups = n // chunk

    def body(args):
        return _bwd_cams(*args[:4], args[4], num_heads,
                         counts=(args[5] if len(args) > 5 else None))

    xs = [value_img, dpt_img, sampling_locations, attention_weights, g]
    if counts is not None:
        xs.append(counts)
    grads = jax.lax.map(
        body,
        tuple(x.reshape((groups, chunk) + x.shape[1:]) for x in xs),
    )
    return tuple(x.reshape((n,) + x.shape[2:]) for x in grads)


def _vjp_bwd(num_heads, res, g):
    value_img, dpt_img, sampling_locations, attention_weights = res
    return _bwd_impl(value_img, dpt_img, sampling_locations,
                     attention_weights, g, num_heads)


def _bwd_cams(value_img, dpt_img, sampling_locations, attention_weights, g,
              num_heads, counts=None):
    n, h, w, cfull = value_img.shape
    d_size = dpt_img.shape[-1]
    k = sampling_locations.shape[1]
    p = sampling_locations.shape[3]
    heads = num_heads
    c = cfull // heads
    cd = cfull + d_size
    qb = _pick_qb(k, heads, p, target=2048)

    pair = _build_pair_image(value_img, dpt_img)
    rows, winfo, resid, kpad = _sample_quantities(
        sampling_locations, attention_weights, h, w, d_size, qb
    )
    (wb, attn_t, lx, ly, ld, vd0, vd1, d0c, d1c, vx0, vx1, vy0, vy1) = resid

    g = g.astype(jnp.float32)
    if kpad != k:
        g = jnp.pad(g, ((0, 0), (0, kpad - k), (0, 0)))
    g_flat = g.reshape(-1, cfull)

    dimg, dw4_flat, ddvec_flat = _run_bwd(
        pair, rows, winfo, g_flat, heads, c, p, qb, cd,
        _counts_smem(counts, n, heads, kpad),
    )

    # un-pair the image gradient: d_pixel(y,x) = slotB(y, x'=x) + slotA(y, x'=x+1)
    dimg = dimg[:, : h * (w + 1)].reshape(n, h, w + 1, 2 * cd)
    d_size = cd - cfull
    d_value = (
        dimg[:, :, :-1, cfull:2 * cfull] + dimg[:, :, 1:, :cfull]
    ).astype(value_img.dtype)
    d_dpt = (
        dimg[:, :, :-1, 2 * cfull + d_size:]
        + dimg[:, :, 1:, 2 * cfull:2 * cfull + d_size]
    ).astype(dpt_img.dtype)

    # de-blockify sample grads back to (N, heads, Kpad, P, lanes)
    nblk = kpad // qb
    m = heads * qb * p

    def unblock(x, lanes):
        x = x.reshape(n, nblk, heads, qb, p, lanes)
        x = jnp.moveaxis(x, 2, 1).reshape(n, heads, kpad, p, lanes)
        return x

    dw4 = unblock(dw4_flat, 4)
    ddvec = unblock(ddvec_flat, d_size)

    # chain to attention weights: w4 = wb * attn
    d_attn = jnp.sum(dw4 * wb, axis=-1)  # (N, heads, Kpad, P)
    # chain to bilinear weights -> u, v (pixel grads scaled to normalized)
    d_wb = dw4 * attn_t[..., None]
    va = (vy0 & vx0).astype(jnp.float32)
    vb = (vy0 & vx1).astype(jnp.float32)
    vc = (vy1 & vx0).astype(jnp.float32)
    vd_ = (vy1 & vx1).astype(jnp.float32)
    d_lx = (
        -d_wb[..., 0] * (1 - ly) * va
        + d_wb[..., 1] * (1 - ly) * vb
        - d_wb[..., 2] * ly * vc
        + d_wb[..., 3] * ly * vd_
    )
    d_ly = (
        -d_wb[..., 0] * (1 - lx) * va
        - d_wb[..., 1] * lx * vb
        + d_wb[..., 2] * (1 - lx) * vc
        + d_wb[..., 3] * lx * vd_
    )
    du = d_lx * w
    dv = d_ly * h
    # chain through the depth lerp vector -> d
    oh0 = jax.nn.one_hot(d0c, d_size, dtype=jnp.float32)
    oh1 = jax.nn.one_hot(d1c, d_size, dtype=jnp.float32)
    ddvec_dld = -oh0 * vd0[..., None].astype(jnp.float32) + oh1 * vd1[
        ..., None
    ].astype(jnp.float32)
    d_ld = jnp.sum(ddvec * ddvec_dld, axis=-1)
    dd = d_ld * d_size

    d_locs = jnp.stack([du, dv, dd], axis=-1)  # (N, heads, Kpad, P, 3)
    d_locs = jnp.moveaxis(d_locs, 1, 2)[:, :k]  # (N, K, heads, P, 3)
    d_attn = jnp.moveaxis(d_attn, 1, 2)[:, :k]
    return (
        d_value,
        d_dpt,
        d_locs.astype(sampling_locations.dtype),
        d_attn.astype(attention_weights.dtype),
    )


dfa3d_attention_pallas.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def dfa3d_attention_pallas_c(value_img, dpt_img, sampling_locations,
                             attention_weights, valid_counts, num_heads):
    """v1 kernel with per-camera visible-count block skipping.

    valid_counts: (N,) float32, visible queries packed FIRST (the budget
    compaction's order).  Positions >= valid_counts[cam] return ZEROS and
    produce zero loc/attn gradients — exact whenever the caller masks them
    downstream (see dfa3d_pallas2.dfa3d_attention_pallas_v2c)."""
    out, _ = _fwd_impl_c(value_img, dpt_img, sampling_locations,
                         attention_weights, valid_counts, num_heads)
    return out


def _fwd_impl_c(value_img, dpt_img, sampling_locations, attention_weights,
                valid_counts, num_heads):
    out, _ = _fwd_impl(value_img, dpt_img, sampling_locations,
                       attention_weights, num_heads, counts=valid_counts)
    return out, (value_img, dpt_img, sampling_locations, attention_weights,
                 valid_counts)


def _vjp_bwd_c(num_heads, res, g):
    value_img, dpt_img, locs, attn, valid_counts = res
    grads = _bwd_impl(value_img, dpt_img, locs, attn, g, num_heads,
                      counts=valid_counts)
    return grads + (jnp.zeros_like(valid_counts),)


dfa3d_attention_pallas_c.defvjp(_fwd_impl_c, _vjp_bwd_c)
