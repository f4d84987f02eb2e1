"""Quad-row DFA3D Pallas kernel: ONE row copy per sample.

Same semantics as ``dfa3d_pallas`` (the jnp oracle ``msda.dfa3d_attention``
is the spec; reference CUDA kernels:
/root/reference/packages/3D-deformable-attention/DFA3D/dfa3D/ops/csrc/common/
cuda/wms_deform_attn_cuda_kernel.cuh:24-159), but the camera operand packs
all FOUR bilinear corners of a sample into one gatherable row:

    quad row (y', x') = [vA | vB | vC | vD | dA | dB | dC | dD]
    A=(y'-1, x'-1)  B=(y'-1, x')  C=(y', x'-1)  D=(y', x')

for y' in 0..H, x' in 0..W (border rows/columns duplicate edge pixels and
are only read with zero bilinear weight).  A sample gathers exactly ONE row
of 4*(C+D) f32 lanes at row index (clip(y0,-1,H-1)+1)*(W+1)+clip(x0,-1,W-1)+1.

Why: the measured single-row VMEM gather rate is ~140M rows/s and flat in
row width from 176 to 640 lanes (experiments/probe_row_width.py) — the loop
is copy-issue-bound, not bandwidth-bound.  The pair layout
(``dfa3d_pallas``) spends TWO copies per sample; this layout spends one for
the same total bytes, halving the dominant cost of both the forward gather
and the backward scatter.  Value slices sit at lane offsets 0, C, 2C, 3C —
tile-aligned for cfull a multiple of 128 (both released widths: 256, 128).

The (query, head, point) block ordering, weight packing, epilogue selection
matmul, and the outside-kernel location/attention grad chain are shared
with ``dfa3d_pallas`` (imported).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dfa3d_pallas import (
    _build_dvec,
    _counts_smem,
    _pick_cam_chunk,
    _pick_qb,
    _round_up,
    _sample_quantities,
)


# ---------------------------------------------------------------------------
# host-side prep (plain XLA, fused into the surrounding jit)
# ---------------------------------------------------------------------------


def _build_quad_image(value_img, dpt_img):
    """(N, H, W, C) + (N, H, W, D) -> (N, (H+1)*(W+1), 4*(C+D)) quad rows."""
    n, h, w, _ = value_img.shape

    def pad_lr(x):  # x'-1 / x' columns with duplicated edges
        left = jnp.concatenate([x[:, :, :1], x], axis=2)
        right = jnp.concatenate([x, x[:, :, -1:]], axis=2)
        return left, right

    def pad_ud(x):  # y'-1 / y' rows with duplicated edges
        up = jnp.concatenate([x[:, :1], x], axis=1)
        dn = jnp.concatenate([x, x[:, -1:]], axis=1)
        return up, dn

    v = value_img.astype(jnp.float32)
    dp = dpt_img.astype(jnp.float32)
    va_, vb_ = pad_lr(v)
    da_, db_ = pad_lr(dp)
    vau, vad = pad_ud(va_)
    vbu, vbd = pad_ud(vb_)
    dau, dad = pad_ud(da_)
    dbu, dbd = pad_ud(db_)
    quad = jnp.concatenate([vau, vbu, vad, vbd, dau, dbu, dad, dbd], axis=-1)
    hwq = (h + 1) * (w + 1)
    quad = quad.reshape(n, hwq, quad.shape[-1])
    hwq_pad = _round_up(hwq, 8)
    if hwq_pad != hwq:
        quad = jnp.pad(quad, ((0, 0), (0, hwq_pad - hwq), (0, 0)))
    return quad


def _quad_rows(rows, h, w):
    """Pair-layout row ids (N, nblk, 2M: y0 rows then y1 rows) -> quad row
    ids (N, nblk, M).  The pair y0 row id is clip(y0,0,H-1)*(W+1)+x'; the
    quad id needs clip(y0,-1,H-1)+1, which differs from the pair id's y only
    when y0 < 0 — recoverable because then the y1 row id equals x' exactly
    (y1 row 0): quad_y = pair_y0_id//(W+1) + (pair_y1_id == pair_y0_id)…

    Simpler and exact: recompute from the ids.  y0c = id0 // (W+1),
    x' = id0 % (W+1), y1c = id1 // (W+1).  y0 < 0  <=>  y0c == 0 == y1c.
    quad_ry = where(y0c == y1c on the TOP edge, y0c, y0c + 1)… the top edge
    case (y0=-1) maps to ry=0 and all interior/bottom cases to y0c+1:
    interior y1c = y0c+1; bottom (y0=H-1) y1c == y0c == H-1 -> ry = H.
    """
    wq = w + 1
    m = rows.shape[-1] // 2
    id0 = rows[..., :m]
    id1 = rows[..., m:]
    y0c = id0 // wq
    xq = id0 % wq
    y1c = id1 // wq
    top = (y0c == 0) & (y1c == 0)  # y0 = -1 (or fully OOB above: harmless)
    ry = jnp.where(top, 0, y0c + 1)
    return ry * wq + xq


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _gather_loop_q(rows_ref, img_ref, sc, m, bound=None):
    """Eight quad rows accumulated in registers, ONE aligned (8, width)
    store per iteration (measured 1.8x over per-row stores —
    experiments/probe_gather_batch.py, v5e 2026-08-19).  bound (dynamic
    scalar, optional): gather only the first `bound` sample groups (the
    counted partial-block clamp); stale scratch past them must be
    where-masked by the caller."""
    def outer(j, _):
        def inner(l, _):
            i = pl.multiple_of(j * 128 + l * 8, 8)
            rows = [
                img_ref[pl.ds(rows_ref[j, l * 8 + t], 1), :]
                for t in range(8)
            ]
            sc[pl.ds(i, 8), :] = jnp.concatenate(rows, axis=0)
            return 0

        jax.lax.fori_loop(0, 16, inner, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, m // 128 if bound is None else bound, outer, 0,
                      unroll=False)


def _corner_contribs_q(s, w4, dvec, cfull, d_size):
    """Per-corner depth scores + weighted value accumulation on quad rows."""
    base_d = 4 * cfull
    ds_list = []
    vals = []
    contrib = None
    for j in range(4):
        vj = s[:, j * cfull:(j + 1) * cfull]
        dj = s[:, base_d + j * d_size:base_d + (j + 1) * d_size]
        dsj = jnp.sum(dj * dvec, axis=1, keepdims=True)
        term = (w4[:, j:j + 1] * dsj) * vj
        contrib = term if contrib is None else contrib + term
        ds_list.append(dsj)
        vals.append(vj)
    return contrib, ds_list, vals


def _fwd_kernel_q(rows_ref, winfo_ref, img_ref, out_ref, sc, rsel_sc,
                  hmask_sc, *, heads, c, p, qb, cd):
    m = sc.shape[0]
    cfull = heads * c
    d_size = cd - cfull
    qbp = qb * p

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        hm_row = jax.lax.broadcasted_iota(jnp.int32, (m, cfull), 0) // qbp
        hm_col = jax.lax.broadcasted_iota(jnp.int32, (m, cfull), 1) // c
        hmask_sc[:] = (hm_row == hm_col).astype(jnp.float32)
        r_row = jax.lax.broadcasted_iota(jnp.int32, (qb, m), 0)
        r_col = jax.lax.broadcasted_iota(jnp.int32, (qb, m), 1)
        rsel_sc[:] = ((r_col % qbp) // p == r_row).astype(jnp.float32)

    _gather_loop_q(rows_ref, img_ref, sc, m)
    winfo = winfo_ref[:]
    dvec = _build_dvec(winfo, m, d_size)
    contrib, _, _ = _corner_contribs_q(sc[:], winfo, dvec, cfull, d_size)
    contrib = contrib * hmask_sc[:]
    out_ref[:] = jnp.dot(rsel_sc[:], contrib, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


def _fwd_kernel_q_s1(rows_ref, winfo_ref, img_ref, out_ref, sc, *, cfull, cd):
    """Stage-1 (heads=1, P=1): rows ARE queries; no selection reduce."""
    m = sc.shape[0]
    d_size = cd - cfull
    _gather_loop_q(rows_ref, img_ref, sc, m)
    winfo = winfo_ref[:]
    dvec = _build_dvec(winfo, m, d_size)
    contrib, _, _ = _corner_contribs_q(sc[:], winfo, dvec, cfull, d_size)
    out_ref[:] = contrib


def _scatter_loop_q(rows_ref, dimg_ref, u, m):
    def outer(j, _):
        base = j * 128

        def inner(l, _):
            i = base + l * 8
            for t in range(8):
                dimg_ref[pl.ds(rows_ref[j, l * 8 + t], 1), :] += u[
                    pl.ds(i + t, 1), :]
            return 0

        jax.lax.fori_loop(0, 16, inner, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, m // 128, outer, 0, unroll=False)


def _bwd_compute_q(sc, winfo, dvec, gm, dw4_ref, ddvec_ref, u, cfull, d_size):
    m = sc.shape[0]
    s = sc[:]
    _, ds_list, vals = _corner_contribs_q(s, winfo, dvec, cfull, d_size)
    base_d = 4 * cfull
    dpts = [s[:, base_d + j * d_size:base_d + (j + 1) * d_size]
            for j in range(4)]
    t_list = [jnp.sum(v * gm, axis=1, keepdims=True) for v in vals]  # (M, 1)
    ddvec = jnp.zeros((m, d_size), jnp.float32)
    for j in range(4):
        ddvec = ddvec + (winfo[:, j:j + 1] * t_list[j]) * dpts[j]
    dw4_ref[:] = jnp.concatenate(
        [ds_list[j] * t_list[j] for j in range(4)], axis=1
    )
    ddvec_ref[:] = ddvec
    dvs = [(winfo[:, j:j + 1] * ds_list[j]) * gm for j in range(4)]
    dds = [(winfo[:, j:j + 1] * t_list[j]) * dvec for j in range(4)]
    u[:] = jnp.concatenate(dvs + dds, axis=1)


def _bwd_kernel_q(rows_ref, winfo_ref, g_ref, img_ref, dimg_ref, dw4_ref,
                  ddvec_ref, sc, u, rfull_sc, hmask_sc, *, heads, c, p, qb, cd):
    m = sc.shape[0]
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

    _gather_loop_q(rows_ref, img_ref, sc, m)
    winfo = winfo_ref[:]
    dvec = _build_dvec(winfo, m, d_size)
    g_rows = jnp.dot(rfull_sc[:], g_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    gm = g_rows * hmask_sc[:]
    _bwd_compute_q(sc, winfo, dvec, gm, dw4_ref, ddvec_ref, u, cfull, d_size)
    _scatter_loop_q(rows_ref, dimg_ref, u, m)


def _bwd_kernel_q_s1(rows_ref, winfo_ref, g_ref, img_ref, dimg_ref, dw4_ref,
                     ddvec_ref, sc, u, *, cfull, cd):
    m = sc.shape[0]
    d_size = cd - cfull

    @pl.when(pl.program_id(1) == 0)
    def _():
        dimg_ref[:] = jnp.zeros_like(dimg_ref)

    _gather_loop_q(rows_ref, img_ref, sc, m)
    winfo = winfo_ref[:]
    dvec = _build_dvec(winfo, m, d_size)
    _bwd_compute_q(sc, winfo, dvec, g_ref[:], dw4_ref, ddvec_ref, u,
                   cfull, d_size)
    _scatter_loop_q(rows_ref, dimg_ref, u, m)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _run_fwd_q(quad, rows, winfo, heads, c, p, qb, cd):
    n, nblk, m = rows.shape
    hwq = quad.shape[1]
    cfull = heads * c
    s1 = heads == 1 and p == 1
    if s1:
        kernel = functools.partial(_fwd_kernel_q_s1, cfull=cfull, cd=cd)
        extra_scratch = []
    else:
        kernel = functools.partial(_fwd_kernel_q, heads=heads, c=c, p=p,
                                   qb=qb, cd=cd)
        extra_scratch = [
            pltpu.VMEM((qb, m), jnp.float32),      # rsel (persistent)
            pltpu.VMEM((m, cfull), jnp.float32),   # head mask (persistent)
        ]
    out = pl.pallas_call(
        kernel,
        grid=(n, nblk),
        out_shape=jax.ShapeDtypeStruct((n * nblk * qb, cfull), jnp.float32),
        in_specs=[
            pl.BlockSpec((m // 128, 128), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((m, 8), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwq, 4 * cd), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qb, cfull), lambda ci, bi: (ci * nblk + bi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((m, 4 * cd), jnp.float32),
        ] + extra_scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        rows.reshape(-1, 128),
        winfo.reshape(n * nblk * m, 8),
        quad.reshape(n * hwq, 4 * cd),
    )
    return out.reshape(n, nblk * qb, cfull)


def _run_bwd_q(quad, rows, winfo, g, heads, c, p, qb, cd):
    n, nblk, m = rows.shape
    hwq = quad.shape[1]
    cfull = heads * c
    d_size = cd - cfull
    s1 = heads == 1 and p == 1
    if s1:
        kernel = functools.partial(_bwd_kernel_q_s1, cfull=cfull, cd=cd)
        extra_scratch = []
    else:
        kernel = functools.partial(_bwd_kernel_q, heads=heads, c=c, p=p,
                                   qb=qb, cd=cd)
        extra_scratch = [
            pltpu.VMEM((m, qb), jnp.float32),
            pltpu.VMEM((m, cfull), jnp.float32),
        ]
    dimg, dw4, ddvec = pl.pallas_call(
        kernel,
        grid=(n, nblk),
        out_shape=(
            jax.ShapeDtypeStruct((n * hwq, 4 * cd), jnp.float32),
            jax.ShapeDtypeStruct((n * nblk * m, 4), jnp.float32),
            jax.ShapeDtypeStruct((n * nblk * m, d_size), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((m // 128, 128), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((m, 8), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, cfull), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwq, 4 * cd), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((hwq, 4 * cd), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 4), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, d_size), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((m, 4 * cd), jnp.float32),   # gathered rows
            pltpu.VMEM((m, 4 * cd), jnp.float32),   # update rows
        ] + extra_scratch,
        compiler_params=pltpu.CompilerParams(
            # quad img + quad dimg blocks are both resident (each ~21MB at
            # the ScanNet L2 shape, double-buffered); 120M leaves ~7M short
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
    )(
        rows.reshape(-1, 128),
        winfo.reshape(n * nblk * m, 8),
        g,
        quad.reshape(n * hwq, 4 * cd),
    )
    return dimg.reshape(n, hwq, 4 * cd), dw4, ddvec


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def dfa3d_attention_pallas_v3(value_img, dpt_img, sampling_locations,
                              attention_weights, num_heads):
    """Fused depth-weighted deformable attention (quad-row Pallas kernel).

    Shapes as ``dfa3d_attention_pallas``; one row gather per sample.
    """
    out, _ = _fwd_impl_v3(value_img, dpt_img, sampling_locations,
                          attention_weights, num_heads)
    return out


def _fwd_impl_v3(value_img, dpt_img, sampling_locations, attention_weights,
                 num_heads):
    n, k = sampling_locations.shape[:2]
    hp = sampling_locations.shape[2] * sampling_locations.shape[3]
    chunk = _pick_cam_chunk(n, k * hp)
    if chunk == n:
        out = _fwd_cams_q(value_img, dpt_img, sampling_locations,
                          attention_weights, num_heads)
    else:
        groups = n // chunk

        def body(args):
            return _fwd_cams_q(*args, num_heads)

        out = jax.lax.map(
            body,
            tuple(
                x.reshape((groups, chunk) + x.shape[1:])
                for x in (value_img, dpt_img, sampling_locations,
                          attention_weights)
            ),
        )
        out = out.reshape((n,) + out.shape[2:])
    return out, (value_img, dpt_img, sampling_locations, attention_weights)


def _fwd_cams_q(value_img, dpt_img, sampling_locations, attention_weights,
                num_heads):
    n, h, w, cfull = value_img.shape
    d_size = dpt_img.shape[-1]
    k = sampling_locations.shape[1]
    p = sampling_locations.shape[3]
    heads = num_heads
    c = cfull // heads
    cd = cfull + d_size
    qb = _pick_qb(k, heads, p)

    quad = _build_quad_image(value_img, dpt_img)
    rows2, winfo, resid, kpad = _sample_quantities(
        sampling_locations, attention_weights, h, w, d_size, qb
    )
    rows = _quad_rows(rows2, h, w)
    out = _run_fwd_q(quad, rows, winfo, heads, c, p, qb, cd)
    return out[:, :k].astype(value_img.dtype)


def _vjp_fwd_v3(value_img, dpt_img, sampling_locations, attention_weights,
                num_heads):
    return _fwd_impl_v3(value_img, dpt_img, sampling_locations,
                        attention_weights, num_heads)


def _vjp_bwd_v3(num_heads, res, g):
    value_img, dpt_img, sampling_locations, attention_weights = res
    n, k = sampling_locations.shape[:2]
    hp = sampling_locations.shape[2] * sampling_locations.shape[3]
    chunk = _pick_cam_chunk(n, k * hp, sample_budget=8 << 20)
    if chunk == n:
        return _bwd_cams_q(value_img, dpt_img, sampling_locations,
                           attention_weights, g, num_heads)
    groups = n // chunk

    def body(args):
        return _bwd_cams_q(*args[:4], args[4], num_heads)

    grads = jax.lax.map(
        body,
        tuple(
            x.reshape((groups, chunk) + x.shape[1:])
            for x in (value_img, dpt_img, sampling_locations,
                      attention_weights, g)
        ),
    )
    return tuple(x.reshape((n,) + x.shape[2:]) for x in grads)


def _bwd_cams_q(value_img, dpt_img, sampling_locations, attention_weights, g,
                num_heads):
    n, h, w, cfull = value_img.shape
    d_size = dpt_img.shape[-1]
    k = sampling_locations.shape[1]
    p = sampling_locations.shape[3]
    heads = num_heads
    c = cfull // heads
    cd = cfull + d_size
    qb = _pick_qb(k, heads, p, target=2048)

    quad = _build_quad_image(value_img, dpt_img)
    rows2, winfo, resid, kpad = _sample_quantities(
        sampling_locations, attention_weights, h, w, d_size, qb
    )
    rows = _quad_rows(rows2, h, w)
    (wb, attn_t, lx, ly, ld, vd0, vd1, d0c, d1c, vx0, vx1, vy0, vy1) = resid

    g = g.astype(jnp.float32)
    if kpad != k:
        g = jnp.pad(g, ((0, 0), (0, kpad - k), (0, 0)))
    g_flat = g.reshape(-1, cfull)

    dimg, dw4_flat, ddvec_flat = _run_bwd_q(
        quad, rows, winfo, g_flat, heads, c, p, qb, cd
    )

    # un-quad the image gradient: pixel (y, x) collects its A/B/C/D slots
    #   A from row (y+1, x+1), B from (y+1, x), C from (y, x+1), D from (y, x)
    dimg = dimg[:, :(h + 1) * (w + 1)].reshape(n, h + 1, w + 1, 4 * cd)

    def unquad(base, width):
        a = dimg[:, 1:, 1:, base:base + width]
        b = dimg[:, 1:, :-1, base + width:base + 2 * width]
        cs = dimg[:, :-1, 1:, base + 2 * width:base + 3 * width]
        d_ = dimg[:, :-1, :-1, base + 3 * width:base + 4 * width]
        return a + b + cs + d_

    d_value = unquad(0, cfull).astype(value_img.dtype)
    d_dpt = unquad(4 * cfull, d_size).astype(dpt_img.dtype)

    # de-blockify sample grads back to (N, heads, Kpad, P, lanes)
    nblk = kpad // qb

    def unblock(x, lanes):
        x = x.reshape(n, nblk, heads, qb, p, lanes)
        x = jnp.moveaxis(x, 2, 1).reshape(n, heads, kpad, p, lanes)
        return x

    dw4 = unblock(dw4_flat, 4)
    ddvec = unblock(ddvec_flat, d_size)

    # chain to attention weights / sampling locations (identical math to
    # dfa3d_pallas._bwd_cams)
    d_attn = jnp.sum(dw4 * wb, axis=-1)
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
    oh0 = jax.nn.one_hot(d0c, d_size, dtype=jnp.float32)
    oh1 = jax.nn.one_hot(d1c, d_size, dtype=jnp.float32)
    ddvec_dld = -oh0 * vd0[..., None].astype(jnp.float32) + oh1 * vd1[
        ..., None
    ].astype(jnp.float32)
    d_ld = jnp.sum(ddvec * ddvec_dld, axis=-1)
    dd = d_ld * d_size

    d_locs = jnp.stack([du, dv, dd], axis=-1)
    d_locs = jnp.moveaxis(d_locs, 1, 2)[:, :k]
    d_attn = jnp.moveaxis(d_attn, 1, 2)[:, :k]
    return (
        d_value,
        d_dpt,
        d_locs.astype(sampling_locations.dtype),
        d_attn.astype(attention_weights.dtype),
    )


dfa3d_attention_pallas_v3.defvjp(_vjp_fwd_v3, _vjp_bwd_v3)


# ===========================================================================
# Packed bf16 quad rows: ONE 2*(C+D)-word copy per sample (HALF v1's bytes)
# ===========================================================================
#
# The gather loop is bytes-bound at wide rows (per-row cost ~= 5 ns fixed +
# 0.016 ns/lane, experiments/probe_row_width.py), so the unpacked quad row
# (4*(C+D) lanes) buys nothing over v1's two pair rows — same bytes.  Packing
# corner PAIRS as bf16 into f32 words halves the bytes AND the copies:
#
#     packed row (y', x') = [pk(vA,vB) | pk(vC,vD) | pk(dA,dB) | pk(dC,dD)]
#
# where pk(a, b) = f32 word with hi16 = bf16(a), lo16 = bf16(b): width
# 2*(C+D) f32 words — the same width as ONE v1 pair row, gathered once per
# sample instead of twice.  In-kernel unpack is two integer VPU ops + a
# bitcast per corner slice (an f32 whose low 16 mantissa bits are zero IS the
# bf16 value, exactly).  The model's compute dtype is bf16 by default
# (configs/config.py), so the packing is lossless in production; for f32
# inputs it rounds values/depth-scores to bf16 (~1e-2 abs on O(1) data) —
# the backward recomputes from the exact f32 primals, so gradients keep
# full precision.


def _pack2(a, b):
    """Two f32 arrays -> one f32 array: hi16 = bf16(a), lo16 = bf16(b)."""
    ahi = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32) << 16
    blo = jax.lax.bitcast_convert_type(
        b.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(ahi | blo, jnp.float32)


def _build_quad_packed(value_img, dpt_img):
    """(N, H, W, C) + (N, H, W, D) -> (N, (H+1)*(W+1), 2*(C+D)) packed rows."""
    n, h, w, _ = value_img.shape

    def pad_lr(x):
        left = jnp.concatenate([x[:, :, :1], x], axis=2)
        right = jnp.concatenate([x, x[:, :, -1:]], axis=2)
        return left, right

    def pad_ud(x):
        up = jnp.concatenate([x[:, :1], x], axis=1)
        dn = jnp.concatenate([x, x[:, -1:]], axis=1)
        return up, dn

    v = value_img.astype(jnp.float32)
    dp = dpt_img.astype(jnp.float32)
    va_, vb_ = pad_lr(v)
    da_, db_ = pad_lr(dp)
    vau, vad = pad_ud(va_)
    vbu, vbd = pad_ud(vb_)
    dau, dad = pad_ud(da_)
    dbu, dbd = pad_ud(db_)
    # corners: A=up-left B=up-right C=down-left D=down-right
    packed = jnp.concatenate(
        [_pack2(vau, vbu), _pack2(vad, vbd), _pack2(dau, dbu),
         _pack2(dad, dbd)],
        axis=-1,
    )
    hwq = (h + 1) * (w + 1)
    packed = packed.reshape(n, hwq, packed.shape[-1])
    hwq_pad = _round_up(hwq, 8)
    if hwq_pad != hwq:
        packed = jnp.pad(packed, ((0, 0), (0, hwq_pad - hwq), (0, 0)))
    return packed


def _unpack_hi(x):
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jax.lax.bitcast_convert_type(b & jnp.int32(-65536), jnp.float32)


def _unpack_lo(x):
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jax.lax.bitcast_convert_type(b << 16, jnp.float32)


def _corner_contribs_pq(s, w4, dvec, cfull, d_size):
    """Unpack + per-corner depth scores + weighted value accumulation."""
    base_d = 2 * cfull
    contrib = None
    for j, (sl, unpack) in enumerate((
        (0, _unpack_hi), (0, _unpack_lo), (1, _unpack_hi), (1, _unpack_lo),
    )):
        vj = unpack(s[:, sl * cfull:(sl + 1) * cfull])
        dj = unpack(s[:, base_d + sl * d_size:base_d + (sl + 1) * d_size])
        dsj = jnp.sum(dj * dvec, axis=1, keepdims=True)
        term = (w4[:, j:j + 1] * dsj) * vj
        contrib = term if contrib is None else contrib + term
    return contrib


def _fwd_kernel_pq(counts_ref, rows_ref, winfo_ref, img_ref, out_ref, sc,
                   rsel_sc, hmask_sc, *, heads, c, p, qb, cd):
    m = sc.shape[0]
    cfull = heads * c
    d_size = cd - cfull
    qbp = qb * p

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
        _gather_loop_q(rows_ref, img_ref, sc, m)
        winfo = winfo_ref[:]
        dvec = _build_dvec(winfo, m, d_size)
        contrib = _corner_contribs_pq(sc[:], winfo, dvec, cfull, d_size)
        contrib = contrib * hmask_sc[:]
        out_ref[:] = jnp.dot(rsel_sc[:], contrib,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


def _fwd_kernel_pq_s1(counts_ref, rows_ref, winfo_ref, img_ref, out_ref, sc,
                      *, cfull, cd):
    """Stage-1 (heads=1, P=1): rows ARE queries; no selection reduce.
    Blocks past counts_ref[0, cam] are skipped with zero output (see
    dfa3d_pallas._fwd_kernel_s1)."""
    m = sc.shape[0]
    d_size = cd - cfull
    rem = counts_ref[0, pl.program_id(0)] - pl.program_id(1) * m
    active = rem > 0

    @pl.when(active)
    def _():
        # partial-block clamp: gather only ceil(rem/128) groups; rows past
        # rem use stale scratch and are where-masked (NaN-safe)
        bound = jnp.minimum(m // 128, (rem + 127) // 128)
        _gather_loop_q(rows_ref, img_ref, sc, m, bound)
        winfo = winfo_ref[:]
        dvec = _build_dvec(winfo, m, d_size)
        contrib = _corner_contribs_pq(sc[:], winfo, dvec, cfull, d_size)
        rowmask = jax.lax.broadcasted_iota(jnp.int32, contrib.shape, 0) < rem
        out_ref[:] = jnp.where(rowmask, contrib, 0.0)

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


def _run_fwd_pq(packed, rows, winfo, heads, c, p, qb, cd, counts_sm):
    n, nblk, m = rows.shape
    hwq = packed.shape[1]
    cfull = heads * c
    s1 = heads == 1 and p == 1
    if s1:
        kernel = functools.partial(_fwd_kernel_pq_s1, cfull=cfull, cd=cd)
        extra_scratch = []
    else:
        kernel = functools.partial(_fwd_kernel_pq, heads=heads, c=c, p=p,
                                   qb=qb, cd=cd)
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
            pl.BlockSpec((m // 128, 128), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((m, 8), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwq, 2 * cd), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qb, cfull), lambda ci, bi: (ci * nblk + bi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((m, 2 * cd), jnp.float32),
        ] + extra_scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        counts_sm,
        rows.reshape(-1, 128),
        winfo.reshape(n * nblk * m, 8),
        packed.reshape(n * hwq, 2 * cd),
    )
    return out.reshape(n, nblk * qb, cfull)


def _fwd_impl_pq(value_img, dpt_img, sampling_locations, attention_weights,
                 num_heads, counts=None):
    """Packed-quad forward; returns (out, primals) for mixed-VJP wiring."""
    n, k = sampling_locations.shape[:2]
    hp = sampling_locations.shape[2] * sampling_locations.shape[3]
    chunk = _pick_cam_chunk(n, k * hp)
    if chunk == n:
        out = _fwd_cams_pq(value_img, dpt_img, sampling_locations,
                           attention_weights, num_heads, counts=counts)
    else:
        groups = n // chunk

        def body(args):
            return _fwd_cams_pq(*args[:4], num_heads,
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


def _fwd_cams_pq(value_img, dpt_img, sampling_locations, attention_weights,
                 num_heads, counts=None):
    n, h, w, cfull = value_img.shape
    d_size = dpt_img.shape[-1]
    k = sampling_locations.shape[1]
    p = sampling_locations.shape[3]
    heads = num_heads
    c = cfull // heads
    cd = cfull + d_size
    qb = _pick_qb(k, heads, p)

    packed = _build_quad_packed(value_img, dpt_img)
    rows2, winfo, _, kpad = _sample_quantities(
        sampling_locations, attention_weights, h, w, d_size, qb
    )
    rows = _quad_rows(rows2, h, w)
    out = _run_fwd_pq(packed, rows, winfo, heads, c, p, qb, cd,
                      _counts_smem(counts, n, heads, kpad))
    return out[:, :k].astype(value_img.dtype)


def dfa3d_attention_pallas_pq(value_img, dpt_img, sampling_locations,
                              attention_weights, num_heads):
    """Packed-quad forward as a plain function (no VJP) — benching/tests.
    Production wiring pairs ``_fwd_impl_pq`` with the v1/v2 backward in
    ``ops.dfa3d``."""
    out, _ = _fwd_impl_pq(value_img, dpt_img, sampling_locations,
                          attention_weights, num_heads)
    return out
