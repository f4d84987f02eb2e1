"""Windowed-matmul DFA3D Pallas kernel: MXU one-hot gathers.

Same semantics as ``dfa3d_pallas`` (the jnp oracle ``msda.dfa3d_attention``
is the spec; reference CUDA kernels:
/root/reference/packages/3D-deformable-attention/DFA3D/dfa3D/ops/csrc/common/
cuda/wms_deform_attn_cuda_kernel.cuh:24-159).  The copy-loop gather moves
one row per issue slot (~63M rows/s at the ScanNet L2 stage-2 shape); this
kernel instead gathers a whole chunk of ``cm`` samples with ONE MXU op

    rows = S @ img[base : base + wwin]          # S (cm, wwin) one-hot bf16

whenever the chunk's quad-row ids fit inside a ``wwin``-row window (their
min, 8-aligned).  Sampling locations of spatially-sorted queries are nearly
monotone in the quad-row id, so most chunks qualify; the remainder falls
back to the copy loop per chunk (exactness is unconditional).  The one-hot
dot is exact: the window operand is the bf16 quad image (bf16 inputs only —
the production compute dtype), S's nonzeros are 1.0, and the f32
accumulator reproduces each bf16 row exactly.

The per-chunk dot result never hits scratch: the corner/depth epilogue is
fused per chunk and only the (cm, cfull) contribution rows are stored.  The
fallback branch gathers the packed bf16-pair rows (``dfa3d_pallas3``
layout, one half-width copy per sample) and unpacks — bit-identical values.

Backward: same chunk structure; the scatter-add becomes
``dimg[window] += S.T @ U`` (f32 one-hot dot, HIGHEST precision — exact for
selection; accumulation order differs from the copy loop only across
chunks).  Location/attention grads chain outside the kernel exactly as in
``dfa3d_pallas``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgcdet_tpu.ops.dfa3d_pallas import (
    _build_dvec,
    _pick_cam_chunk,
    _pick_qb,
    _sample_quantities,
)
from sgcdet_tpu.ops.dfa3d_pallas3 import (
    _build_quad_packed,
    _corner_contribs_pq,
    _corner_contribs_q,
    _quad_rows,
)

_WWIN = 512  # window rows per chunk (multiple of 8)
_CM = 256    # samples per chunk (multiple of 128)


# ---------------------------------------------------------------------------
# host-side prep (plain XLA, fused into the surrounding jit)
# ---------------------------------------------------------------------------


def _build_quad_bf16(value_img, dpt_img):
    """(N, H, W, C) + (N, H, W, D) -> (N, (H+1)*(W+1)~8, 4*(C+D)) bf16 quad
    rows, corner-major [vA|vB|vC|vD|dA|dB|dC|dD] (dfa3d_pallas3 order)."""
    n, h, w, _ = value_img.shape

    def pads(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        return (xp[:, :h + 1, :w + 1], xp[:, :h + 1, 1:],
                xp[:, 1:, :w + 1], xp[:, 1:, 1:])

    v = pads(value_img.astype(jnp.bfloat16))
    d = pads(dpt_img.astype(jnp.bfloat16))
    quad = jnp.concatenate(v + d, axis=-1)
    hwq = (h + 1) * (w + 1)
    quad = quad.reshape(n, hwq, quad.shape[-1])
    hwq_pad = -(-hwq // 8) * 8
    if hwq_pad != hwq:
        quad = jnp.pad(quad, ((0, 0), (0, hwq_pad - hwq), (0, 0)))
    return quad


def _chunk_meta(rows, hwq, wwin, cm):
    """Per-chunk window base / in-window flag / relative rows.

    rows (N, nblk, M) int32 -> meta (N*nblk, M//cm, 2) int32 [base, ok],
    rel (N*nblk, M, 1) int32.  base is 8-aligned and clipped so the window
    slice stays in range; ok==1 iff every row of the chunk is inside it.
    """
    n, nblk, m = rows.shape
    ch = rows.reshape(n * nblk, m // cm, cm)
    base = jnp.clip(jnp.min(ch, -1) & ~7, 0, max(hwq - wwin, 0))
    ok = ((jnp.max(ch, -1) - base) < wwin).astype(jnp.int32)
    rel = ch - base[..., None]
    meta = jnp.stack([base, ok], -1)
    return meta, rel.reshape(n * nblk, m, 1)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _gather_chunk_packed(rows_ref, pimg_ref, psc, ci, cm):
    """Copy-loop fallback: packed rows of chunk ci into psc (cm, 2cd)."""
    def outer(j, _):
        def inner(l, _):
            i = j * 128 + l * 8
            for t in range(8):
                psc[pl.ds(i + t, 1), :] = pimg_ref[
                    pl.ds(rows_ref[ci * (cm // 128) + j, l * 8 + t], 1), :]
            return 0

        jax.lax.fori_loop(0, 16, inner, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, cm // 128, outer, 0, unroll=False)


def _window_rows(meta_ref, rel_ref, img_ref, off, ci, cm, wwin):
    """One MXU one-hot gather: chunk ci's quad rows as (cm, lanes) f32."""
    base = meta_ref[0, ci, 0]
    rel = rel_ref[0, pl.ds(off, cm), :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (cm, wwin), 1)
    s = (iota == rel).astype(jnp.bfloat16)
    win = img_ref[pl.ds(pl.multiple_of(base, 8), wwin), :]
    return jnp.dot(s, win, preferred_element_type=jnp.float32), s


def _fwd_kernel_w(meta_ref, rows_ref, rel_ref, winfo_ref, img_ref, pimg_ref,
                  out_ref, contrib_sc, psc, rsel_sc, hmask_sc, *,
                  heads, c, p, qb, cd, wwin, cm):
    m = contrib_sc.shape[0]
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

    def body(ci, _):
        off = ci * cm
        winfo = winfo_ref[pl.ds(off, cm), :]
        dvec = _build_dvec(winfo, cm, d_size)

        @pl.when(meta_ref[0, ci, 1] == 1)
        def _():
            rowsm, _ = _window_rows(meta_ref, rel_ref, img_ref, off, ci, cm,
                                    wwin)
            contrib, _, _ = _corner_contribs_q(rowsm, winfo, dvec, cfull,
                                               d_size)
            contrib_sc[pl.ds(off, cm), :] = contrib

        @pl.when(meta_ref[0, ci, 1] == 0)
        def _():
            _gather_chunk_packed(rows_ref, pimg_ref, psc, ci, cm)
            contrib_sc[pl.ds(off, cm), :] = _corner_contribs_pq(
                psc[:], winfo, dvec, cfull, d_size)

        return 0

    jax.lax.fori_loop(0, m // cm, body, 0, unroll=False)
    out_ref[:] = jnp.dot(rsel_sc[:], contrib_sc[:] * hmask_sc[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


def _fwd_kernel_w_s1(meta_ref, rows_ref, rel_ref, winfo_ref, img_ref,
                     pimg_ref, out_ref, psc, *, cfull, cd, wwin, cm):
    m = out_ref.shape[0]
    d_size = cd - cfull

    def body(ci, _):
        off = ci * cm
        winfo = winfo_ref[pl.ds(off, cm), :]
        dvec = _build_dvec(winfo, cm, d_size)

        @pl.when(meta_ref[0, ci, 1] == 1)
        def _():
            rowsm, _ = _window_rows(meta_ref, rel_ref, img_ref, off, ci, cm,
                                    wwin)
            contrib, _, _ = _corner_contribs_q(rowsm, winfo, dvec, cfull,
                                               d_size)
            out_ref[pl.ds(off, cm), :] = contrib

        @pl.when(meta_ref[0, ci, 1] == 0)
        def _():
            _gather_chunk_packed(rows_ref, pimg_ref, psc, ci, cm)
            out_ref[pl.ds(off, cm), :] = _corner_contribs_pq(
                psc[:], winfo, dvec, cfull, d_size)

        return 0

    jax.lax.fori_loop(0, m // cm, body, 0, unroll=False)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _run_fwd_w(quad_b, packed, rows, meta, rel, winfo, heads, c, p, qb, cd,
               wwin, cm):
    n, nblk, m = rows.shape
    hwq = quad_b.shape[1]
    cfull = heads * c
    s1 = heads == 1 and p == 1
    nchunk = m // cm
    if s1:
        kernel = functools.partial(_fwd_kernel_w_s1, cfull=cfull, cd=cd,
                                   wwin=wwin, cm=cm)
        # kernel scratch order: (psc,)
        scratch = [pltpu.VMEM((cm, 2 * cd), jnp.float32)]
    else:
        kernel = functools.partial(_fwd_kernel_w, heads=heads, c=c, p=p,
                                   qb=qb, cd=cd, wwin=wwin, cm=cm)
        # kernel scratch order: (contrib_sc, psc, rsel_sc, hmask_sc)
        scratch = [
            pltpu.VMEM((m, cfull), jnp.float32),    # contribution rows
            pltpu.VMEM((cm, 2 * cd), jnp.float32),  # fallback packed rows
            pltpu.VMEM((qb, m), jnp.float32),       # rsel (persistent)
            pltpu.VMEM((m, cfull), jnp.float32),    # head mask (persistent)
        ]
    out = pl.pallas_call(
        kernel,
        grid=(n, nblk),
        out_shape=jax.ShapeDtypeStruct((n * nblk * qb, cfull), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, nchunk, 2), lambda ci, bi: (ci * nblk + bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((m // 128, 128), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, m, 1), lambda ci, bi: (ci * nblk + bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 8), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwq, 4 * cd), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwq, 2 * cd), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qb, cfull), lambda ci, bi: (ci * nblk + bi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        meta,
        rows.reshape(-1, 128),
        rel.reshape(n * nblk, m, 1),
        winfo.reshape(n * nblk * m, 8),
        quad_b.reshape(n * hwq, 4 * cd),
        packed.reshape(n * hwq, 2 * cd),
    )
    return out.reshape(n, nblk * qb, cfull)


# The rel VMEM operand wants block (1, m, 1); Mosaic requires the last two
# dims (m, 1) to divide (8, 128) or equal the array dims — m is a multiple
# of 8 and 1 equals the array dim, so this holds for every produced shape.


def _fwd_impl_w(value_img, dpt_img, sampling_locations, attention_weights,
                num_heads):
    """Windowed-matmul forward; returns (out, primals) for VJP wiring."""
    n, k = sampling_locations.shape[:2]
    hp = sampling_locations.shape[2] * sampling_locations.shape[3]
    chunk = _pick_cam_chunk(n, k * hp)
    if chunk == n:
        out = _fwd_cams_w(value_img, dpt_img, sampling_locations,
                          attention_weights, num_heads)
    else:
        groups = n // chunk

        def body(args):
            return _fwd_cams_w(*args, num_heads)

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


def _fwd_cams_w(value_img, dpt_img, sampling_locations, attention_weights,
                num_heads):
    n, h, w, cfull = value_img.shape
    d_size = dpt_img.shape[-1]
    k = sampling_locations.shape[1]
    p = sampling_locations.shape[3]
    heads = num_heads
    c = cfull // heads
    cd = cfull + d_size
    qb = _pick_qb(k, heads, p)

    quad_b = _build_quad_bf16(value_img, dpt_img)
    packed = _build_quad_packed(value_img, dpt_img)
    rows2, winfo, _, kpad = _sample_quantities(
        sampling_locations, attention_weights, h, w, d_size, qb
    )
    rows = _quad_rows(rows2, h, w)
    hwq = quad_b.shape[1]
    wwin = min(_WWIN, hwq)
    cm = _CM if (heads * qb * p) % _CM == 0 else 128
    meta, rel = _chunk_meta(rows, hwq, wwin, cm)
    out = _run_fwd_w(quad_b, packed, rows, meta, rel, winfo, heads, c, p, qb,
                     cd, wwin, cm)
    return out[:, :k].astype(value_img.dtype)


def dfa3d_attention_pallas_w(value_img, dpt_img, sampling_locations,
                             attention_weights, num_heads):
    """Windowed forward as a plain function (no VJP) — benching/tests.
    Production wiring pairs ``_fwd_impl_w`` with a backward in ``ops.dfa3d``.
    """
    out, _ = _fwd_impl_w(value_img, dpt_img, sampling_locations,
                         attention_weights, num_heads)
    return out


# ===========================================================================
# Per-head windowed kernel ("wh"): narrow 4*(c+D)-lane rows, bulk epilogue
# ===========================================================================
#
# The full-width variant above loses to the copy loop because the one-hot
# dot's FLOPs scale with row width x window size (measured ~31% MXU at
# (256, 512)x(512, 1072) -> 150 ms just for the dots at the ScanNet L2
# stage-2 shape).  The v2 per-(camera, head) quad layout cuts the row width
# 6x (176 lanes for c=32, D=12), and reusing v2's point-major block order
# keeps chunks query-consecutive (coherent after the model's row-sort).
# Structure per (cam*head, block): chunk loop fills a (P*qb, width) scratch
# (windowed dot per chunk; packed copy-loop fallback for oversized chunks),
# then v2's bulk epilogue runs unchanged.  The backward mirrors it and
# replaces the scatter loop with dimg[window] += S^T @ U per chunk.

from sgcdet_tpu.ops.dfa3d_pallas2 import (  # noqa: E402  (grouped with their use site)
    _bwd_cams_v2,
    _build_quad_image as _build_quad_image_v2,
    _fwd_cams_v2,
    _point_contrib,
)
from sgcdet_tpu.ops.dfa3d_pallas3 import _pack2, _unpack_hi, _unpack_lo  # noqa: E402


def _build_quad_bf16_heads(value_img, dpt_img, heads):
    """(N, H, W, heads*c) + (N, H, W, D) -> (N*heads, Rq, 4*(c+D)) bf16."""
    return _build_quad_image_v2(
        value_img, dpt_img, heads).astype(jnp.bfloat16)


def _build_quad_packed_heads_exact(value_img, dpt_img, heads):
    """Fallback copy-loop operand: the per-head quad row bf16-packed into
    half as many f32 words — word i packs quad lane i (hi16) with quad lane
    i + width/2 (lo16), so unpack-hi/lo + concat restores the exact quad
    lane order ([vA|vB|vC|vD|dA|dB|dC|dD]) with the same bf16 values the
    windowed dot reads."""
    quad = _build_quad_image_v2(value_img, dpt_img, heads)
    half = quad.shape[-1] // 2
    return _pack2(quad[..., :half], quad[..., half:])


def _unpack_quad_exact(pk):
    return jnp.concatenate([_unpack_hi(pk), _unpack_lo(pk)], axis=1)


def _gather_chunk_rows(rows_ref, img_ref, psc, ci, cm):
    """Copy-loop fallback over one chunk: row ci*cm+i -> psc[i]."""
    seg = cm // 128

    def outer(j, _):
        def inner(l, _):
            i = j * 128 + l * 8
            for t in range(8):
                psc[pl.ds(i + t, 1), :] = img_ref[
                    pl.ds(rows_ref[ci * seg + j, l * 8 + t], 1), :]
            return 0

        jax.lax.fori_loop(0, 16, inner, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, seg, outer, 0, unroll=False)


def _fill_rows_wh(meta_ref, rows_ref, rel_ref, img_ref, pimg_ref, sc, psc,
                  nchunk, cm, wwin):
    """Fill sc (m, width) with the gathered quad rows of every chunk."""
    def body(ci, _):
        off = ci * cm

        @pl.when(meta_ref[0, ci, 1] == 1)
        def _():
            rowsm, _ = _window_rows(meta_ref, rel_ref, img_ref, off, ci, cm,
                                    wwin)
            sc[pl.ds(off, cm), :] = rowsm

        @pl.when(meta_ref[0, ci, 1] == 0)
        def _():
            _gather_chunk_rows(rows_ref, pimg_ref, psc, ci, cm)
            sc[pl.ds(off, cm), :] = _unpack_quad_exact(psc[:])

        return 0

    jax.lax.fori_loop(0, nchunk, body, 0, unroll=False)


def _fwd_kernel_wh(meta_ref, rows_ref, rel_ref, winfo_ref, img_ref, pimg_ref,
                   out_ref, sc, psc, *, c, p, qb, d_size, wwin, cm):
    m = p * qb
    _fill_rows_wh(meta_ref, rows_ref, rel_ref, img_ref, pimg_ref, sc, psc,
                  m // cm, cm, wwin)
    acc = None
    for j in range(p):
        winfo = winfo_ref[j * qb:(j + 1) * qb, :]
        contrib, _, _, _ = _point_contrib(sc[j * qb:(j + 1) * qb, :], winfo,
                                          c, d_size, qb)
        acc = contrib if acc is None else acc + contrib
    out_ref[:] = acc


def _bwd_kernel_wh(meta_ref, rows_ref, rel_ref, winfo_ref, g_ref, img_ref,
                   pimg_ref, dimg_ref, dw4_ref, ddvec_ref, sc, usc, psc, *,
                   c, p, qb, d_size, wwin, cm):
    m = p * qb

    @pl.when(pl.program_id(1) == 0)
    def _():
        dimg_ref[:] = jnp.zeros_like(dimg_ref)

    _fill_rows_wh(meta_ref, rows_ref, rel_ref, img_ref, pimg_ref, sc, psc,
                  m // cm, cm, wwin)
    g = g_ref[:]  # (qb, c)
    for j in range(p):
        s = sc[j * qb:(j + 1) * qb, :]
        winfo = winfo_ref[j * qb:(j + 1) * qb, :]
        _, dvec, ds_list, vals = _point_contrib(s, winfo, c, d_size, qb)
        t_list = [jnp.sum(v * g, axis=1, keepdims=True) for v in vals]
        dw4_ref[j * qb:(j + 1) * qb, :] = jnp.concatenate(
            [ds_list[i] * t_list[i] for i in range(4)], axis=1
        )
        ddvec = None
        for i in range(4):
            dj = s[:, 4 * c + i * d_size: 4 * c + (i + 1) * d_size]
            term = (winfo[:, i:i + 1] * t_list[i]) * dj
            ddvec = term if ddvec is None else ddvec + term
        ddvec_ref[j * qb:(j + 1) * qb, :] = ddvec
        usc[pl.ds(j * qb, qb), :] = jnp.concatenate(
            [(winfo[:, i:i + 1] * ds_list[i]) * g for i in range(4)]
            + [(winfo[:, i:i + 1] * t_list[i]) * dvec for i in range(4)],
            axis=1,
        )

    def body(ci, _):
        off = ci * cm

        @pl.when(meta_ref[0, ci, 1] == 1)
        def _():
            base = meta_ref[0, ci, 0]
            rel = rel_ref[0, pl.ds(off, cm), :]
            iota = jax.lax.broadcasted_iota(jnp.int32, (cm, wwin), 1)
            st = (iota == rel).astype(jnp.float32)
            win = pl.ds(pl.multiple_of(base, 8), wwin)
            dimg_ref[win, :] += jnp.dot(
                st.T, usc[pl.ds(off, cm), :],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

        @pl.when(meta_ref[0, ci, 1] == 0)
        def _():
            _scatter_chunk_rows_off(rows_ref, dimg_ref, usc, ci, cm)

        return 0

    jax.lax.fori_loop(0, m // cm, body, 0, unroll=False)


def _scatter_chunk_rows_off(rows_ref, dimg_ref, usc, ci, cm):
    """Copy-loop fallback scatter: usc row ci*cm+i += into dimg row."""
    seg = cm // 128

    def outer(j, _):
        def inner(l, _):
            i = ci * cm + j * 128 + l * 8
            for t in range(8):
                dimg_ref[pl.ds(rows_ref[ci * seg + j, l * 8 + t], 1), :] += \
                    usc[pl.ds(i + t, 1), :]
            return 0

        jax.lax.fori_loop(0, 16, inner, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, seg, outer, 0, unroll=False)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _wh_geometry(h, w, qb, p):
    hwq = -(-((h + 1) * (w + 1)) // 8) * 8
    wwin = min(_WWIN, hwq)
    m = p * qb
    cm = _CM if m % _CM == 0 else 128
    return hwq, wwin, m, cm


def _run_fwd_wh(value_img, dpt_img, heads, rows, winfo, c, p, qb, d_size,
                h, w):
    nh, nblk, m = rows.shape
    width = 4 * (c + d_size)
    hwq, wwin, m_, cm = _wh_geometry(h, w, qb, p)
    assert m_ == m
    quad_b = _build_quad_bf16_heads(value_img, dpt_img, heads)
    packed = _build_quad_packed_heads_exact(value_img, dpt_img, heads)
    meta, rel = _chunk_meta(rows, hwq, wwin, cm)
    nchunk = m // cm
    return pl.pallas_call(
        functools.partial(_fwd_kernel_wh, c=c, p=p, qb=qb, d_size=d_size,
                          wwin=wwin, cm=cm),
        grid=(nh, nblk),
        out_shape=jax.ShapeDtypeStruct((nh * nblk * qb, c), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, nchunk, 2), lambda ci, bi: (ci * nblk + bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((m // 128, 128), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, m, 1), lambda ci, bi: (ci * nblk + bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 8), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwq, width), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwq, width // 2), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qb, c), lambda ci, bi: (ci * nblk + bi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((m, width), jnp.float32),        # gathered rows
            pltpu.VMEM((cm, width // 2), jnp.float32),  # fallback packed
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=118 * 1024 * 1024,
        ),
    )(
        meta,
        rows.reshape(-1, 128),
        rel,
        winfo.reshape(nh * nblk * m, 8),
        quad_b.reshape(nh * hwq, width),
        packed.reshape(nh * hwq, width // 2),
    )


def _run_bwd_wh(value_img, dpt_img, heads, rows, winfo, g_flat, c, p, qb,
                d_size, h, w):
    nh, nblk, m = rows.shape
    width = 4 * (c + d_size)
    hwq, wwin, m_, cm = _wh_geometry(h, w, qb, p)
    assert m_ == m
    quad_b = _build_quad_bf16_heads(value_img, dpt_img, heads)
    packed = _build_quad_packed_heads_exact(value_img, dpt_img, heads)
    meta, rel = _chunk_meta(rows, hwq, wwin, cm)
    nchunk = m // cm
    dquad, dw4, ddvec = pl.pallas_call(
        functools.partial(_bwd_kernel_wh, c=c, p=p, qb=qb, d_size=d_size,
                          wwin=wwin, cm=cm),
        grid=(nh, nblk),
        out_shape=(
            jax.ShapeDtypeStruct((nh * hwq, width), jnp.float32),
            jax.ShapeDtypeStruct((nh * nblk * m, 4), jnp.float32),
            jax.ShapeDtypeStruct((nh * nblk * m, d_size), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((1, nchunk, 2), lambda ci, bi: (ci * nblk + bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((m // 128, 128), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, m, 1), lambda ci, bi: (ci * nblk + bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 8), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, c), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwq, width), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwq, width // 2), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((hwq, width), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 4), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, d_size), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((m, width), jnp.float32),        # gathered rows
            pltpu.VMEM((m, width), jnp.float32),        # update rows
            pltpu.VMEM((cm, width // 2), jnp.float32),  # fallback packed
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(
        meta,
        rows.reshape(-1, 128),
        rel,
        winfo.reshape(nh * nblk * m, 8),
        g_flat,
        quad_b.reshape(nh * hwq, width),
        packed.reshape(nh * hwq, width // 2),
    )
    return dquad.reshape(nh, hwq, width), dw4, ddvec


# ---------------------------------------------------------------------------
# public op with custom VJP (multi-head path; heads*P > 1, bf16 inputs)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def dfa3d_attention_pallas_wh(value_img, dpt_img, sampling_locations,
                              attention_weights, num_heads):
    """Fused depth-weighted deformable attention, per-head windowed-matmul
    kernel.  Exact for bf16 value/depth inputs (the production compute
    dtype); shapes as ``dfa3d_attention_pallas_v2``."""
    out, _ = _fwd_impl_wh(value_img, dpt_img, sampling_locations,
                          attention_weights, num_heads)
    return out


def _fwd_impl_wh(value_img, dpt_img, sampling_locations, attention_weights,
                 num_heads):
    n, k = sampling_locations.shape[:2]
    hp = sampling_locations.shape[2] * sampling_locations.shape[3]
    chunk = _pick_cam_chunk(n, k * hp)
    if chunk == n:
        out = _fwd_cams_v2(value_img, dpt_img, sampling_locations,
                           attention_weights, num_heads, runner=_run_fwd_wh)
    else:
        groups = n // chunk

        def body(args):
            return _fwd_cams_v2(*args, num_heads, runner=_run_fwd_wh)

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


def _vjp_fwd_wh(value_img, dpt_img, sampling_locations, attention_weights,
                num_heads):
    return _fwd_impl_wh(value_img, dpt_img, sampling_locations,
                        attention_weights, num_heads)


def _vjp_bwd_wh(num_heads, res, g):
    value_img, dpt_img, sampling_locations, attention_weights = res
    n, k = sampling_locations.shape[:2]
    hp = sampling_locations.shape[2] * sampling_locations.shape[3]
    chunk = _pick_cam_chunk(n, k * hp)
    if chunk == n:
        return _bwd_cams_v2(value_img, dpt_img, sampling_locations,
                            attention_weights, g, num_heads,
                            runner=_run_bwd_wh)
    groups = n // chunk

    def body(args):
        return _bwd_cams_v2(*args[:4], args[4], num_heads, runner=_run_bwd_wh)

    grads = jax.lax.map(
        body,
        tuple(
            x.reshape((groups, chunk) + x.shape[1:])
            for x in (value_img, dpt_img, sampling_locations,
                      attention_weights, g)
        ),
    )
    return tuple(x.reshape((n,) + x.shape[2:]) for x in grads)


dfa3d_attention_pallas_wh.defvjp(_vjp_fwd_wh, _vjp_bwd_wh)
