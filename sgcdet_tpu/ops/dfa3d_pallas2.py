"""Fused DFA3D sampling, v2 Pallas kernel: per-head quad-corner rows.

Drop-in faster replacement for the multi-head path of ``dfa3d_pallas.py``
(same math, same oracle: ``msda.dfa3d_attention``; reference CUDA semantics
in /root/reference/packages/3D-deformable-attention/DFA3D/dfa3D/ops/csrc/
common/cuda/wms_deform_attn_cuda_kernel.cuh:24-159).

What changed vs v1 and why (all rates measured on v5e, see
experiments/gather_probe6.py):

* v1 rows hold ALL heads' channels side by side (536 lanes for C=256, D=12),
  so every (query, head, point) sample gathers 8x the channels it needs, and
  needs TWO row gathers (y0/y1 pair rows).  v2 stores, per (camera, head), a
  **quad-corner image**: row (y', x') = the four bilinear corners A,B,C,D of
  the footprint whose top-left pixel is (y'-1, x'-1), i.e.
  ``[vA|vB|vC|vD|dA|dB|dC|dD]`` with c value lanes per corner and D depth
  lanes per corner.  One sample = ONE gather of 4*(c+D) lanes (176 for the
  released configs).
* v1 reduced (head, query, point) sample rows onto queries with an MXU
  selection matmul (f32 HIGHEST — ~18 ms at the finest ScanNet level) plus a
  head-mask multiply.  v2 orders samples point-major within the block and
  accumulates the P per-point contributions with plain VPU adds — no matmul,
  no head mask — because a block is (camera, head)-homogeneous.
* Grid is (num_cams * heads, query_blocks): the per-(cam, head) quad image is
  DMA'd once and revisited across query blocks; blocks are sized large
  (qb*P ~ 25k samples) to amortize the ~15 us/grid-step pipeline overhead
  that dominated v1's 2000-step grid.

The backward re-gathers the same rows, computes per-corner gradients
vectorized, and scatter-adds one 4-corner update row per sample into a
quad-layout gradient image that is un-quadded outside the kernel (each pixel
sums its four corner slots from the four neighboring quad rows).  Location /
attention-weight gradients chain through plain XLA outside, identical to v1.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dfa3d_pallas import _counts_smem, _pick_cam_chunk, _round_up
from .dfa3d_pallas3 import _pack2, _unpack_hi, _unpack_lo


# ---------------------------------------------------------------------------
# host-side prep (plain XLA, fused into the surrounding jit)
# ---------------------------------------------------------------------------


def _build_quad_image(value_img, dpt_img, heads):
    """(N, H, W, heads*c) + (N, H, W, D) -> (N*heads, Rq, 4*(c+D)).

    Row (y', x'), y' in 0..H, x' in 0..W, holds corners
    A=(y'-1, x'-1), B=(y'-1, x'), C=(y', x'-1), D=(y', x') (edge-duplicated
    out of range; those slots are only ever read/written with zero weight).
    Rq = (H+1)*(W+1) padded up to a multiple of 8.  bf16 inputs build a bf16
    quad (lossless — the f32 quad of a bf16 image carries the same values;
    the kernels cast gathered rows to f32 in-register): HALF the build
    traffic and gather bytes of f32.
    """
    n, h, w, cfull = value_img.shape
    c = cfull // heads
    d = dpt_img.shape[-1]
    packed = (value_img.dtype == jnp.bfloat16
              and dpt_img.dtype == jnp.bfloat16)
    v = value_img.astype(jnp.float32).reshape(n, h, w, heads, c)
    v = jnp.moveaxis(v, 3, 1)  # (N, heads, H, W, c)
    vp = jnp.pad(v, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    vA = vp[:, :, : h + 1, : w + 1]      # A = (y'-1, x'-1)
    vB = vp[:, :, : h + 1, 1: w + 2]     # B = (y'-1, x')
    vC = vp[:, :, 1: h + 2, : w + 1]     # C = (y', x'-1)
    vD = vp[:, :, 1: h + 2, 1: w + 2]    # D = (y', x')
    dp = dpt_img.astype(jnp.float32)
    dpp = jnp.pad(dp, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    dA = dpp[:, : h + 1, : w + 1]
    dB = dpp[:, : h + 1, 1: w + 2]
    dC = dpp[:, 1: h + 2, : w + 1]
    dD = dpp[:, 1: h + 2, 1: w + 2]
    if packed:
        # bf16 corner pairs packed into f32 words (lossless for bf16
        # inputs; HALF the build traffic and gather lanes): layout
        # [AB_v | CD_v | AB_d | CD_d], hi16 = first corner
        bh = lambda x: jnp.broadcast_to(
            x[:, None], (n, heads) + x.shape[1:])
        quad = jnp.concatenate(
            [_pack2(vA, vB), _pack2(vC, vD),
             bh(_pack2(dA, dB)), bh(_pack2(dC, dD))], axis=-1)
        wq = 2 * (c + d)
    else:
        quad_d = jnp.concatenate([dA, dB, dC, dD], axis=-1)
        quad = jnp.concatenate(
            [vA, vB, vC, vD,
             jnp.broadcast_to(quad_d[:, None],
                              (n, heads) + quad_d.shape[1:])], axis=-1)
        wq = 4 * (c + d)
    rq = (h + 1) * (w + 1)
    quad = quad.reshape(n * heads, rq, wq)
    rq_pad = _round_up(rq, 8)
    if rq_pad != rq:
        quad = jnp.pad(quad, ((0, 0), (0, rq_pad - rq), (0, 0)))
    return quad


def _sample_quantities_v2(locs, attn, h, w, d_size, qb):
    """Quad-row indices + packed weights, point-major block order.

    locs: (N, K, heads, P, 3) normalized; attn: (N, K, heads, P).
    Returns rows (N*heads, nblk, P*qb) int32, winfo (N*heads, nblk, P*qb, 8)
    f32 = [w4 | wd0 | wd1 | d0c | d1c], residuals for the outer VJP chain,
    and kpad.  Sample (head, blk, point, query) maps to flat position
    ((head*nblk + blk)*P + point)*qb + query.
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

    # quad row (y', x') = (y0+1, x0+1), clipped into the (H+1)x(W+1) grid
    yq = jnp.clip(y0 + 1, 0, h)
    xq = jnp.clip(x0 + 1, 0, w)
    rows = yq * (w + 1) + xq  # (N, heads, Kpad, P)

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

    def blockify(x, lanes):
        # (N, heads, Kpad, P[, lanes]) -> (N*heads, nblk, P*qb[, lanes])
        shp = (n, heads, nblk, qb) + x.shape[3:]
        x = x.reshape(shp)
        x = jnp.moveaxis(x, 4, 3)  # (N, heads, nblk, P, qb, ...)
        return x.reshape((n * heads, nblk, p * qb) + ((lanes,) if lanes else ()))

    rows_b = blockify(rows, None)
    winfo_b = blockify(winfo, 8)
    resid = (wb, attn, lx, ly, ld, vd0, vd1, d0c, d1c, vx0, vx1, vy0, vy1)
    return rows_b, winfo_b, resid, kpad


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _gather_loop_v2(rows_ref, img_ref, scs, qb, seg_act=None):
    """Per point, 8 consecutive samples' rows accumulated in registers and
    written as ONE sublane-aligned (8, width) store — the copies are vector
    load/store pairs sharing VPU issue slots, so batching the store side is
    a measured 1.8x over per-row stores (5.3 vs 9.5 ns/copy standalone,
    experiments/probe_gather_batch.py, v5e 2026-08-19).  rows_ref segments:
    point j occupies sublane rows [j*qb/128, (j+1)*qb/128).

    seg_act (dynamic scalar, optional): only the first seg_act 128-query
    groups are gathered — the partial-block clamp for counted blocks.
    Scratch rows beyond them keep STALE contents; callers must mask the
    epilogue past the count (jnp.where, so even NaN bit patterns from
    uninitialized VMEM cannot leak)."""
    p = len(scs)
    seg = qb // 128

    def outer(j, _):
        def inner(l, _):
            i = pl.multiple_of(j * 128 + l * 8, 8)
            for pt in range(p):
                rows = [
                    img_ref[pl.ds(rows_ref[pt * seg + j, l * 8 + t], 1), :]
                    for t in range(8)
                ]
                scs[pt][pl.ds(i, 8), :] = jnp.concatenate(rows, axis=0)
            return 0

        jax.lax.fori_loop(0, 16, inner, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, seg if seg_act is None else seg_act, outer, 0,
                      unroll=False)


def _dvec(winfo, rows, d_size):
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, d_size), 1).astype(jnp.float32)
    return (
        jnp.where(iota == winfo[:, 6:7], winfo[:, 4:5], 0.0)
        + jnp.where(iota == winfo[:, 7:8], winfo[:, 5:6], 0.0)
    )


def _corner_vd(s, j, c, d_size, packed):
    """Corner j's (value (m, c), depth (m, d)) slices from a gathered row:
    plain f32 layout [vA|vB|vC|vD|dA|dB|dC|dD] or bf16-packed
    [AB_v|CD_v|AB_d|CD_d] (hi16 = first corner of each pair)."""
    if packed:
        un = _unpack_hi if j % 2 == 0 else _unpack_lo
        vj = un(s[:, (j // 2) * c:(j // 2 + 1) * c])
        dj = un(s[:, 2 * c + (j // 2) * d_size:2 * c + (j // 2 + 1) * d_size])
        return vj, dj
    vj = s[:, j * c:(j + 1) * c]
    dj = s[:, 4 * c + j * d_size: 4 * c + (j + 1) * d_size]
    return vj, dj


def _point_contrib(s, winfo, c, d_size, qb, packed=False):
    """One point's contribution (qb, c) + (per-corner ds, vals) for the bwd."""
    dvec = _dvec(winfo, qb, d_size)
    contrib = None
    ds_list = []
    vals = []
    for j in range(4):
        vj, dj = _corner_vd(s, j, c, d_size, packed)
        dsj = jnp.sum(dj * dvec, axis=1, keepdims=True)
        term = (winfo[:, j:j + 1] * dsj) * vj
        contrib = term if contrib is None else contrib + term
        ds_list.append(dsj)
        vals.append(vj)
    return contrib, dvec, ds_list, vals


def _fwd_kernel_v2(counts_ref, rows_hbm, winfo_ref, img_ref, out_ref,
                   *scratch, c, p, qb, d_size, heads, nblk, packed=False):
    # data-dependent block skip: the budget compaction packs each camera's
    # visible queries FIRST, so a whole query block past the camera's actual
    # visible count contributes nothing downstream (its outputs are masked
    # by the inter-view fusion) — skip its gathers entirely and write zeros.
    # This is the TPU-native analog of the reference's dynamic rebatching
    # (deformable_cross_attention.py:759-783): static padded shapes, compute
    # scaling with the ACTUAL per-camera visibility.
    #
    # Narrow-operand layout (round-5 find, docs/roadmap.md): window DMAs pay
    # a per-ROW descriptor tax, so a (m, 8) winfo window streams at ~32 B/row
    # rate (~11 ms/call at the ScanNet L2 shape, invariant to qb) and the
    # (qb, c) out window ~3 ms — together most of the counted forward.
    # Fix: winfo arrives TRANSPOSED as an (8, m) window (wide rows, ~2.6 ms)
    # and is transposed back per point in-register (tpu transpose,
    # ~0.13 us/step); out is written transposed as (c, qb) the same way.
    # Row indices live in HBM (pl.ANY), DMA'd to SMEM only for ACTIVE blocks
    # (their natural SMEM window cost ~22 ms/call regardless of skip).
    scs = scratch[:p]
    rows_sm, sem = scratch[p], scratch[p + 1]
    cam = pl.program_id(0) // heads
    rem = counts_ref[0, cam] - pl.program_id(1) * qb
    active = rem > 0

    @pl.when(active)
    def _():
        gseg = rows_sm.shape[0]  # m // 128
        blk = pl.program_id(0) * nblk + pl.program_id(1)
        cp_r = pltpu.make_async_copy(
            rows_hbm.at[pl.ds(blk * gseg, gseg), :], rows_sm, sem)
        cp_r.start()
        cp_r.wait()
        # partial-block clamp: gather only ceil(rem/128) query groups; rows
        # past them are computed from stale scratch and MASKED below
        seg_act = jnp.minimum(qb // 128, (rem + 127) // 128)
        _gather_loop_v2(rows_sm, img_ref, scs, qb, seg_act)
        acc = None
        for j in range(p):
            winfo = jnp.transpose(winfo_ref[:, j * qb:(j + 1) * qb])
            contrib, _, _, _ = _point_contrib(scs[j][:], winfo, c, d_size,
                                              qb, packed)
            acc = contrib if acc is None else acc + contrib
        rowmask = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0) < rem
        out_ref[:] = jnp.transpose(jnp.where(rowmask, acc, 0.0))

    @pl.when(jnp.logical_not(active))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


def _bwd_kernel_v2(counts_ref, rows_hbm, winfo_ref, g_ref, img_ref, dimg_ref,
                   dw4_ref, ddvec_ref, *scratch, c, p, qb, d_size, heads,
                   nblk, packed=False):
    # Narrow operands ride TRANSPOSED windows (winfo (8, m), g (c, qb)) and
    # are transposed back in-register; the narrow grad outputs are written
    # transposed the same way (dw4 (4p, qb), ddvec (d_size*p, qb)) — see
    # _fwd_kernel_v2.  Rows stay in HBM with an active-only SMEM DMA.
    scs, us = scratch[:p], scratch[p:2 * p]
    rows_sm, sem = scratch[2 * p], scratch[2 * p + 1]

    @pl.when(pl.program_id(1) == 0)
    def _():
        dimg_ref[:] = jnp.zeros_like(dimg_ref)

    # skipped blocks: visible-first packing + masked fusion means the
    # incoming grad g is exactly zero there, so every product below — and
    # the dimg scatter-adds — would be zero anyway (see _fwd_kernel_v2)
    cam = pl.program_id(0) // heads
    rem = counts_ref[0, cam] - pl.program_id(1) * qb
    active = rem > 0

    @pl.when(jnp.logical_not(active))
    def _():
        dw4_ref[:] = jnp.zeros_like(dw4_ref)
        ddvec_ref[:] = jnp.zeros_like(ddvec_ref)

    @pl.when(active)
    def _():
        gseg = rows_sm.shape[0]  # m // 128
        blk = pl.program_id(0) * nblk + pl.program_id(1)
        cp_r = pltpu.make_async_copy(
            rows_hbm.at[pl.ds(blk * gseg, gseg), :], rows_sm, sem)
        cp_r.start()
        cp_r.wait()
        seg = qb // 128
        # partial-block clamp: gather/scatter only ceil(rem/128) query
        # groups; rows past rem use stale scratch and are masked with
        # jnp.where (NOT a multiply — NaN bit patterns from uninitialized
        # VMEM must not leak)
        seg_act = jnp.minimum(seg, (rem + 127) // 128)
        _gather_loop_v2(rows_sm, img_ref, scs, qb, seg_act)
        g = jnp.transpose(g_ref[:])  # (qb, c)
        rowmask = jax.lax.broadcasted_iota(jnp.int32, (qb, 1), 0) < rem
        dpad = _round_up(d_size, 8)  # 8-sublane-aligned per-point regions
        for j in range(p):
            s = scs[j][:]
            winfo = jnp.transpose(winfo_ref[:, j * qb:(j + 1) * qb])
            _, dvec, ds_list, vals = _point_contrib(s, winfo, c, d_size, qb,
                                                    packed)
            t_list = [jnp.sum(v * g, axis=1, keepdims=True) for v in vals]
            dw4v = jnp.where(
                rowmask,
                jnp.concatenate(
                    [ds_list[i] * t_list[i] for i in range(4)], axis=1),
                0.0,
            )
            dw4_ref[j * 8:(j + 1) * 8, :] = jnp.transpose(
                jnp.pad(dw4v, ((0, 0), (0, 4))))
            ddvec = None
            for i in range(4):
                dj = _corner_vd(s, i, c, d_size, packed)[1]
                term = (winfo[:, i:i + 1] * t_list[i]) * dj
                ddvec = term if ddvec is None else ddvec + term
            ddvec_ref[j * dpad:(j + 1) * dpad, :] = jnp.transpose(
                jnp.pad(jnp.where(rowmask, ddvec, 0.0),
                        ((0, 0), (0, dpad - d_size))))
            us[j][:] = jnp.where(
                rowmask,
                jnp.concatenate(
                    [(winfo[:, i:i + 1] * ds_list[i]) * g for i in range(4)]
                    + [(winfo[:, i:i + 1] * t_list[i]) * dvec
                       for i in range(4)],
                    axis=1,
                ),
                0.0,
            )

        def outer(j, _):
            base = j * 128

            def inner(l, _):
                i = base + l * 2
                for t in range(2):
                    for pt in range(p):
                        dimg_ref[pl.ds(rows_sm[pt * seg + j, l * 2 + t], 1), :] += \
                            us[pt][pl.ds(i + t, 1), :]
                return 0

            jax.lax.fori_loop(0, 64, inner, 0, unroll=False)
            return 0

        jax.lax.fori_loop(0, seg_act, outer, 0, unroll=False)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _pick_qb_v2(k, p, target=12288, bwd=False, counted=False):
    """qb: query block size; P*qb samples per grid step.  qb % 128 == 0 (the
    gather loop walks full 128-lane SMEM groups per point segment) and
    p*qb % 1024 == 0 (the rows block is (p*qb/128, 128) SMEM whose sublane
    count must divide by 8).  `target` caps samples per grid step: large
    blocks amortize the ~15 us/grid-step pipeline overhead, but the p
    (qb, 4*(c+D)) f32 scratch buffers + double-buffered operands must fit
    the ~128 MB of VMEM.  Picks the candidate minimizing padded samples
    first (padding is pure wasted gather work — the old prefer-divisors
    rule left ScanNet's K=6400 at qb=3072 with kpad=9216, 44% padding),
    then the largest block among ties."""
    step = 128
    while (p * step) % 1024 != 0:
        step += 128
    budget = target // 2 if bwd else target
    if counted:
        # with per-camera count skipping, smaller blocks skip FINER and
        # skipped grid steps are cheap (measured: qb 768 beats 2304 by
        # 1.20x fwd / 1.23x bwd at the ScanNet L2 budget shape with
        # realistic counts; 512/256 tie with 768 —
        # experiments/bench_counted_qb.py, v5e 2026-08-19)
        budget = min(budget, 768 * p)
    max_qb = max(step, (budget // p) // step * step)
    max_qb = min(max_qb, _round_up(k, step))
    best = None
    for cand in range(step, max_qb + 1, step):
        kpad = _round_up(k, cand)
        # small blocks pay ~15 us/grid-step: fold that in as an equivalent
        # sample cost (~1920 samples at the measured ~128 M rows/s)
        cost = kpad * p + (kpad // cand) * 1920
        if best is None or cost < best[0]:
            best = (cost, cand)
    return best[1]


def _run_fwd_v2(quad, rows, winfo, heads, c, p, qb, d_size, counts_sm):
    nh, nblk, m = rows.shape
    rq = quad.shape[1]
    win = quad.shape[2]  # 4*(c+D) f32 rows or 2*(c+D) bf16-packed words
    packed = win == 2 * (c + d_size)
    n_cams = counts_sm.shape[1]
    # winfo transposed to (8, m) wide-row windows; out comes back (c, qb)
    # per block (see _fwd_kernel_v2's narrow-operand note)
    winfo_t = jnp.swapaxes(winfo.reshape(nh * nblk, m, 8), 1, 2)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_v2, c=c, p=p, qb=qb, d_size=d_size,
                          heads=heads, nblk=nblk, packed=packed),
        grid=(nh, nblk),
        out_shape=jax.ShapeDtypeStruct((nh * nblk * c, qb), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, n_cams), lambda ci, bi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # rows stay in HBM
            pl.BlockSpec((8, m), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rq, win), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, qb), lambda ci, bi: (ci * nblk + bi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((qb, win), jnp.float32)
                        for _ in range(p)]
        + [pltpu.SMEM((m // 128, 128), jnp.int32),
           pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=118 * 1024 * 1024,
        ),
    )(
        counts_sm,
        rows.reshape(-1, 128),
        winfo_t.reshape(nh * nblk * 8, m),
        quad.reshape(nh * rq, win),
    )
    out = jnp.swapaxes(out.reshape(nh * nblk, c, qb), 1, 2)
    return out.reshape(nh * nblk * qb, c)


def _run_bwd_v2(quad, rows, winfo, g, heads, c, p, qb, d_size, counts_sm):
    nh, nblk, m = rows.shape
    rq = quad.shape[1]
    win = quad.shape[2]   # gather-row width (packed or plain)
    packed = win == 2 * (c + d_size)
    wout = 4 * (c + d_size)  # f32 dquad / update-row width
    dpad = _round_up(d_size, 8)
    n_cams = counts_sm.shape[1]
    # winfo/g transposed to wide-row windows; dw4/ddvec come back transposed
    # per (block, point) and are un-transposed here (XLA transposes run at
    # HBM speed) — see _fwd_kernel_v2's narrow-operand note
    winfo_t = jnp.swapaxes(winfo.reshape(nh * nblk, m, 8), 1, 2)
    g_t = jnp.swapaxes(g.reshape(nh * nblk, qb, c), 1, 2)
    dquad, dw4, ddvec = pl.pallas_call(
        functools.partial(_bwd_kernel_v2, c=c, p=p, qb=qb, d_size=d_size,
                          heads=heads, nblk=nblk, packed=packed),
        grid=(nh, nblk),
        out_shape=(
            jax.ShapeDtypeStruct((nh * rq, wout), jnp.float32),
            jax.ShapeDtypeStruct((nh * nblk * 8 * p, qb), jnp.float32),
            jax.ShapeDtypeStruct((nh * nblk * dpad * p, qb), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((1, n_cams), lambda ci, bi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # rows stay in HBM
            pl.BlockSpec((8, m), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, qb), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rq, win), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rq, wout), lambda ci, bi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * p, qb), lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dpad * p, qb),
                         lambda ci, bi: (ci * nblk + bi, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=(
            [pltpu.VMEM((qb, win), jnp.float32) for _ in range(p)]      # sc
            + [pltpu.VMEM((qb, wout), jnp.float32) for _ in range(p)]   # u
            + [pltpu.SMEM((m // 128, 128), jnp.int32),
               pltpu.SemaphoreType.DMA]
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(
        counts_sm,
        rows.reshape(-1, 128),
        winfo_t.reshape(nh * nblk * 8, m),
        g_t.reshape(nh * nblk * c, qb),
        quad.reshape(nh * rq, win),
    )
    # (blk, point, padded-lane, qb) -> sample-major (blk, point, qb, lane)
    dw4 = jnp.swapaxes(dw4.reshape(nh * nblk * p, 8, qb)[:, :4], 1, 2)
    ddvec = jnp.swapaxes(
        ddvec.reshape(nh * nblk * p, dpad, qb)[:, :d_size], 1, 2)
    return (dquad.reshape(nh, rq, wout),
            dw4.reshape(nh * nblk * m, 4),
            ddvec.reshape(nh * nblk * m, d_size))


# ---------------------------------------------------------------------------
# public op with custom VJP (multi-head path; heads*P > 1)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def dfa3d_attention_pallas_v2(value_img, dpt_img, sampling_locations,
                              attention_weights, num_heads):
    """Fused depth-weighted deformable attention, quad-corner-row kernel.

    Args:
      value_img: (N, H, W, heads*c) camera features.
      dpt_img: (N, H, W, D) depth distributions.
      sampling_locations: (N, K, heads, P, 3) normalized (u, v, d).
      attention_weights: (N, K, heads, P).
      num_heads: static head count.
    Returns (N, K, heads*c), dtype of value_img.
    """
    out, _ = _fwd_impl_v2(value_img, dpt_img, sampling_locations,
                          attention_weights, num_heads)
    return out


def _fwd_impl_v2(value_img, dpt_img, sampling_locations, attention_weights,
                 num_heads, counts=None):
    n, k = sampling_locations.shape[:2]
    hp = sampling_locations.shape[2] * sampling_locations.shape[3]
    chunk = _pick_cam_chunk(n, k * hp)
    if chunk == n:
        out = _fwd_cams_v2(value_img, dpt_img, sampling_locations,
                           attention_weights, num_heads, counts=counts)
    else:
        groups = n // chunk

        def body(args):
            return _fwd_cams_v2(*args[:4], num_heads,
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


def _fwd_cams_v2(value_img, dpt_img, sampling_locations, attention_weights,
                 num_heads, runner=None, pick_qb=None, counts=None):
    """runner(value_img, dpt_img, heads, rows, winfo, c, p, qb, d_size, h, w)
    -> (nh*nblk*qb, c) f32 replaces the default quad-build + _run_fwd_v2
    (used by the windowed kernels, dfa3d_pallas4/5); pick_qb(k, p) overrides
    the query-block sizing for runners with different constraints.
    counts: optional (N,) per-camera visible-query counts — blocks past a
    camera's count are skipped and return ZEROS (exact whenever downstream
    masks those queries, as the budget compaction's fusion does)."""
    n, h, w, cfull = value_img.shape
    d_size = dpt_img.shape[-1]
    k = sampling_locations.shape[1]
    p = sampling_locations.shape[3]
    heads = num_heads
    c = cfull // heads
    qb = (pick_qb or functools.partial(
        _pick_qb_v2, counted=counts is not None))(k, p)

    rows, winfo, _, kpad = _sample_quantities_v2(
        sampling_locations, attention_weights, h, w, d_size, qb
    )
    if runner is None:
        quad = _build_quad_image(value_img, dpt_img, heads)
        out = _run_fwd_v2(quad, rows, winfo, heads, c, p, qb, d_size,
                          _counts_smem(counts, n, heads, kpad))
    else:
        out = runner(value_img, dpt_img, heads, rows, winfo, c, p, qb,
                     d_size, h, w)
    out = out.reshape(n, heads, kpad, c)[:, :, :k]
    out = jnp.moveaxis(out, 1, 2).reshape(n, k, heads * c)
    return out.astype(value_img.dtype)


def _vjp_fwd_v2(value_img, dpt_img, sampling_locations, attention_weights,
                num_heads):
    return _fwd_impl_v2(value_img, dpt_img, sampling_locations,
                        attention_weights, num_heads)


def _bwd_impl_v2(value_img, dpt_img, sampling_locations, attention_weights,
                 g, num_heads, counts=None):
    n, k = sampling_locations.shape[:2]
    hp = sampling_locations.shape[2] * sampling_locations.shape[3]
    chunk = _pick_cam_chunk(n, k * hp, sample_budget=8 << 20)
    if chunk == n:
        return _bwd_cams_v2(value_img, dpt_img, sampling_locations,
                            attention_weights, g, num_heads, counts=counts)
    groups = n // chunk

    def body(args):
        return _bwd_cams_v2(*args[:4], args[4], num_heads,
                            counts=(args[5] if len(args) > 5 else None))

    xs = [value_img, dpt_img, sampling_locations, attention_weights, g]
    if counts is not None:
        xs.append(counts)
    grads = jax.lax.map(
        body,
        tuple(x.reshape((groups, chunk) + x.shape[1:]) for x in xs),
    )
    return tuple(x.reshape((n,) + x.shape[2:]) for x in grads)


def _vjp_bwd_v2(num_heads, res, g):
    value_img, dpt_img, sampling_locations, attention_weights = res
    return _bwd_impl_v2(value_img, dpt_img, sampling_locations,
                        attention_weights, g, num_heads)


def _bwd_cams_v2(value_img, dpt_img, sampling_locations, attention_weights, g,
                 num_heads, runner=None, pick_qb=None, direct_grads=False,
                 counts=None):
    """runner(value_img, dpt_img, heads, rows, winfo, g_flat, c, p, qb,
    d_size, h, w) -> (dquad (nh, rq, width), dw4_flat, ddvec_flat) replaces
    the default quad-build + _run_bwd_v2 (windowed kernel, dfa3d_pallas4).
    With direct_grads=True the runner instead returns
    (d_value (N, H, W, cfull), d_dpt (N, H, W, D), dw4_flat, ddvec_flat)
    and the un-quad step is skipped (dfa3d_pallas5)."""
    n, h, w, cfull = value_img.shape
    d_size = dpt_img.shape[-1]
    k = sampling_locations.shape[1]
    p = sampling_locations.shape[3]
    heads = num_heads
    c = cfull // heads
    qb = (pick_qb or (lambda kk, pp: _pick_qb_v2(
        kk, pp, bwd=True, counted=counts is not None)))(k, p)

    rows, winfo, resid, kpad = _sample_quantities_v2(
        sampling_locations, attention_weights, h, w, d_size, qb
    )
    (wb, attn_t, lx, ly, ld, vd0, vd1, d0c, d1c, vx0, vx1, vy0, vy1) = resid

    # incoming grad (N, K, heads*c) -> per-(cam, head) query-block rows
    g = g.astype(jnp.float32)
    if kpad != k:
        g = jnp.pad(g, ((0, 0), (0, kpad - k), (0, 0)))
    g_b = jnp.moveaxis(g.reshape(n, kpad, heads, c), 2, 1)  # (N, heads, Kpad, c)
    g_flat = g_b.reshape(-1, c)

    if runner is None:
        quad = _build_quad_image(value_img, dpt_img, heads)
        dquad, dw4_flat, ddvec_flat = _run_bwd_v2(
            quad, rows, winfo, g_flat, heads, c, p, qb, d_size,
            _counts_smem(counts, n, heads, kpad),
        )
    else:
        dquad, dw4_flat, ddvec_flat = runner(
            value_img, dpt_img, heads, rows, winfo, g_flat, c, p, qb,
            d_size, h, w
        )

    if direct_grads:
        d_value, d_dpt = dquad
    else:
        # un-quad: pixel (y, x) sums its four corner slots from neighbors
        rq = (h + 1) * (w + 1)
        dquad = dquad[:, :rq].reshape(n, heads, h + 1, w + 1,
                                      4 * (c + d_size))
        cA, cB, cC, cD = (dquad[..., i * c:(i + 1) * c] for i in range(4))
        d_off = 4 * c
        dA, dB, dC, dD = (
            dquad[..., d_off + i * d_size: d_off + (i + 1) * d_size]
            for i in range(4)
        )
        d_value = (
            cA[:, :, 1:, 1:] + cB[:, :, 1:, :-1] + cC[:, :, :-1, 1:]
            + cD[:, :, :-1, :-1]
        )  # (N, heads, H, W, c)
        d_value = jnp.moveaxis(d_value, 1, 3).reshape(n, h, w, cfull)
        d_dpt = (
            dA[:, :, 1:, 1:] + dB[:, :, 1:, :-1] + dC[:, :, :-1, 1:]
            + dD[:, :, :-1, :-1]
        ).sum(axis=1)  # depth dist shared across heads

    # de-blockify sample grads to (N, heads, Kpad, P, lanes)
    nblk = kpad // qb

    def unblock(x, lanes):
        x = x.reshape(n, heads, nblk, p, qb, lanes)
        x = jnp.moveaxis(x, 3, 4)  # (N, heads, nblk, qb, P, lanes)
        return x.reshape(n, heads, kpad, p, lanes)

    dw4 = unblock(dw4_flat, 4)
    ddvec = unblock(ddvec_flat, d_size)

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
        d_value.astype(value_img.dtype),
        d_dpt.astype(dpt_img.dtype),
        d_locs.astype(sampling_locations.dtype),
        d_attn.astype(attention_weights.dtype),
    )


dfa3d_attention_pallas_v2.defvjp(_vjp_fwd_v2, _vjp_bwd_v2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def dfa3d_attention_pallas_v2c(value_img, dpt_img, sampling_locations,
                               attention_weights, valid_counts, num_heads):
    """v2 kernel with per-camera visible-count block skipping.

    valid_counts: (N,) float32 — per-camera count of real (visible) queries,
    packed FIRST along the query axis (the budget compaction's top_k order).
    Query positions >= valid_counts[cam] return ZEROS and produce zero
    loc/attn gradients: exact whenever the caller masks those positions
    downstream (the inter-view fusion does), while the kernel's gather work
    scales with the ACTUAL visibility instead of the padded budget."""
    out, _ = _fwd_impl_v2c(value_img, dpt_img, sampling_locations,
                           attention_weights, valid_counts, num_heads)
    return out


def _fwd_impl_v2c(value_img, dpt_img, sampling_locations, attention_weights,
                  valid_counts, num_heads):
    out, _ = _fwd_impl_v2(value_img, dpt_img, sampling_locations,
                          attention_weights, num_heads, counts=valid_counts)
    return out, (value_img, dpt_img, sampling_locations, attention_weights,
                 valid_counts)


def _vjp_bwd_v2c(num_heads, res, g):
    value_img, dpt_img, locs, attn, valid_counts = res
    grads = _bwd_impl_v2(value_img, dpt_img, locs, attn, g, num_heads,
                         counts=valid_counts)
    return grads + (jnp.zeros_like(valid_counts),)


dfa3d_attention_pallas_v2c.defvjp(_fwd_impl_v2c, _vjp_bwd_v2c)
