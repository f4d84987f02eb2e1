"""Fused plane-sweep warp + correlation Pallas TPU kernel.

Replaces the XLA patch-gather path of ``depth_net.plane_sweep_correlation``
(reference semantics: depth_est_fusion.py:85-126 homo_warping +
:232-237 dot-product correlation; grid_sample(align_corners=False) with zero
padding).  For every (neighbor-view, depth-plane, pixel):

    corr = <bilinear_sample(src_fea, H_d(pixel)), ref_fea(pixel)> / sqrt(C)

The warp rows of one plane scan the image almost monotonically (smooth
homography).  With 8 independent row copies per loop iteration the kernel
measures ~107 M (1, 4C)-lane row copies/s on v5e (experiments/
probe_sweep_split.py) — the 40-view sweep drops ~100 ms -> ~70 ms fwd and
519 ms -> ~150 ms grad.

Layout: per source view a quad-corner image (row (y', x') holds the four
bilinear corners A|B|C|D of the footprint whose top-left pixel is
(y'-1, x'-1), c lanes each — the same trick as dfa3d_pallas2).  One gather of
4C lanes per sample, VPU corner reduction, lane-sum against the VMEM-resident
ref rows (sample order is plane-major so ref rows align per plane slice).

Sampling locations are functions of static projections only, so the custom
VJP needs value gradients only: d_ref rides the forward gather (accumulated
across plane chunks), d_src scatter-adds per-corner updates into a quad
gradient image, un-quadded outside.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dfa3d_pallas import _round_up
from .dfa3d_pallas3 import _pack2, _unpack_hi, _unpack_lo


# ---------------------------------------------------------------------------
# prep (plain XLA)
# ---------------------------------------------------------------------------


def _build_quad_value(img):
    """(N, H, W, C) -> (N, Rq, 4C) f32 quad-corner image (edge-duplicated;
    OOB slots only read with zero weight). Rq = (H+1)(W+1) padded to 8."""
    n, h, w, c = img.shape
    v = img.astype(jnp.float32)
    vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    quad = jnp.concatenate(
        [
            vp[:, : h + 1, : w + 1],
            vp[:, : h + 1, 1: w + 2],
            vp[:, 1: h + 2, : w + 1],
            vp[:, 1: h + 2, 1: w + 2],
        ],
        axis=-1,
    ).reshape(n, (h + 1) * (w + 1), 4 * c)
    rq = _round_up((h + 1) * (w + 1), 8)
    if rq != quad.shape[1]:
        quad = jnp.pad(quad, ((0, 0), (0, rq - quad.shape[1]), (0, 0)))
    return quad


def _build_quad_packed_value(img):
    """(N, H, W, C) -> (N, Rq, 2C) bf16-packed quad rows: word k of the
    first C lanes packs corners (A, B) of channel k, the second C lanes pack
    (C, D).  HALF the gather bytes of the f32 quad image — used for bf16
    inputs, where the packing is lossless (see dfa3d_pallas3)."""
    n, h, w, c = img.shape
    v = img.astype(jnp.float32)
    vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    packed = jnp.concatenate(
        [
            _pack2(vp[:, : h + 1, : w + 1], vp[:, : h + 1, 1: w + 2]),
            _pack2(vp[:, 1: h + 2, : w + 1], vp[:, 1: h + 2, 1: w + 2]),
        ],
        axis=-1,
    ).reshape(n, (h + 1) * (w + 1), 2 * c)
    rq = _round_up((h + 1) * (w + 1), 8)
    if rq != packed.shape[1]:
        packed = jnp.pad(packed, ((0, 0), (0, rq - packed.shape[1]), (0, 0)))
    return packed


def _sweep_rows_weights(x_eff, y_eff, h, w, hwp):
    """Quad rows + corner weights for (N, D, HW) warp coords.

    Returns rows (N, D, HWp) int32 and w4 (N, D, HWp, 4) f32, pixel-padded
    with zero weights to HWp.
    """
    n, d, hw = x_eff.shape
    x = jnp.clip(x_eff, -4.0, w + 4.0)
    y = jnp.clip(y_eff, -4.0, h + 4.0)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    lx = x - x0f
    ly = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    vx0 = (x0 >= 0) & (x0 <= w - 1)
    vx1 = (x0 + 1 >= 0) & (x0 + 1 <= w - 1)
    vy0 = (y0 >= 0) & (y0 <= h - 1)
    vy1 = (y0 + 1 >= 0) & (y0 + 1 <= h - 1)
    w4 = jnp.stack(
        [
            (1 - ly) * (1 - lx) * (vy0 & vx0),
            (1 - ly) * lx * (vy0 & vx1),
            ly * (1 - lx) * (vy1 & vx0),
            ly * lx * (vy1 & vx1),
        ],
        axis=-1,
    )  # (N, D, HW, 4)
    rows = jnp.clip(y0 + 1, 0, h) * (w + 1) + jnp.clip(x0 + 1, 0, w)
    if hwp != hw:
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, hwp - hw)))
        w4 = jnp.pad(w4, ((0, 0), (0, 0), (0, hwp - hw), (0, 0)))
    return rows, w4.astype(jnp.float32)


def _plane_ranges(w4, n, d, hwp):
    """Per-(pair, plane) contiguous range [lo, hi) of 128-sample groups that
    contain ANY valid sample (some bilinear weight nonzero).  The warp of one
    plane scans the output image smoothly, so off-image samples cluster at
    the start/end of the flat pixel scan (and whole near planes are often
    fully off-image on wide-rotation rigs); the kernels take these as DYNAMIC
    loop bounds — unlike the measured-negative per-group ``pl.when`` gate
    (experiments/bench_sweep_skip.py), fewer loop trips have zero
    predication cost.  Empty planes yield lo == hi (zero trips).
    Returns (2, n*d) int32 — row 0 = lo, row 1 = hi; rides as a FULL-array
    SMEM operand (SMEM blocks must be full-array or 8x128-tiled), the
    kernels index planes from their program ids."""
    g = hwp // 128
    gv = (jnp.sum(w4, -1) > 0).reshape(n, d, g, 128).any(-1)
    idx = jnp.arange(g, dtype=jnp.int32)
    lo = jnp.min(jnp.where(gv, idx, g), axis=-1)
    hi = jnp.maximum(jnp.max(jnp.where(gv, idx + 1, 0), axis=-1), lo)
    return jnp.stack([lo.reshape(-1), hi.reshape(-1)]).astype(jnp.int32)


def _gather_rows(rows_ref, rng_ref, img_ref, sc, dpc, gpp, pbase):
    # 8 rows accumulated in registers, ONE sublane-aligned (8, width) store
    # per iteration: the copies are vector load/store pairs, so batching the
    # store side is a measured 1.8x over per-row stores (experiments/
    # probe_gather_batch.py, v5e 2026-08-19).  Per plane, only the valid
    # group range [lo, hi) is gathered; scratch rows outside it keep STALE
    # contents (possibly uninitialized VMEM), so callers must jnp.where-mask
    # the per-sample epilogue on the validity of the bilinear weights.
    gw = img_ref.shape[1]  # gather rows land in the first gw scratch lanes

    def outer(j, _):
        def inner(l, _):
            base = pl.multiple_of(j * 128 + l * 8, 8)
            rows = [
                img_ref[pl.ds(rows_ref[j, l * 8 + s], 1), :]
                for s in range(8)
            ]
            sc[pl.ds(base, 8), :gw] = jnp.concatenate(rows, axis=0)
            return 0

        jax.lax.fori_loop(0, 16, inner, 0, unroll=False)
        return 0

    for dp in range(dpc):
        jax.lax.fori_loop(dp * gpp + rng_ref[0, pbase + dp],
                          dp * gpp + rng_ref[1, pbase + dp], outer, 0,
                          unroll=False)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _corner_slices_f32(s, c):
    return [s[:, j * c:(j + 1) * c] for j in range(4)]


def _corner_slices_pk(s, c):
    return [unpack(s[:, off * c:(off + 1) * c])
            for off, unpack in ((0, _unpack_hi), (0, _unpack_lo),
                                (1, _unpack_hi), (1, _unpack_lo))]


def _w4_plane(w4_ref, dp):
    """Per-plane (hwp, 4) weights from the transposed (8*dpc, hwp) window
    (narrow (m, 4) windows pay a per-row DMA descriptor tax ~1.9 ns/row —
    docs/roadmap.md round-5; the transpose back is ~free in-register)."""
    return jnp.transpose(w4_ref[dp * 8:dp * 8 + 4, :])


def _fwd_body(rng_ref, w4_ref, ref_ref, out_ref, sc, corners, c, dpc, hwp,
              inv_sqrt_c, base):
    ref = ref_ref[:]  # (hwp, c)
    # per-plane compute: keeps vector live ranges at (hwp, 4c), not (m, 4c)
    # — full-m expressions spill ~2.5 KB/sample of vregs at scale.  Planes
    # whose group range is empty write zeros without touching the (stale)
    # scratch; nonempty planes mask the final corr on sample validity, so
    # stale scratch outside the range (even NaN bit patterns from
    # uninitialized VMEM) cannot leak.
    for dp in range(dpc):
        sl = pl.ds(dp * hwp, hwp)

        @pl.when(rng_ref[1, base + dp] > rng_ref[0, base + dp])
        def _(dp=dp, sl=sl):
            s = sc[sl, :]
            w4 = _w4_plane(w4_ref, dp)
            warped = None
            for j, cj in enumerate(corners(s, c)):
                term = w4[:, j:j + 1] * cj
                warped = term if warped is None else warped + term
            corr = jnp.sum(warped * ref, axis=1, keepdims=True) * inv_sqrt_c
            vs = w4[:, 0:1] + w4[:, 1:2] + w4[:, 2:3] + w4[:, 3:4]
            corr = jnp.where(vs > 0.0, corr, 0.0)
            # transposed out: one (1, hwp) row per plane instead of a
            # (hwp, 8) narrow window
            out_ref[dp:dp + 1, :] = jnp.transpose(corr)

        @pl.when(rng_ref[1, base + dp] <= rng_ref[0, base + dp])
        def _(dp=dp):
            out_ref[dp:dp + 1, :] = jnp.zeros((1, hwp), jnp.float32)


def _fwd_kernel(rng_ref, rows_ref, w4_ref, quad_ref, ref_ref, out_ref, sc, *,
                c, dpc, hwp, inv_sqrt_c, nchunk):
    base = (pl.program_id(0) * nchunk + pl.program_id(1)) * dpc
    _gather_rows(rows_ref, rng_ref, quad_ref, sc, dpc, hwp // 128, base)
    _fwd_body(rng_ref, w4_ref, ref_ref, out_ref, sc, _corner_slices_f32, c,
              dpc, hwp, inv_sqrt_c, base)


def _fwd_kernel_pk(rng_ref, rows_ref, w4_ref, quad_ref, ref_ref, out_ref, sc,
                   *, c, dpc, hwp, inv_sqrt_c, nchunk):
    """Packed-row forward: corner pairs unpacked in-register (two integer
    ops + a bitcast per corner slice)."""
    base = (pl.program_id(0) * nchunk + pl.program_id(1)) * dpc
    _gather_rows(rows_ref, rng_ref, quad_ref, sc, dpc, hwp // 128, base)
    _fwd_body(rng_ref, w4_ref, ref_ref, out_ref, sc, _corner_slices_pk, c,
              dpc, hwp, inv_sqrt_c, base)


def _bwd_kernel(rng_ref, rows_ref, w4_ref, g_ref, quad_ref, ref_ref,
                dquad_ref, dref_ref, sc, scu, *, c, dpc, hwp, inv_sqrt_c,
                nchunk, corners=_corner_slices_f32):
    """Shared backward body.  ``corners`` selects the gather layout: f32
    quad rows (scratch width 4c; scu IS sc — the update rows reuse the
    gather scratch in place, each plane's gathered corners are consumed
    before its overwrite) or bf16-packed rows (scratch width 2c — HALF the
    gather copy lanes; the f32 update rows live in the separate ``scu``
    scratch, keeping every dynamic-sublane access at lane offset 0, which is
    all Mosaic supports)."""
    gpp = hwp // 128

    @pl.when(pl.program_id(1) == 0)
    def _():
        dquad_ref[:] = jnp.zeros_like(dquad_ref)
        dref_ref[:] = jnp.zeros_like(dref_ref)

    base = (pl.program_id(0) * nchunk + pl.program_id(1)) * dpc
    _gather_rows(rows_ref, rng_ref, quad_ref, sc, dpc, gpp, base)
    ref = ref_ref[:]
    # per-plane compute (see _fwd_kernel) — full-m expressions spill vregs.
    # Empty planes contribute exactly zero (all weights are zero) and are
    # skipped whole; within a nonempty plane, warped is jnp.where-masked on
    # sample validity so stale scratch outside the gathered range cannot leak
    # into d_ref (the update rows depend on the weights only, never on
    # scratch).
    for dp in range(dpc):
        sl = pl.ds(dp * hwp, hwp)

        @pl.when(rng_ref[1, base + dp] > rng_ref[0, base + dp])
        def _(dp=dp, sl=sl):
            s = sc[sl, :]
            w4 = _w4_plane(w4_ref, dp)
            warped = None
            for j, cj in enumerate(corners(s, c)):
                term = w4[:, j:j + 1] * cj
                warped = term if warped is None else warped + term
            vs = w4[:, 0:1] + w4[:, 1:2] + w4[:, 2:3] + w4[:, 3:4]
            warped = jnp.where(vs > 0.0, warped, 0.0)
            # transposed g: one (1, hwp) row per plane (see _fwd_body)
            gc = jnp.transpose(g_ref[dp:dp + 1, :]) * inv_sqrt_c
            dref_ref[:] += gc * warped
            dw = gc * ref  # (hwp, c)
            scu[sl, :] = jnp.concatenate(
                [w4[:, j:j + 1] * dw for j in range(4)], axis=1)

    def outer(j, _):
        def inner(l, _):
            base = j * 128 + l * 8
            for s in range(8):
                dquad_ref[pl.ds(rows_ref[j, l * 8 + s], 1), :] += scu[
                    pl.ds(base + s, 1), :]
            return 0

        jax.lax.fori_loop(0, 16, inner, 0, unroll=False)
        return 0

    for dp in range(dpc):
        jax.lax.fori_loop(dp * gpp + rng_ref[0, base + dp],
                          dp * gpp + rng_ref[1, base + dp], outer, 0,
                          unroll=False)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------


def _plan(d, hwp, c, rq, bwd=False, width=None, scw=None):
    """Planes per grid step, from explicit VMEM accounting (measured against
    the compiler's scoped-vmem dumps): grid-indexed windows are
    double-buffered AND lane-padded to 128, the gather scratch (dpc*hwp, scw)
    f32 is single-buffered, and one plane's compute live range rides the
    register spill slots.  ``width`` is the gather-row (quad image) width;
    ``scw`` the scratch width (defaults to width; the packed bwd stages
    2c-gathers AND 4c-update rows in one scratch, scw = 6c)."""
    width = 4 * c if width is None else width
    scw = width if scw is None else scw
    limit = 96e6  # headroom under the 128 MB scoped capacity

    def vmem(dpc):
        m = dpc * hwp
        fixed = 2 * (rq * width + hwp * 128) * 4  # quad + ref windows
        # transposed w4 (8*dpc, hwp) + out/g (8, hwp) windows, double-buffered
        per_step = 2 * (8 * dpc + 16) * hwp * 4
        scratch = m * scw * 4
        spill = 2 * hwp * max(width, 4 * c if bwd else 0) * 4
        if bwd:
            fixed += 2 * (rq * 4 * c + hwp * 128) * 4  # dquad + dref outputs
        return fixed + 2 * per_step + scratch + spill

    # dpc <= 8: the transposed out/g blocks hold one plane per sublane row
    # of an 8-row window
    dpc = max(1, min(d, 8))
    while dpc > 1 and (d % dpc or vmem(dpc) > limit):
        dpc -= 1
    return dpc


def _w4_transposed(w4, n, d, hwp):
    """(N*D*HWp, 4)-ordered weights -> (N*D*8, HWp): per plane the 4
    weight lanes become 4 wide rows (padded to 8 sublanes) so the kernel
    window streams wide rows instead of 16-byte ones."""
    w4 = jnp.moveaxis(w4.reshape(n, d, hwp, 4), 3, 2)  # (N, D, 4, HWp)
    w4 = jnp.pad(w4, ((0, 0), (0, 0), (0, 4), (0, 0)))
    return w4.reshape(n * d * 8, hwp)


def _out_untransposed(out, n, nchunk, dpc, hwp):
    """(N*nchunk*8, HWp) per-plane-row kernel output -> (N, D, HWp).
    Rows [dpc:8) of each step block are never written (garbage) and are
    sliced off here."""
    return out.reshape(n, nchunk, 8, hwp)[:, :, :dpc].reshape(n, -1, hwp)


def _run_fwd(quad, ref, rows, w4, rng, c, d, hwp):
    n, rq, width = quad.shape
    dpc = _plan(d, hwp, c, rq)
    nchunk = d // dpc
    m = dpc * hwp
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, c=c, dpc=dpc, hwp=hwp,
                          inv_sqrt_c=1.0 / (c ** 0.5), nchunk=nchunk),
        grid=(n, nchunk),
        out_shape=jax.ShapeDtypeStruct((n * nchunk * 8, hwp), jnp.float32),
        in_specs=[
            pl.BlockSpec(rng.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((m // 128, 128), lambda i, j: (i * nchunk + j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8 * dpc, hwp), lambda i, j: (i * nchunk + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rq, width), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwp, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, hwp), lambda i, j: (i * nchunk + j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m, width), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        rng,
        rows.reshape(-1, 128),
        _w4_transposed(w4, n, d, hwp),
        quad.reshape(n * rq, width),
        ref.reshape(n * hwp, c),
    )
    return _out_untransposed(out, n, nchunk, dpc, hwp)


def _run_fwd_pk(packed, ref, rows, w4, rng, c, d, hwp):
    n, rq, width = packed.shape  # width = 2c
    dpc = _plan(d, hwp, c, rq, width=width)
    nchunk = d // dpc
    m = dpc * hwp
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_pk, c=c, dpc=dpc, hwp=hwp,
                          inv_sqrt_c=1.0 / (c ** 0.5), nchunk=nchunk),
        grid=(n, nchunk),
        out_shape=jax.ShapeDtypeStruct((n * nchunk * 8, hwp), jnp.float32),
        in_specs=[
            pl.BlockSpec(rng.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((m // 128, 128), lambda i, j: (i * nchunk + j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8 * dpc, hwp), lambda i, j: (i * nchunk + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rq, width), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwp, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, hwp), lambda i, j: (i * nchunk + j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m, width), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        rng,
        rows.reshape(-1, 128),
        _w4_transposed(w4, n, d, hwp),
        packed.reshape(n * rq, width),
        ref.reshape(n * hwp, c),
    )
    return _out_untransposed(out, n, nchunk, dpc, hwp)


def _bwd_kernel_inplace(rng, rows, w4, g, quad, ref, dquad, dref, sc, **kw):
    _bwd_kernel(rng, rows, w4, g, quad, ref, dquad, dref, sc, sc, **kw)


def _run_bwd(quad, ref, rows, w4, g, rng, c, d, hwp, packed=False):
    n, rq, width = quad.shape  # width = 2c (packed) or 4c (f32 quad)
    # packed: 2c gather scratch + separate 4c update scratch
    scw = width + 4 * c if packed else width
    dpc = _plan(d, hwp, c, rq, bwd=True, width=width, scw=scw)
    nchunk = d // dpc
    m = dpc * hwp
    # transposed g: (N, D, HWp) -> (N*nchunk*8, HWp), one wide row per plane
    g_t = jnp.pad(g.astype(jnp.float32).reshape(n, nchunk, dpc, hwp),
                  ((0, 0), (0, 0), (0, 8 - dpc), (0, 0))
                  ).reshape(n * nchunk * 8, hwp)
    if packed:
        kernel = functools.partial(_bwd_kernel, corners=_corner_slices_pk)
        scratch = [pltpu.VMEM((m, width), jnp.float32),
                   pltpu.VMEM((m, 4 * c), jnp.float32)]
    else:
        kernel = _bwd_kernel_inplace
        scratch = [pltpu.VMEM((m, width), jnp.float32)]
    dquad, dref = pl.pallas_call(
        functools.partial(kernel, c=c, dpc=dpc, hwp=hwp,
                          inv_sqrt_c=1.0 / (c ** 0.5), nchunk=nchunk),
        grid=(n, nchunk),
        out_shape=(
            jax.ShapeDtypeStruct((n * rq, 4 * c), jnp.float32),
            jax.ShapeDtypeStruct((n * hwp, c), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(rng.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((m // 128, 128), lambda i, j: (i * nchunk + j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8 * dpc, hwp), lambda i, j: (i * nchunk + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, hwp), lambda i, j: (i * nchunk + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rq, width), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwp, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rq, 4 * c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hwp, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        rng,
        rows.reshape(-1, 128),
        _w4_transposed(w4, n, d, hwp),
        g_t,
        quad.reshape(n * rq, width),
        ref.reshape(n * hwp, c),
    )
    return dquad.reshape(n, rq, 4 * c), dref.reshape(n, hwp, c)


@jax.custom_vjp
def _sweep_core(src_img, ref_img, x_eff, y_eff):
    """src_img/ref_img: (N, H, W, C) f32; x_eff/y_eff: (N, D, HW) f32.
    Returns corr (N, D, HW) f32 (pre-scaled by 1/sqrt(C))."""
    out, _ = _sweep_fwd(src_img, ref_img, x_eff, y_eff)
    return out


def _to_cm(a, h, w):
    """(N, D, HW) raster (y, x) -> column-major (x, y) sample order.

    The invalid (off-source-image) samples of one plane form contiguous
    prefixes/suffixes of each output ROW (the valid region's boundaries are
    near-vertical for translating/panning rigs), so in column-major order
    they collapse into the flat scan's prefix/suffix — measured on the
    indoor 40-view rig, the _plane_ranges clamp skips 34% of 128-sample
    groups in this order vs 5.9% in raster order (the copy loop is
    issue-bound, not cache-bound, so the ordering itself is free)."""
    n, d, hw = a.shape
    return a.reshape(n, d, h, w).swapaxes(2, 3).reshape(n, d, hw)


def _from_cm(a, h, w):
    n, d, hw = a.shape
    return a.reshape(n, d, w, h).swapaxes(2, 3).reshape(n, d, hw)


def _sweep_fwd(src_img, ref_img, x_eff, y_eff):
    n, h, w, c = src_img.shape
    d, hw = x_eff.shape[1:]
    hwp = _round_up(hw, 1024)
    rows, w4 = _sweep_rows_weights(_to_cm(x_eff, h, w), _to_cm(y_eff, h, w),
                                   h, w, hwp)
    rng = _plane_ranges(w4, n, d, hwp)
    ref = jnp.swapaxes(ref_img.astype(jnp.float32), 1, 2).reshape(n, hw, c)
    if hwp != hw:
        ref = jnp.pad(ref, ((0, 0), (0, hwp - hw), (0, 0)))
    if src_img.dtype == jnp.bfloat16:
        # bf16-packed quad rows: HALF the gather bytes, lossless for bf16
        out = _run_fwd_pk(_build_quad_packed_value(src_img), ref, rows, w4,
                          rng, c, d, hwp)
    else:
        out = _run_fwd(_build_quad_value(src_img), ref, rows, w4, rng, c, d,
                       hwp)
    return _from_cm(out[..., :hw], h, w), (src_img, ref_img, x_eff, y_eff)


def _sweep_bwd(res, g):
    src_img, ref_img, x_eff, y_eff = res
    n, h, w, c = src_img.shape
    d, hw = x_eff.shape[1:]
    hwp = _round_up(hw, 1024)
    # bf16 inputs gather bf16-packed rows (half the copy lanes, losslessly
    # — the f32 quad of a bf16 image carries the same values); the update
    # rows / dquad accumulation stay f32 4c either way
    packed = src_img.dtype == jnp.bfloat16
    quad = (_build_quad_packed_value(src_img) if packed
            else _build_quad_value(src_img))
    rows, w4 = _sweep_rows_weights(_to_cm(x_eff, h, w), _to_cm(y_eff, h, w),
                                   h, w, hwp)
    rng = _plane_ranges(w4, n, d, hwp)
    ref = jnp.swapaxes(ref_img.astype(jnp.float32), 1, 2).reshape(n, hw, c)
    g = _to_cm(g, h, w)
    if hwp != hw:
        ref = jnp.pad(ref, ((0, 0), (0, hwp - hw), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, 0), (0, hwp - hw)))
    dquad, dref = _run_bwd(quad, ref, rows, w4, g, rng, c, d, hwp,
                           packed=packed)

    # un-quad: pixel (y, x) sums its four corner slots from neighboring rows
    dquad = dquad[:, : (h + 1) * (w + 1)].reshape(n, h + 1, w + 1, 4 * c)
    cA, cB, cC, cD = (dquad[..., i * c:(i + 1) * c] for i in range(4))
    d_src = (
        cA[:, 1:, 1:] + cB[:, 1:, :-1] + cC[:, :-1, 1:] + cD[:, :-1, :-1]
    )
    d_ref = jnp.swapaxes(dref[:, :hw].reshape(n, w, h, c), 1, 2)
    return (d_src.astype(src_img.dtype), d_ref.astype(ref_img.dtype),
            None, None)


_sweep_core.defvjp(lambda s, r, x, y: _sweep_fwd(s, r, x, y), _sweep_bwd)


def plane_sweep_correlation_pallas(src_fea, ref_fea, src_proj, ref_proj,
                                   depth_values):
    """Drop-in Pallas replacement for depth_net.plane_sweep_correlation.

    src_fea/ref_fea: (N, C, H, W); returns (N, D, H, W) in src_fea's dtype.
    """
    from ..models.depth_net import _warp_grid

    n, c, h, w = src_fea.shape
    x_eff, y_eff = _warp_grid(src_proj, ref_proj, depth_values, h, w)
    src_img = jnp.transpose(src_fea, (0, 2, 3, 1))
    ref_img = jnp.transpose(ref_fea, (0, 2, 3, 1))
    corr = _sweep_core(src_img, ref_img, x_eff.astype(jnp.float32),
                       y_eff.astype(jnp.float32))
    return corr.reshape(n, -1, h, w).astype(src_fea.dtype)
