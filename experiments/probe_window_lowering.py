"""Lowering probes for the windowed-matmul DFA3D kernel design:

  1. single-row dynamic-slice COPY on a bf16 (R, L) VMEM ref — needed so the
     oversized-chunk fallback branch can gather from the same bf16 quad
     image as the windowed branch (bf16 tiles are (16, 128) sublanes; only
     f32 single-row copies were exercised before). Rate vs f32.
  2. multi-row dynamic-slice ACCUMULATE ``ref[pl.ds(base, W), :] += S.T @ U``
     — the windowed backward scatter.
  3. exactness of an f32 one-hot MXU dot (the backward scatter's S.T is f32;
     f32 matmuls decompose into bf16 passes — selection by 1.0 must stay
     bit-exact).

Run on the TPU: python -m experiments.probe_window_lowering
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---- probe 1: bf16 single-row copies --------------------------------------

def _copy_kernel(rows_ref, img_ref, out_ref, *, m):
    def outer(j, _):
        def inner(l, _):
            i = j * 128 + l * 8
            for t in range(8):
                out_ref[pl.ds(i + t, 1), :] = img_ref[
                    pl.ds(rows_ref[j, l * 8 + t], 1), :]
            return 0

        jax.lax.fori_loop(0, 16, inner, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, m // 128, outer, 0, unroll=False)


def row_copies(img, rows, mb=4096):
    r, l = img.shape
    m = rows.shape[0]
    return pl.pallas_call(
        functools.partial(_copy_kernel, m=mb),
        grid=(m // mb,),
        out_shape=jax.ShapeDtypeStruct((m, l), img.dtype),
        in_specs=[
            pl.BlockSpec((mb // 128, 128), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((r, l), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mb, l), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(rows.reshape(-1, 128), img)


# ---- probe 2: windowed scatter-accumulate ----------------------------------

def _scat_kernel(meta_ref, rel_ref, u_ref, out_ref, *, wwin, cm, nchunk):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(ci, _):
        off = ci * cm
        base = meta_ref[0, ci, 0]
        rel = rel_ref[pl.ds(off, cm), :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (cm, wwin), 1)
        st = (iota == rel).astype(jnp.float32)  # (cm, wwin)
        u = u_ref[pl.ds(off, cm), :]
        upd = jnp.dot(st.T, u, preferred_element_type=jnp.float32)
        win = pl.ds(pl.multiple_of(base, 8), wwin)
        out_ref[win, :] += upd
        return 0

    jax.lax.fori_loop(0, nchunk, body, 0, unroll=False)


def windowed_scatter(u, rows, r, wwin=256, mb=4096, cm=256):
    m, l = u.shape
    nblk = m // mb
    nchunk = mb // cm
    ch = rows.reshape(-1, cm)
    base = jnp.clip(jnp.min(ch, 1) & ~7, 0, r - wwin)
    rel = (ch - base[:, None]).reshape(m, 1)
    meta = jnp.stack([base, base], 1).reshape(nblk, nchunk, 2)
    return pl.pallas_call(
        functools.partial(_scat_kernel, wwin=wwin, cm=cm, nchunk=nchunk),
        grid=(nblk,),
        out_shape=jax.ShapeDtypeStruct((r, l), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, nchunk, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((mb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mb, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, l), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(meta, rel, u)


def bench(label, f, *args, per=1):
    o = jax.block_until_ready(f(*args))

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            o = f(*args)
        jax.block_until_ready(o)
        return time.perf_counter() - t0

    lo = min(run(1), run(1))
    hi = min(run(7), run(7))
    dt = (hi - lo) / 6
    print(f"{label:34s} {per/dt/1e6:6.0f} M rows/s ({dt*1e3:7.2f} ms)")
    return o


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    r, l, m = 4944, 1072, 1 << 20
    key = jax.random.PRNGKey(0)
    imgf = jax.random.normal(key, (r, l), jnp.float32)
    imgb = imgf.astype(jnp.bfloat16)
    rows = jnp.sort(jax.random.randint(jax.random.PRNGKey(1), (m,), 0, r))

    # 1. bf16 single-row copies: lower + exact + rate
    try:
        out = bench("bf16 row copies", jax.jit(row_copies), imgb, rows, per=m)
        err = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - imgb[rows].astype(jnp.float32))))
        print(f"   bf16 copies exact: max err {err}")
    except Exception as e:
        print(f"   bf16 copies FAILED: {type(e).__name__}: {str(e)[:300]}")
    bench("f32 row copies (same bytes=2x lanes)", jax.jit(
        functools.partial(row_copies)), imgf[:, :l // 2], rows, per=m)
    bench("f32 row copies (same lanes)", jax.jit(
        functools.partial(row_copies)), imgf, rows, per=m)

    # 2. windowed scatter-accumulate
    u = jax.random.normal(jax.random.PRNGKey(2), (m, l), jnp.float32)
    try:
        f = jax.jit(functools.partial(windowed_scatter, r=r))
        out = bench("windowed scatter += S.T@U", f, u, rows, per=m)
        ref = jax.ops.segment_sum(u, rows, num_segments=r)
        err = float(jnp.max(jnp.abs(out - ref)))
        rel = err / float(jnp.max(jnp.abs(ref)))
        print(f"   scatter err: abs {err:.3e} rel {rel:.3e} "
              f"(f32 one-hot dot exactness check)")
    except Exception as e:
        print(f"   windowed scatter FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
