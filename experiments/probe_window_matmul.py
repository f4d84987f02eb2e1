"""Probe: windowed one-hot selection matmul as a row-gather primitive.

The copy-issue-bound gather loop moves ~60-100M single-row copies/s; a
128-sample chunk whose rows fall inside a 256-row window can instead be
gathered by ONE MXU op: S (128 x 256) one-hot  @  img[base:base+256, :].
This probe answers, on the real chip:

  1. does a dynamic multi-row slice ``img_ref[pl.ds(base, 256), :]`` lower
     as a dot operand on this toolchain (needs a pl.multiple_of(base, 8)
     hint; single-row copies always lowered, multi-row COPIES did not as
     of round 2)?
  2. is the windowed matmul gather exact (one bf16 nonzero per row -> f32)?
  3. what rate does it sustain at the ScanNet L2 stage-2 scale?

Run on the TPU:  python -m experiments.probe_window_matmul
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(meta_ref, rel_ref, img_ref, out_ref, *, wwin, cm, nchunk, hoist,
            odt):
    def body(ci, _):
        off = ci * cm
        base = 0 if hoist else meta_ref[0, ci, 0]
        rel = rel_ref[pl.ds(off, cm), :]  # (cm, 1) int32
        iota = jax.lax.broadcasted_iota(jnp.int32, (cm, wwin), 1)
        s = (iota == rel).astype(jnp.bfloat16)
        win = img_ref[pl.ds(pl.multiple_of(base, 8), wwin), :]
        out_ref[pl.ds(off, cm), :] = jnp.dot(
            s, win, preferred_element_type=jnp.float32).astype(odt)
        return 0

    jax.lax.fori_loop(0, nchunk, body, 0, unroll=False)


def windowed_gather(img, rows, wwin=256, mb=2048, cm=128, hoist=False,
                    odt=jnp.float32):
    """img (R, L) bf16, rows (M,) int32 sorted-ish -> (M, L) odt."""
    r, l = img.shape
    m = rows.shape[0]
    nblk = m // mb
    nchunk = mb // cm
    ch = rows.reshape(-1, cm)
    base = jnp.minimum(jnp.min(ch, 1) & ~7, r - wwin)
    base = jnp.maximum(base, 0)
    rel = (ch - base[:, None]).reshape(m, 1)
    ok = (jnp.max(ch, 1) - base) < wwin
    meta = jnp.stack([base, ok.astype(jnp.int32)], 1)  # (M//cm, 2)
    meta = meta.reshape(nblk, nchunk, 2)
    return pl.pallas_call(
        functools.partial(_kernel, wwin=wwin, cm=cm, nchunk=nchunk,
                          hoist=hoist, odt=odt),
        grid=(nblk,),
        out_shape=jax.ShapeDtypeStruct((m, l), odt),
        in_specs=[
            pl.BlockSpec((1, nchunk, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((mb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, l), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mb, l), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(meta, rel, img)


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    # ---- correctness: small sorted case
    r, l, m = 512, 1072, 2048
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (r, l), jnp.float32).astype(jnp.bfloat16)
    rows = jnp.sort(jax.random.randint(jax.random.PRNGKey(1), (m,), 0, r))
    out = windowed_gather(img, rows)
    ref = img[rows].astype(jnp.float32)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"exactness (sorted, windows fit): max err {err}")

    # ---- rate at L2-s2 scale: 4941-row image, 1072 lanes
    r2 = 4944
    img2 = jax.random.normal(key, (r2, 1072), jnp.float32).astype(jnp.bfloat16)
    m2 = 1 << 20  # 1M samples per call
    t = jnp.arange(m2, dtype=jnp.float32) / (m2 - 1)
    base_rows = (t * (r2 - 1)).astype(jnp.int32)
    jit_ = jnp.clip(base_rows + jax.random.randint(
        jax.random.PRNGKey(2), (m2,), -40, 40), 0, r2 - 1)

    def bench(label, **kw):
        f = jax.jit(lambda im, rw: jnp.sum(
            windowed_gather(im, rw, **kw).astype(jnp.float32)))
        float(f(img2, jit_))

        def run(n):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = f(img2, jit_)
            float(o)
            return time.perf_counter() - t0

        lo = min(run(1), run(1))
        hi = min(run(7), run(7))
        dt = (hi - lo) / 6
        print(f"{label:32s} {m2/dt/1e6:5.0f} M rows/s "
              f"({dt*1e3:6.2f} ms/M; 8.2M -> {8.2e6/(m2/dt)*1e3:5.0f} ms)")

    bench("w256 cm256", wwin=256, cm=256)
    bench("w256 cm512", wwin=256, cm=512)
    bench("w128 cm128", wwin=128, cm=128)
    bench("w128 cm256", wwin=128, cm=256)
    bench("w256 cm256 bf16-out", wwin=256, cm=256, odt=jnp.bfloat16)
    bench("w128 cm256 bf16-out", wwin=128, cm=256, odt=jnp.bfloat16)
    bench("w128 cm512 bf16-out", wwin=128, cm=512, odt=jnp.bfloat16)
    bench("w512 cm512", wwin=512, cm=512)


if __name__ == "__main__":
    main()
