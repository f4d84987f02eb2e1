"""Micro-probes for the DFA3D gather-loop floor (v5e).

Round-3 in-situ numbers put the v2 stage-2 kernel at ~13.4 ns/sample; a
standalone copy loop runs at 8.1 ns/copy.  The copies are VECTOR load/store
pairs (not DMAs), so they share VPU issue slots with the epilogue math —
width and store batching should both move the floor:

  width-X     one (1, X) f32 row copy per sample (X=88 simulates the
              bf16-packed per-head quad row: 176 bf16 lanes -> 88 f32 words)
  g8          8 rows accumulated in registers, ONE aligned (8, X) store
  p4          v2's real structure: 4 scratch buffers, 2 queries x 4 points
              per iteration
  p4+epi      p4 followed by the v2 epilogue math (winfo-weighted corner
              sum) — reproduces the in-situ cost

Run on the TPU:  python -m experiments.probe_gather_batch
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RQ = 4944
QB = 16384
STEPS = 8


def _kernel_single(rows_ref, img_ref, out_ref):
    def outer(j, _):
        def inner(l, _):
            i = j * 128 + l * 2
            for t in range(2):
                out_ref[pl.ds(i + t, 1), :] = img_ref[
                    pl.ds(rows_ref[j, l * 2 + t], 1), :
                ]
            return 0

        jax.lax.fori_loop(0, 64, inner, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, QB // 128, outer, 0, unroll=False)


def _kernel_g8(rows_ref, img_ref, out_ref):
    def outer(j, _):
        def inner(l, _):
            i = pl.multiple_of(j * 128 + l * 8, 8)
            rows = [
                img_ref[pl.ds(rows_ref[j, l * 8 + t], 1), :]
                for t in range(8)
            ]
            out_ref[pl.ds(i, 8), :] = jnp.concatenate(rows, axis=0)
            return 0

        jax.lax.fori_loop(0, 16, inner, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, QB // 128, outer, 0, unroll=False)


def _kernel_p4(rows_ref, img_ref, out_ref, *scs):
    seg = QB // 128
    p = len(scs)

    def outer(j, _):
        def inner(l, _):
            i = j * 128 + l * 2
            for t in range(2):
                for pt in range(p):
                    scs[pt][pl.ds(i + t, 1), :] = img_ref[
                        pl.ds(rows_ref[pt * seg + j, l * 2 + t], 1), :
                    ]
            return 0

        jax.lax.fori_loop(0, 64, inner, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, seg, outer, 0, unroll=False)
    out_ref[:] = scs[0][:]


def _kernel_p4_epi(rows_ref, winfo_ref, img_ref, out_ref, *scs):
    seg = QB // 128
    p = len(scs)

    def outer(j, _):
        def inner(l, _):
            i = j * 128 + l * 2
            for t in range(2):
                for pt in range(p):
                    scs[pt][pl.ds(i + t, 1), :] = img_ref[
                        pl.ds(rows_ref[pt * seg + j, l * 2 + t], 1), :
                    ]
            return 0

        jax.lax.fori_loop(0, 64, inner, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, seg, outer, 0, unroll=False)

    width = img_ref.shape[1]
    c = (width - 4 * 12) // 4 if width >= 4 * 13 else width // 4
    d_size = (width - 4 * c) // 4
    acc = None
    for pt in range(p):
        winfo = winfo_ref[pt * QB:(pt + 1) * QB, :]
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (QB, d_size), 1).astype(jnp.float32)
        dvec = (jnp.where(iota == winfo[:, 6:7], winfo[:, 4:5], 0.0)
                + jnp.where(iota == winfo[:, 7:8], winfo[:, 5:6], 0.0))
        s = scs[pt][:]
        contrib = None
        for jc in range(4):
            vj = s[:, jc * c:(jc + 1) * c]
            dj = s[:, 4 * c + jc * d_size: 4 * c + (jc + 1) * d_size]
            dsj = jnp.sum(dj * dvec, axis=1, keepdims=True)
            term = (winfo[:, jc:jc + 1] * dsj) * vj
            contrib = term if contrib is None else contrib + term
        acc = contrib if acc is None else acc + contrib
    out_ref[:, :acc.shape[1]] = acc
    if acc.shape[1] < width:
        out_ref[:, acc.shape[1]:] = jnp.zeros(
            (QB, width - acc.shape[1]), jnp.float32)


def run_case(name, width, kernel, n_scratch=0, with_winfo=False,
             n_points=1):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    img = jax.random.normal(ks[0], (RQ, width), jnp.float32)
    seg = QB // 128
    rows = jax.random.randint(
        ks[1], (STEPS * seg * n_points, 128), 0, RQ, jnp.int32)
    inputs = [rows, img]
    in_specs = [
        pl.BlockSpec((seg * n_points, 128),
                     lambda i: (i, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((RQ, width), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if with_winfo:
        winfo = jax.random.uniform(ks[2], (STEPS * QB * n_points, 8))
        winfo = winfo.at[:, 6:8].set(
            jnp.floor(winfo[:, 6:8] * 12))
        inputs = [rows, winfo, img]
        in_specs = [
            in_specs[0],
            pl.BlockSpec((QB * n_points, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            in_specs[1],
        ]

    fn = pl.pallas_call(
        kernel,
        grid=(STEPS,),
        out_shape=jax.ShapeDtypeStruct((STEPS * QB, width), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((QB, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((QB, width), jnp.float32)
                        for _ in range(n_scratch)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )

    @jax.jit
    def scalar(*a):
        return jnp.sum(jnp.abs(fn(*a)[:, :8]))

    float(scalar(*inputs))

    def t(m):
        t0 = time.perf_counter()
        o = None
        for _ in range(m):
            o = scalar(*inputs)
        float(o)
        return time.perf_counter() - t0

    lo = min(t(1), t(1))
    hi = min(t(9), t(9))
    per = (hi - lo) / 8
    n_copies = STEPS * QB * n_points
    print(f"{name:22s}: {per*1e3:7.3f} ms  {per/n_copies*1e9:6.2f} ns/copy  "
          f"{n_copies/per/1e6:6.1f} M copies/s", flush=True)


def main():
    for width in (88, 128, 176, 256):
        run_case(f"single w={width}", width, _kernel_single)
    for width in (88, 176):
        run_case(f"g8     w={width}", width, _kernel_g8)
    run_case("p4     w=176", 176, _kernel_p4, n_scratch=4, n_points=4)
    run_case("p4+epi w=176", 176, _kernel_p4_epi, n_scratch=4,
             with_winfo=True, n_points=4)


if __name__ == "__main__":
    main()
