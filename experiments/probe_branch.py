"""Does pl.when on a data-dependent scalar actually branch, or do both
sides execute predicated?  Force the windowed kernel's per-chunk `ok` flag
all-1 (windowed dot only) / all-0 (copy-loop fallback only) and compare
with the mixed real flags at the ScanNet L2 stage-2 shape.

Run on the TPU: python -m experiments.probe_branch
"""
import jax
import jax.numpy as jnp

import experiments.dfa3d_pallas4 as p4
from experiments.bench_kernels import make_case, slope_time


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    n, h, w, k, heads, c, p, d = 40, 60, 80, 6400, 8, 32, 4, 12
    v, dp, locs, attn = make_case(n, h, w, k, heads, c, p, d, coherent=True)
    v = v.astype(jnp.bfloat16)
    dp = dp.astype(jnp.bfloat16)

    real_meta = p4._chunk_meta

    def forced(flag):
        def fn(rows, hwq, wwin, cm):
            meta, rel = real_meta(rows, hwq, wwin, cm)
            ok = jnp.full_like(meta[..., 1], flag)
            return jnp.stack([meta[..., 0], ok], -1), rel
        return fn

    for name, fn in (("real flags", real_meta), ("all-windowed", forced(1)),
                     ("all-fallback", forced(0))):
        p4._chunk_meta = fn

        @jax.jit
        def fwd(v, dp, locs, attn):
            return jnp.sum(jnp.abs(p4.dfa3d_attention_pallas_w(
                v, dp, locs, attn, heads).astype(jnp.float32)))

        t = slope_time(fwd, (v, dp, locs, attn))
        print(f"{name:14s} fwd {t*1e3:8.1f} ms")
    p4._chunk_meta = real_meta
    # coverage: what fraction of chunks fit the window on the coherent case?
    from sgcdet_tpu.ops.dfa3d_pallas import _pick_qb, _sample_quantities
    from sgcdet_tpu.ops.dfa3d_pallas3 import _quad_rows
    qb = _pick_qb(k, heads, p)
    rows2, _, _, _ = _sample_quantities(locs, attn, h, w, d, qb)
    rows = _quad_rows(rows2, h, w)
    hwq = -(-((h + 1) * (w + 1)) // 8) * 8
    for wwin in (256, 512):
        meta, _ = real_meta(rows, hwq, wwin, 256)
        frac = float(jnp.mean(meta[..., 1].astype(jnp.float32)))
        print(f"coherent-case window fit, wwin={wwin}: {frac:.3f}")


if __name__ == "__main__":
    main()
