"""On-chip correctness + A/B of the windowed-matmul DFA3D forward
(dfa3d_pallas4) against the packed-quad copy-loop forward (dfa3d_pallas3).

Correctness: windowed and packed-quad compute identical epilogue math from
identical bf16 quad values — they must agree to f32 round-off at every
shape, in BOTH regimes (coherent rows -> windowed path; random rows -> the
per-chunk copy-loop fallback).  Also checked loosely against the jnp oracle.

Run on the TPU:  python experiments/bench_window.py
"""
import sys
import time

import jax
import jax.numpy as jnp

from experiments.bench_kernels import SHAPES, make_case, slope_time
from experiments.dfa3d_variants import dfa3d_attention_pallas_pq_s2
from sgcdet_tpu.ops.dfa3d_pallas3 import dfa3d_attention_pallas_pq
from experiments.dfa3d_pallas4 import (
    dfa3d_attention_pallas_w,
    dfa3d_attention_pallas_wh,
)
from experiments.dfa3d_pallas5 import dfa3d_attention_pallas_ws
from sgcdet_tpu.ops.msda import dfa3d_attention


def as_bf16(case):
    v, dp, locs, attn = case
    return v.astype(jnp.bfloat16), dp.astype(jnp.bfloat16), locs, attn


def check_small():
    n, h, w, k, heads, c, p, d = 2, 10, 12, 512, 4, 32, 2, 6
    for coherent in (True, False):
        case = as_bf16(make_case(n, h, w, k, heads, c, p, d, coherent))
        v, dp, locs, attn = case
        ow = jax.jit(lambda *a: dfa3d_attention_pallas_w(*a, heads))(
            v, dp, locs, attn)
        owh = jax.jit(lambda *a: dfa3d_attention_pallas_wh(*a, heads))(
            v, dp, locs, attn)
        ows = jax.jit(lambda *a: dfa3d_attention_pallas_ws(*a, heads))(
            v, dp, locs, attn)
        opq = jax.jit(lambda *a: dfa3d_attention_pallas_pq(*a, heads))(
            v, dp, locs, attn)
        ref, _ = dfa3d_attention(
            v.reshape(n, h * w, heads, c).astype(jnp.float32),
            dp.reshape(n, h * w, d).astype(jnp.float32),
            ((h, w),), locs[:, :, :, None].astype(jnp.float32),
            attn[:, :, :, None].astype(jnp.float32),
        )
        e_pq = float(jnp.abs(ow.astype(jnp.float32)
                             - opq.astype(jnp.float32)).max())
        e_ref = float(jnp.abs(ow.astype(jnp.float32) - ref).max())
        e_wh = float(jnp.abs(owh.astype(jnp.float32) - ref).max())
        e_ws = float(jnp.abs(ows.astype(jnp.float32) - ref).max())
        tag = "coh" if coherent else "rnd"
        print(f"small s2 {tag}: |w - pq| {e_pq:.2e}  |w - oracle| {e_ref:.2e}"
              f"  |wh - oracle| {e_wh:.2e}  |ws - oracle| {e_ws:.2e}")

        # wh gradients vs the bf16-oracle VJP (pq_s2's production backward)
        def loss(op):
            def f(v, dp, locs, attn):
                return jnp.sum(op(v, dp, locs, attn, heads)
                               .astype(jnp.float32) ** 2)
            return f

        g_wh = jax.jit(jax.grad(loss(dfa3d_attention_pallas_wh),
                                argnums=(0, 1, 2, 3)))(v, dp, locs, attn)
        g_pq = jax.jit(jax.grad(loss(dfa3d_attention_pallas_pq_s2),
                                argnums=(0, 1, 2, 3)))(v, dp, locs, attn)
        errs = [float(jnp.abs(a.astype(jnp.float32)
                              - b.astype(jnp.float32)).max())
                for a, b in zip(g_wh, g_pq)]
        print(f"small s2 {tag} wh-grad vs pq-grad: "
              + " ".join(f"{e:.2e}" for e in errs))
        g_ws = jax.jit(jax.grad(loss(dfa3d_attention_pallas_ws),
                                argnums=(0, 1, 2, 3)))(v, dp, locs, attn)
        errs = [float(jnp.abs(a.astype(jnp.float32)
                              - b.astype(jnp.float32)).max())
                for a, b in zip(g_ws, g_pq)]
        print(f"small s2 {tag} ws-grad vs pq-grad: "
              + " ".join(f"{e:.2e}" for e in errs))
    # stage-1 single-head
    n, h, w, k, heads, c, p, d = 2, 10, 12, 512, 1, 128, 1, 6
    case = as_bf16(make_case(n, h, w, k, heads, c, p, d, True))
    v, dp, locs, attn = case
    ow = jax.jit(lambda *a: dfa3d_attention_pallas_w(*a, 1))(v, dp, locs, attn)
    opq = jax.jit(lambda *a: dfa3d_attention_pallas_pq(*a, 1))(
        v, dp, locs, attn)
    e_pq = float(jnp.abs(ow.astype(jnp.float32)
                         - opq.astype(jnp.float32)).max())
    print(f"small s1 coh: |w - pq| {e_pq:.2e}")


def main():
    import os
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    only = os.environ.get("BW_ONLY", "")  # substring filter: "small", shape
    if not only or "small" in only:
        check_small()
    for shape_name, (n, h, w, k, heads, c, p, d) in SHAPES.items():
        if only and only != "shapes" and only not in shape_name:
            continue
        coh_opts = (True, False)
        if os.environ.get("BW_COH") == "1":
            coh_opts = (True,)
        for coherent in coh_opts:
            case = as_bf16(make_case(n, h, w, k, heads, c, p, d, coherent))
            v, dp, locs, attn = case
            tag = "coh" if coherent else "rnd"
            variants = [("ws", dfa3d_attention_pallas_ws, True),
                        ("wh", dfa3d_attention_pallas_wh, True),
                        ("pq", dfa3d_attention_pallas_pq_s2, True)]
            if os.environ.get("BW_WS_ONLY") == "1":
                variants = variants[:1]
            if heads == 1:
                variants = [("pq", dfa3d_attention_pallas_pq, False)]
            for vname, op, bwd in variants:
                @jax.jit
                def fwd(v, dp, locs, attn, op=op):
                    return jnp.sum(jnp.abs(
                        op(v, dp, locs, attn, heads).astype(jnp.float32)))
                try:
                    t = slope_time(fwd, (v, dp, locs, attn))
                except Exception as e:  # noqa: BLE001
                    print(f"{shape_name} {tag} {vname:7s} FAILED: "
                          f"{type(e).__name__}: {str(e)[:160]}")
                    continue
                tb = None
                if bwd:
                    def loss(v, dp, locs, attn, op=op):
                        return jnp.sum(
                            op(v, dp, locs, attn, heads)
                            .astype(jnp.float32) ** 2)

                    @jax.jit
                    def g(v, dp, locs, attn):
                        gs = jax.grad(loss, argnums=(0, 1, 2, 3))(
                            v, dp, locs, attn)
                        return sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                                   for x in gs)
                    try:
                        tb = slope_time(g, (v, dp, locs, attn), iters=4)
                    except Exception as e:  # noqa: BLE001
                        print(f"{shape_name} {tag} {vname:7s} bwd FAILED: "
                              f"{type(e).__name__}: {str(e)[:160]}")
                tb_s = f"   bwd {tb*1e3:8.1f} ms" if tb else ""
                print(f"{shape_name} {tag} {vname:7s} fwd {t*1e3:8.1f} ms"
                      + tb_s)
                sys.stdout.flush()


if __name__ == "__main__":
    main()
