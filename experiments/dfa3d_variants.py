"""Experimental (undispatched) DFA3D custom-VJP compositions.

These are real, tested kernel combinations that LOST the on-chip dispatch
shootout (see ops/dfa3d.dfa3d_attend's measured-win notes and
docs/roadmap.md): they live here so the shipped package contains only
dispatched code, while staying benchable (experiments/bench_kernels.py)
and covered (tests/test_dfa3d_pallas.py::test_mixed_*, TPU-gated).
"""
from __future__ import annotations

import functools

import jax

from sgcdet_tpu.ops.dfa3d_pallas import (
    _fwd_impl as _v1_fwd_impl,
    _vjp_bwd as _vjp_bwd_v1,  # noqa: F401 - re-exported for probes
)
from sgcdet_tpu.ops.dfa3d_pallas2 import _vjp_bwd_v2
from sgcdet_tpu.ops.dfa3d_pallas3 import _fwd_impl_pq


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def dfa3d_attention_pallas_mixed(value_img, dpt_img, sampling_locations,
                                 attention_weights, num_heads):
    """Best-of-both Pallas DFA3D: v1 pair-row forward + v2 quad-corner
    backward.  Superseded by v2-everywhere after the v2 block-sizing fix
    (v2 fwd 112 ms vs v1's 156 at the ScanNet L2 stage-2 shape,
    2026-08-18); kept as the strongest alternative composition.  Both
    halves store the same residuals (the raw primal inputs), so the VJP
    halves compose directly."""
    out, _ = _v1_fwd_impl(value_img, dpt_img, sampling_locations,
                          attention_weights, num_heads)
    return out


dfa3d_attention_pallas_mixed.defvjp(_v1_fwd_impl, _vjp_bwd_v2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def dfa3d_attention_pallas_pq_s2(value_img, dpt_img, sampling_locations,
                                 attention_weights, num_heads):
    """Packed-quad bf16 forward (ONE half-width row copy per sample,
    dfa3d_pallas3) + v2 quad-corner backward.  Lost to v2 at both released
    stage-2 widths (127 vs 112 ms at cfull=256) — the packed-quad forward
    is dispatched only for the single-head stage-1 shape (pq_s1, which
    stays in ops/dfa3d.py).  For bf16 inputs the packing is lossless; the
    backward recomputes from the exact primals."""
    out, _ = _fwd_impl_pq(value_img, dpt_img, sampling_locations,
                          attention_weights, num_heads)
    return out


dfa3d_attention_pallas_pq_s2.defvjp(_fwd_impl_pq, _vjp_bwd_v2)
