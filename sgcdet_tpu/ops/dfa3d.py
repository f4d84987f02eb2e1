"""Backend dispatch for the fused DFA3D sampling op.

Picks the Pallas TPU kernel (``dfa3d_pallas.py``) when running on TPU
hardware and the XLA patch-gather formulation (``dfa3d_fast.py``) elsewhere
(CPU tests, virtual-device multichip dryruns).  Both implement identical
semantics — the jnp oracle in ``msda.dfa3d_attention`` is the spec; see
tests/test_dfa3d_fast.py and tests/test_dfa3d_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .dfa3d_fast import dfa3d_attention_fast, msda_2d_fast
from .dfa3d_pallas import (
    dfa3d_attention_pallas,
    dfa3d_attention_pallas_c,
    _bwd_impl as _bwd_impl_v1,
    _vjp_bwd as _vjp_bwd_v1,
)
from .dfa3d_pallas2 import (
    dfa3d_attention_pallas_v2,
    dfa3d_attention_pallas_v2c,
)
from .dfa3d_pallas3 import _fwd_impl_pq

# Losing compositions from the on-chip dispatch shootout (v1-fwd+v2-bwd
# "mixed", packed-quad stage-2 "pq_s2") live in experiments/dfa3d_variants.py
# — the shipped package carries only dispatched code.


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def dfa3d_attention_pallas_pq_s1(value_img, dpt_img, sampling_locations,
                                 attention_weights, num_heads):
    """Packed-quad bf16 forward + v1 pair-row backward (stage-1 shapes:
    heads=1, P=1 — the v2 per-head quad backward does not apply there)."""
    out, _ = _fwd_impl_pq(value_img, dpt_img, sampling_locations,
                          attention_weights, num_heads)
    return out


dfa3d_attention_pallas_pq_s1.defvjp(_fwd_impl_pq, _vjp_bwd_v1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def dfa3d_attention_pallas_pq_s1c(value_img, dpt_img, sampling_locations,
                                  attention_weights, valid_counts, num_heads):
    """Counted pq_s1: packed-quad bf16 forward + v1 backward, both skipping
    whole query blocks past valid_counts[cam] (see
    dfa3d_pallas2.dfa3d_attention_pallas_v2c for the exactness contract)."""
    out, _ = _pq_s1c_fwd(value_img, dpt_img, sampling_locations,
                         attention_weights, valid_counts, num_heads)
    return out


def _pq_s1c_fwd(value_img, dpt_img, sampling_locations, attention_weights,
                valid_counts, num_heads):
    out, _ = _fwd_impl_pq(value_img, dpt_img, sampling_locations,
                          attention_weights, num_heads, counts=valid_counts)
    return out, (value_img, dpt_img, sampling_locations, attention_weights,
                 valid_counts)


def _pq_s1c_bwd(num_heads, res, g):
    value_img, dpt_img, locs, attn, valid_counts = res
    grads = _bwd_impl_v1(value_img, dpt_img, locs, attn, g, num_heads,
                         counts=valid_counts)
    return grads + (jnp.zeros_like(valid_counts),)


dfa3d_attention_pallas_pq_s1c.defvjp(_pq_s1c_fwd, _pq_s1c_bwd)

# None = auto-detect; True/False force the Pallas kernel on/off (tests, bench)
_FORCE_PALLAS: bool | None = None


def set_pallas_enabled(value: bool | None) -> None:
    global _FORCE_PALLAS
    _FORCE_PALLAS = value


def pallas_available() -> bool:
    if _FORCE_PALLAS is not None:
        return _FORCE_PALLAS
    try:
        dev = jax.devices()[0]
    except Exception:  # pragma: no cover - no backend at all
        return False
    return "TPU" in (getattr(dev, "device_kind", "") or "").upper() or (
        dev.platform == "tpu"
    )


def dfa3d_attend(value_img, dpt_img, sampling_locations, attention_weights,
                 num_heads, query_chunk=None, valid_counts=None):
    """Fused depth-weighted deformable attention; see dfa3d_fast for shapes.

    valid_counts: optional (N,) per-camera count of real queries, packed
    first along the query axis (the visibility-budget compaction's order).
    On TPU every kernel (stage-1 and stage-2) SKIPS whole query blocks past
    a camera's count (returning zeros there) — exact whenever the caller
    masks those positions downstream, with gather work scaling with the
    ACTUAL visibility instead of the padded budget.  Off-TPU the hint is
    ignored: that backend computes real values for the padded region, which
    the same downstream masking discards, so results are identical either
    way.

    Kernel choice (measured on v5e, experiments/bench_kernels.py 2026-08-18;
    random and post-sort-coherent sampling locations time identically — the
    gather loop is copy-issue-bound, not cache-bound):

    - Stage-2 (heads*P > 1): v2's per-head quad rows win at BOTH released
      widths once the v2 block-sizing fix (commit 4166cdc) removed the 44%
      sample padding: ScanNet L2 cfull=256 fwd 112 ms vs pq's 127 / v1's
      156 (bwd ties at 362).  v2 computes in f32 from either input dtype.
    - Stage-1 (heads=1, P=1, full-C rows): packed-quad bf16 (ONE half-width
      row copy per sample, ``dfa3d_pallas3``) when the inputs are bf16
      (lossless packing; 29 vs 41 ms) — v1 pair-row for f32 inputs (the
      unpacked quad layout's 4(C+D)-lane rows exceed VMEM at C=256).
    """
    if pallas_available():
        heads_p = num_heads * sampling_locations.shape[3]
        bf16_in = (value_img.dtype == jnp.bfloat16
                   and dpt_img.dtype == jnp.bfloat16)
        if heads_p > 1:
            if valid_counts is not None:
                return dfa3d_attention_pallas_v2c(
                    value_img, dpt_img, sampling_locations,
                    attention_weights,
                    valid_counts.astype(jnp.float32), num_heads)
            return dfa3d_attention_pallas_v2(
                value_img, dpt_img, sampling_locations, attention_weights,
                num_heads)
        # single-head stage-1 (full-C rows): packed-quad when lossless;
        # v1 pair-row otherwise (the unpacked quad layout's 4x(c+D)-lane
        # rows exceed VMEM at c=256)
        if valid_counts is not None:
            op_c = (dfa3d_attention_pallas_pq_s1c if bf16_in
                    else dfa3d_attention_pallas_c)
            return op_c(value_img, dpt_img, sampling_locations,
                        attention_weights,
                        valid_counts.astype(jnp.float32), num_heads)
        op = (dfa3d_attention_pallas_pq_s1 if bf16_in
              else dfa3d_attention_pallas)
        return op(value_img, dpt_img, sampling_locations, attention_weights,
                  num_heads)
    return dfa3d_attention_fast(
        value_img, dpt_img, sampling_locations, attention_weights, num_heads,
        query_chunk,
    )


def msda_2d_attend(value_img_list, sampling_locations, attention_weights,
                   num_heads, query_chunk=None):
    """Hardware-dispatched 2D MSDA (the non-DFA3D config variant's op): the
    uniform-depth reduction in ``msda_2d_fast`` routed through
    ``dfa3d_attend`` so TPU runs get the Pallas kernel."""
    return msda_2d_fast(
        value_img_list, sampling_locations, attention_weights, num_heads,
        query_chunk, attend=dfa3d_attend,
    )
