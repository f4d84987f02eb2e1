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

from .dfa3d_fast import dfa3d_attention_fast, msda_2d_fast
from .dfa3d_pallas import (
    dfa3d_attention_pallas,
    _fwd_impl as _v1_fwd_impl,
    _vjp_bwd as _vjp_bwd_v1,
)
from .dfa3d_pallas2 import dfa3d_attention_pallas_v2, _vjp_bwd_v2
from .dfa3d_pallas3 import _fwd_impl_pq


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def dfa3d_attention_pallas_mixed(value_img, dpt_img, sampling_locations,
                                 attention_weights, num_heads):
    """Best-of-both Pallas DFA3D: v1 pair-row forward + v2 quad-corner
    backward.  With 8 row copies per gather-loop iteration the v1 forward is
    the fastest (155 ms vs v2's 168 at the ScanNet L2 stage-2 shape) while
    the v2 backward remains ~1.4x faster than v1's (experiments/
    bench_pallas2.py, 2026-08-17).  Both store the same residuals (the raw
    primal inputs), so the VJP halves compose directly."""
    out, _ = _v1_fwd_impl(value_img, dpt_img, sampling_locations,
                          attention_weights, num_heads)
    return out


# defvjp's fwd must return (out, residuals); v1's _fwd_impl already does,
# and both kernels store the same residuals (the raw primal inputs)
dfa3d_attention_pallas_mixed.defvjp(_v1_fwd_impl, _vjp_bwd_v2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def dfa3d_attention_pallas_pq_s2(value_img, dpt_img, sampling_locations,
                                 attention_weights, num_heads):
    """Packed-quad bf16 forward (ONE half-width row copy per sample,
    dfa3d_pallas3) + v2 quad-corner backward.  For bf16 inputs the packing
    is lossless; the backward recomputes from the exact primals."""
    out, _ = _fwd_impl_pq(value_img, dpt_img, sampling_locations,
                          attention_weights, num_heads)
    return out


dfa3d_attention_pallas_pq_s2.defvjp(_fwd_impl_pq, _vjp_bwd_v2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def dfa3d_attention_pallas_pq_s1(value_img, dpt_img, sampling_locations,
                                 attention_weights, num_heads):
    """Packed-quad bf16 forward + v1 pair-row backward (stage-1 shapes:
    heads=1, P=1 — the v2 per-head quad backward does not apply there)."""
    out, _ = _fwd_impl_pq(value_img, dpt_img, sampling_locations,
                          attention_weights, num_heads)
    return out


dfa3d_attention_pallas_pq_s1.defvjp(_fwd_impl_pq, _vjp_bwd_v1)

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
                 num_heads, query_chunk=None):
    """Fused depth-weighted deformable attention; see dfa3d_fast for shapes."""
    if pallas_available():
        heads_p = num_heads * sampling_locations.shape[3]
        if heads_p > 1:
            # multi-head stage-2.  The v2 quad-corner backward is ~1.4x
            # faster everywhere; the faster FORWARD depends on the total
            # channel width: wide rows (cfull>=256, ScanNet embed_dims=256)
            # amortize v1's pair-row gathers (155 vs 168 ms at the ScanNet
            # L2 shape) while narrow rows (cfull=128, the _LARGE configs)
            # favor v2's 4(c+D)-lane quad gathers (732 vs 1075 ms at the
            # large L2 shape) — experiments/bench_pallas2.py + /tmp/ab_large
            # measurements, 2026-08-17.
            if value_img.shape[-1] >= 256:
                return dfa3d_attention_pallas_mixed(
                    value_img, dpt_img, sampling_locations, attention_weights,
                    num_heads,
                )
            return dfa3d_attention_pallas_v2(
                value_img, dpt_img, sampling_locations, attention_weights,
                num_heads,
            )
        # single-head stage-1 (full-C rows): pair-row kernel; the quad
        # layout's 4x(c+D)-lane rows exceed VMEM at c=256
        return dfa3d_attention_pallas(
            value_img, dpt_img, sampling_locations, attention_weights, num_heads
        )
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
