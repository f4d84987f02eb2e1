"""v2 (quad-corner-row) Pallas DFA3D kernel vs the jnp oracle (TPU-only).

Same oracle and tolerance discipline as tests/test_dfa3d_pallas.py; the v2
kernel serves the multi-head stage-2 path (heads*P > 1).
"""
import jax
import jax.numpy as jnp
import pytest

from sgcdet_tpu.ops.msda import dfa3d_attention
from tests.test_dfa3d_pallas import _case

on_tpu = "TPU" in (getattr(jax.devices()[0], "device_kind", "") or "").upper()
pytestmark = pytest.mark.skipif(not on_tpu, reason="Pallas kernel needs TPU")


@pytest.mark.parametrize(
    "n,h,w,k,heads,c,p,d",
    [
        (2, 8, 10, 24, 2, 8, 2, 5),       # generic small (padded K)
        (2, 30, 40, 320, 8, 32, 4, 12),   # stage-2 shape
        (1, 30, 40, 6400, 8, 32, 4, 12),  # full L2 query count, 1 cam
    ],
)
def test_v2_forward_matches_oracle(n, h, w, k, heads, c, p, d):
    from sgcdet_tpu.ops.dfa3d_pallas2 import dfa3d_attention_pallas_v2

    value_img, dpt_img, locs, attn = _case(n, h, w, k, heads, c, p, d)
    ref, _ = dfa3d_attention(
        value_img.reshape(n, h * w, heads, c),
        dpt_img.reshape(n, h * w, d),
        ((h, w),),
        locs[:, :, :, None],
        attn[:, :, :, None],
    )
    out = dfa3d_attention_pallas_v2(value_img, dpt_img, locs, attn, heads)
    scale = max(float(jnp.abs(ref).max()), 1.0)
    assert float(jnp.abs(out - ref).max()) < 2e-5 * scale


@pytest.mark.parametrize(
    "n,h,w,k,heads,c,p,d",
    [
        (2, 8, 10, 24, 2, 8, 2, 5),
        (2, 30, 40, 320, 8, 32, 4, 12),
    ],
)
def test_v2_grads_match_oracle(n, h, w, k, heads, c, p, d):
    from sgcdet_tpu.ops.dfa3d_pallas2 import dfa3d_attention_pallas_v2

    value_img, dpt_img, locs, attn = _case(n, h, w, k, heads, c, p, d)
    cos_w = jnp.cos(jnp.arange(n * k * heads * c, dtype=jnp.float32)).reshape(
        n, k, heads * c
    )

    def loss_ref(vi, di, lo, at):
        o, _ = dfa3d_attention(
            vi.reshape(n, h * w, heads, c), di.reshape(n, h * w, d),
            ((h, w),), lo[:, :, :, None], at[:, :, :, None],
        )
        return jnp.sum(o * cos_w)

    def loss_pal(vi, di, lo, at):
        return jnp.sum(dfa3d_attention_pallas_v2(vi, di, lo, at, heads) * cos_w)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(value_img, dpt_img, locs, attn)
    gp = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(value_img, dpt_img, locs, attn)
    for name, a, b in zip(["d_value", "d_dpt", "d_locs", "d_attn"], gr, gp):
        scale = max(float(jnp.abs(a).max()), 1.0)
        assert float(jnp.abs(a - b).max()) < 5e-4 * scale, name


@pytest.mark.parametrize(
    "n,h,w,k,heads,c,p,d",
    [
        (2, 8, 10, 384, 2, 8, 2, 5),      # multiple query blocks per camera
        (2, 30, 40, 4608, 8, 32, 4, 12),  # budgeted stage-2 shape
    ],
)
def test_v2_counted_matches_oracle_on_valid_region(n, h, w, k, heads, c, p, d):
    """Block-skip op: first counts[cam] queries exact vs oracle, zeros after,
    and grads match oracle when the cotangent is masked the way the fusion
    masks (zero past counts) — the exactness contract of the model wiring."""
    from sgcdet_tpu.ops.dfa3d_pallas2 import (
        dfa3d_attention_pallas_v2,
        dfa3d_attention_pallas_v2c,
    )

    value_img, dpt_img, locs, attn = _case(n, h, w, k, heads, c, p, d)
    counts = jnp.asarray([k // 3, k], jnp.float32)[:n]
    ref, _ = dfa3d_attention(
        value_img.reshape(n, h * w, heads, c),
        dpt_img.reshape(n, h * w, d),
        ((h, w),),
        locs[:, :, :, None],
        attn[:, :, :, None],
    )
    out = dfa3d_attention_pallas_v2c(value_img, dpt_img, locs, attn, counts,
                                     heads)
    qmask = (jnp.arange(k)[None, :] < counts[:, None]).astype(jnp.float32)
    scale = max(float(jnp.abs(ref).max()), 1.0)
    assert float((jnp.abs(out - ref) * qmask[..., None]).max()) < 2e-5 * scale

    cos_w = jnp.cos(jnp.arange(n * k * heads * c, dtype=jnp.float32)).reshape(
        n, k, heads * c
    ) * qmask[..., None]  # masked cotangent, like the fusion's

    def loss_ref(vi, di, lo, at):
        o, _ = dfa3d_attention(
            vi.reshape(n, h * w, heads, c), di.reshape(n, h * w, d),
            ((h, w),), lo[:, :, :, None], at[:, :, :, None],
        )
        return jnp.sum(o * cos_w)

    def loss_cnt(vi, di, lo, at):
        return jnp.sum(
            dfa3d_attention_pallas_v2c(vi, di, lo, at, counts, heads) * cos_w)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(value_img, dpt_img, locs, attn)
    gc = jax.grad(loss_cnt, argnums=(0, 1, 2, 3))(value_img, dpt_img, locs, attn)
    for name, a, b in zip(["d_value", "d_dpt", "d_locs", "d_attn"], gr, gc):
        s = max(float(jnp.abs(a).max()), 1.0)
        assert float(jnp.abs(a - b).max()) < 5e-4 * s, name

    # full counts == the uncounted op, everywhere
    full = dfa3d_attention_pallas_v2(value_img, dpt_img, locs, attn, heads)
    out_full = dfa3d_attention_pallas_v2c(
        value_img, dpt_img, locs, attn, jnp.full((n,), k, jnp.float32), heads)
    assert float(jnp.abs(out_full - full).max()) == 0.0


def test_v2_bf16_inputs_close():
    from sgcdet_tpu.ops.dfa3d_pallas2 import dfa3d_attention_pallas_v2

    n, h, w, k, heads, c, p, d = 2, 8, 10, 24, 2, 8, 2, 5
    value_img, dpt_img, locs, attn = _case(n, h, w, k, heads, c, p, d)
    ref, _ = dfa3d_attention(
        value_img.reshape(n, h * w, heads, c), dpt_img.reshape(n, h * w, d),
        ((h, w),), locs[:, :, :, None], attn[:, :, :, None],
    )
    out = dfa3d_attention_pallas_v2(
        value_img.astype(jnp.bfloat16), dpt_img.astype(jnp.bfloat16),
        locs, attn, heads,
    )
    assert out.dtype == jnp.bfloat16
    scale = max(float(jnp.abs(ref).max()), 1.0)
    assert float(jnp.abs(out.astype(jnp.float32) - ref).max()) < 2e-2 * scale


def test_v2_bf16_quad_exact_and_grads():
    """bf16 inputs now build a bf16 QUAD image (half the gather bytes) with
    f32 in-register corner math: vs the oracle fed the same bf16-rounded
    inputs the forward differs only by the bf16 OUTPUT cast, and grads match
    to f32 ordering + bf16-grad-cast noise."""
    from sgcdet_tpu.ops.dfa3d_pallas2 import dfa3d_attention_pallas_v2

    n, h, w, k, heads, c, p, d = 2, 30, 40, 320, 8, 32, 4, 12
    value_img, dpt_img, locs, attn = _case(n, h, w, k, heads, c, p, d)
    vr = value_img.astype(jnp.bfloat16).astype(jnp.float32)
    dr = dpt_img.astype(jnp.bfloat16).astype(jnp.float32)
    ref, _ = dfa3d_attention(
        vr.reshape(n, h * w, heads, c), dr.reshape(n, h * w, d),
        ((h, w),), locs[:, :, :, None], attn[:, :, :, None],
    )
    out = dfa3d_attention_pallas_v2(
        value_img.astype(jnp.bfloat16), dpt_img.astype(jnp.bfloat16),
        locs, attn, heads,
    )
    scale = max(float(jnp.abs(ref).max()), 1.0)
    assert float(jnp.abs(out.astype(jnp.float32) - ref).max()) < 8e-3 * scale

    def loss_pal(vi, di, lo, at):
        return jnp.sum(dfa3d_attention_pallas_v2(
            vi, di, lo, at, heads).astype(jnp.float32) ** 2)

    def loss_ref(vi, di, lo, at):
        o, _ = dfa3d_attention(
            vi.reshape(n, h * w, heads, c), di.reshape(n, h * w, d),
            ((h, w),), lo[:, :, :, None], at[:, :, :, None],
        )
        return jnp.sum(o.reshape(n, k, heads * c) ** 2)

    gp = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(
        value_img.astype(jnp.bfloat16), dpt_img.astype(jnp.bfloat16),
        locs, attn)
    gx = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(vr, dr, locs, attn)
    for name, a, b in zip(["d_value", "d_dpt", "d_loc", "d_attn"], gx, gp):
        b = b.astype(jnp.float32)
        scale = max(float(jnp.abs(a).max()), 1.0)
        assert float(jnp.abs(a - b).max()) < 2e-2 * scale, name
