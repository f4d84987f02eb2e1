"""Pallas DFA3D kernel vs the jnp oracle (TPU-only; skipped on CPU).

The CPU test suite runs the XLA patch-gather path (tests/test_dfa3d_fast.py);
this file exercises the Mosaic kernel itself and must run on real TPU
hardware:  JAX_PLATFORMS=axon python -m pytest tests/test_dfa3d_pallas.py
(mirrors the reference's CUDA-gated tests, e.g.
/root/reference/packages/mmdetection3d/tests/test_metrics/test_indoor_eval.py:10).
"""
import jax
import jax.numpy as jnp
import pytest

from sgcdet_tpu.ops.msda import dfa3d_attention

on_tpu = "TPU" in (getattr(jax.devices()[0], "device_kind", "") or "").upper()
pytestmark = pytest.mark.skipif(not on_tpu, reason="Pallas kernel needs TPU")


def _case(n, h, w, k, heads, c, p, d, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    value_img = jax.random.normal(k1, (n, h, w, heads * c), jnp.float32)
    dpt_img = jax.nn.softmax(jax.random.normal(k2, (n, h, w, d)), axis=-1)
    locs = jax.random.uniform(k3, (n, k, heads, p, 3), minval=-0.15, maxval=1.15)
    attn = jax.nn.softmax(jax.random.normal(k4, (n, k, heads, p)), axis=-1)
    return value_img, dpt_img, locs, attn


@pytest.mark.parametrize(
    "n,h,w,k,heads,c,p,d",
    [
        (2, 8, 10, 24, 2, 8, 2, 5),       # generic small
        (3, 15, 20, 40, 1, 64, 1, 12),    # stage-1 shape (heads=1, P=1)
        (2, 30, 40, 320, 8, 32, 4, 12),   # stage-2 shape
    ],
)
def test_forward_matches_oracle(n, h, w, k, heads, c, p, d):
    from sgcdet_tpu.ops.dfa3d_pallas import dfa3d_attention_pallas

    value_img, dpt_img, locs, attn = _case(n, h, w, k, heads, c, p, d)
    ref, _ = dfa3d_attention(
        value_img.reshape(n, h * w, heads, c),
        dpt_img.reshape(n, h * w, d),
        ((h, w),),
        locs[:, :, :, None],
        attn[:, :, :, None],
    )
    out = dfa3d_attention_pallas(value_img, dpt_img, locs, attn, heads)
    scale = max(float(jnp.abs(ref).max()), 1.0)
    assert float(jnp.abs(out - ref).max()) < 2e-5 * scale


@pytest.mark.parametrize(
    "n,h,w,k,heads,c,p,d",
    [
        (2, 8, 10, 24, 2, 8, 2, 5),
        (2, 15, 20, 64, 1, 64, 1, 12),
        (2, 30, 40, 320, 8, 32, 4, 12),
    ],
)
def test_grads_match_oracle(n, h, w, k, heads, c, p, d):
    from sgcdet_tpu.ops.dfa3d_pallas import dfa3d_attention_pallas

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
        return jnp.sum(dfa3d_attention_pallas(vi, di, lo, at, heads) * cos_w)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(value_img, dpt_img, locs, attn)
    gp = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(value_img, dpt_img, locs, attn)
    for name, a, b in zip(["d_value", "d_dpt", "d_locs", "d_attn"], gr, gp):
        scale = max(float(jnp.abs(a).max()), 1.0)
        assert float(jnp.abs(a - b).max()) < 5e-4 * scale, name


def test_bf16_inputs_close():
    from sgcdet_tpu.ops.dfa3d_pallas import dfa3d_attention_pallas

    n, h, w, k, heads, c, p, d = 2, 8, 10, 24, 2, 8, 2, 5
    value_img, dpt_img, locs, attn = _case(n, h, w, k, heads, c, p, d)
    ref, _ = dfa3d_attention(
        value_img.reshape(n, h * w, heads, c), dpt_img.reshape(n, h * w, d),
        ((h, w),), locs[:, :, :, None], attn[:, :, :, None],
    )
    out = dfa3d_attention_pallas(
        value_img.astype(jnp.bfloat16), dpt_img.astype(jnp.bfloat16),
        locs, attn, heads,
    )
    assert out.dtype == jnp.bfloat16
    scale = max(float(jnp.abs(ref).max()), 1.0)
    assert float(jnp.abs(out.astype(jnp.float32) - ref).max()) < 2e-2 * scale


@pytest.mark.parametrize(
    "n,h,w,k,heads,c,p,d",
    [
        (2, 8, 10, 24, 2, 8, 2, 5),
        (2, 30, 40, 320, 8, 32, 4, 12),   # stage-2 shape (the dispatch target)
    ],
)
def test_mixed_fwd_and_grads_match_oracle(n, h, w, k, heads, c, p, d):
    """v1-forward + v2-backward composite op used by the stage-2 dispatch."""
    from experiments.dfa3d_variants import dfa3d_attention_pallas_mixed

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

    def loss_mix(vi, di, lo, at):
        return jnp.sum(
            dfa3d_attention_pallas_mixed(vi, di, lo, at, heads) * cos_w
        )

    ref, _ = dfa3d_attention(
        value_img.reshape(n, h * w, heads, c), dpt_img.reshape(n, h * w, d),
        ((h, w),), locs[:, :, :, None], attn[:, :, :, None],
    )
    out = dfa3d_attention_pallas_mixed(value_img, dpt_img, locs, attn, heads)
    scale = max(float(jnp.abs(ref).max()), 1.0)
    assert float(jnp.abs(out - ref).max()) < 2e-5 * scale

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(value_img, dpt_img, locs, attn)
    gp = jax.grad(loss_mix, argnums=(0, 1, 2, 3))(value_img, dpt_img, locs, attn)
    for name, a, b in zip(["d_value", "d_dpt", "d_locs", "d_attn"], gr, gp):
        scale = max(float(jnp.abs(a).max()), 1.0)
        assert float(jnp.abs(a - b).max()) < 5e-4 * scale, name


@pytest.mark.parametrize(
    "n,h,w,k,heads,c,p,d,bf16",
    [
        (3, 15, 20, 4608, 1, 256, 1, 12, False),  # stage-1 f32 -> v1 counted
        (3, 15, 20, 4608, 1, 256, 1, 12, True),   # stage-1 bf16 -> pq counted
        (2, 8, 10, 384, 2, 8, 2, 5, False),       # multi-head v1 counted
    ],
)
def test_counted_stage1_matches_oracle_on_valid_region(n, h, w, k, heads, c,
                                                       p, d, bf16):
    """Counted v1/pq ops: exact on the first counts[cam] queries, zeros
    after, grads matching oracle under fusion-style masked cotangents."""
    from sgcdet_tpu.ops.dfa3d_pallas import dfa3d_attention_pallas_c
    from sgcdet_tpu.ops.dfa3d import dfa3d_attention_pallas_pq_s1c

    value_img, dpt_img, locs, attn = _case(n, h, w, k, heads, c, p, d)
    if bf16:
        value_img = value_img.astype(jnp.bfloat16)
        dpt_img = dpt_img.astype(jnp.bfloat16)
    counts = jnp.asarray([k // 3, k, max(k // 7, 1)], jnp.float32)[:n]
    op = dfa3d_attention_pallas_pq_s1c if bf16 else dfa3d_attention_pallas_c
    ref, _ = dfa3d_attention(
        value_img.astype(jnp.float32).reshape(n, h * w, heads, c),
        dpt_img.astype(jnp.float32).reshape(n, h * w, d),
        ((h, w),),
        locs[:, :, :, None],
        attn[:, :, :, None],
    )
    out = op(value_img, dpt_img, locs, attn, counts, heads)
    qmask = (jnp.arange(k)[None, :] < counts[:, None]).astype(jnp.float32)
    scale = max(float(jnp.abs(ref).max()), 1.0)
    tol = 2e-2 if bf16 else 2e-5
    err = float((jnp.abs(out.astype(jnp.float32) - ref)
                 * qmask[..., None]).max())
    assert err < tol * scale

    cos_w = jnp.cos(jnp.arange(n * k * heads * c, dtype=jnp.float32)).reshape(
        n, k, heads * c
    ) * qmask[..., None]

    def loss_ref(vi, di, lo, at):
        o, _ = dfa3d_attention(
            vi.astype(jnp.float32).reshape(n, h * w, heads, c),
            di.astype(jnp.float32).reshape(n, h * w, d),
            ((h, w),), lo[:, :, :, None], at[:, :, :, None],
        )
        return jnp.sum(o * cos_w)

    def loss_cnt(vi, di, lo, at):
        return jnp.sum(
            op(vi, di, lo, at, counts, heads).astype(jnp.float32) * cos_w)

    gr = jax.grad(loss_ref, argnums=(2, 3))(value_img, dpt_img, locs, attn)
    gc = jax.grad(loss_cnt, argnums=(2, 3))(value_img, dpt_img, locs, attn)
    gtol = 2e-2 if bf16 else 5e-4
    for name, a, b in zip(["d_locs", "d_attn"], gr, gc):
        s = max(float(jnp.abs(a).max()), 1.0)
        assert float(jnp.abs(a - b).max()) < gtol * s, name
