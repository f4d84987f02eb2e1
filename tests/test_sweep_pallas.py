"""Pallas plane-sweep kernel vs the XLA patch-gather reference (TPU-only;
the XLA path is itself torch-grid-sample-parity-tested in
tests/test_depth_net.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

on_tpu = "TPU" in (getattr(jax.devices()[0], "device_kind", "") or "").upper()
pytestmark = pytest.mark.skipif(not on_tpu, reason="Pallas kernel needs TPU")


def _case(seed=0, n=3, c=32, h=12, w=16, d=5):
    rng = np.random.RandomState(seed)
    src = jnp.asarray(rng.randn(n, c, h, w).astype(np.float32))
    ref = jnp.asarray(rng.randn(n, c, h, w).astype(np.float32))
    projs = []
    for i in range(n):
        e = np.eye(4, dtype=np.float32)
        ang = 0.12 * i
        ca, sa = np.cos(ang), np.sin(ang)
        e[:3, :3] = np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], np.float32)
        e[:3, 3] = [0.15 * i, 0.02 * i, 0.0]
        k = np.eye(4, dtype=np.float32)
        k[0, 0] = k[1, 1] = 14.0
        k[0, 2], k[1, 2] = w / 2, h / 2
        projs.append(k @ e)
    proj = jnp.asarray(np.stack(projs))
    nei = np.roll(np.arange(n), 1)
    depth_values = jnp.asarray(np.linspace(0.5, 3.0, d).astype(np.float32))
    return src, ref, proj, nei, depth_values


def _xla_ref(src_fea, ref_fea, src_proj, ref_proj, depth_values):
    from sgcdet_tpu.models.depth_net import _warp_grid
    from sgcdet_tpu.ops.dfa3d_fast import bilinear_sample_patch

    n, c, h, w = src_fea.shape
    x_eff, y_eff = _warp_grid(src_proj, ref_proj, depth_values, h, w)
    src_img = jnp.transpose(src_fea, (0, 2, 3, 1))
    ref_flat = jnp.transpose(ref_fea.reshape(n, c, -1), (0, 2, 1))

    def one_plane(coords):
        xe, ye = coords
        warped = jax.vmap(bilinear_sample_patch)(src_img, xe, ye)
        return (warped * ref_flat).sum(axis=-1) / jnp.sqrt(jnp.float32(c))

    corr = jax.lax.map(one_plane, (x_eff.transpose(1, 0, 2), y_eff.transpose(1, 0, 2)))
    return corr.transpose(1, 0, 2).reshape(n, -1, h, w)


def test_sweep_kernel_matches_xla():
    from sgcdet_tpu.ops.sweep_pallas import plane_sweep_correlation_pallas

    src, ref, proj, nei, dv = _case()
    got = plane_sweep_correlation_pallas(src[nei], ref, proj[nei], proj, dv)
    want = _xla_ref(src[nei], ref, proj[nei], proj, dv)
    scale = max(float(jnp.abs(want).max()), 1.0)
    assert float(jnp.abs(got - want).max()) < 2e-5 * scale


def test_sweep_kernel_grads_match_xla():
    from sgcdet_tpu.ops.sweep_pallas import plane_sweep_correlation_pallas

    src, ref, proj, nei, dv = _case(seed=2)
    cos_w = jnp.cos(jnp.arange(np.prod((3, 5, 12, 16)), dtype=jnp.float32)
                    ).reshape(3, 5, 12, 16)

    def loss_pal(s, r):
        return jnp.sum(plane_sweep_correlation_pallas(
            s[nei], r, proj[nei], proj, dv) * cos_w)

    def loss_xla(s, r):
        return jnp.sum(_xla_ref(s[nei], r, proj[nei], proj, dv) * cos_w)

    gp = jax.grad(loss_pal, argnums=(0, 1))(src, ref)
    gx = jax.grad(loss_xla, argnums=(0, 1))(src, ref)
    for name, a, b in zip(["d_src", "d_ref"], gx, gp):
        scale = max(float(jnp.abs(a).max()), 1.0)
        assert float(jnp.abs(a - b).max()) < 5e-4 * scale, name


def test_sweep_kernel_bf16_close():
    # bf16 inputs take the PACKED-row forward (_run_fwd_pk): corner pairs
    # packed as bf16 into f32 words, half the gather bytes
    from sgcdet_tpu.ops.sweep_pallas import plane_sweep_correlation_pallas

    src, ref, proj, nei, dv = _case(seed=3)
    want = _xla_ref(src[nei], ref, proj[nei], proj, dv)
    got = plane_sweep_correlation_pallas(
        src[nei].astype(jnp.bfloat16), ref.astype(jnp.bfloat16),
        proj[nei], proj, dv)
    assert got.dtype == jnp.bfloat16
    scale = max(float(jnp.abs(want).max()), 1.0)
    assert float(jnp.abs(got.astype(jnp.float32) - want).max()) < 2e-2 * scale


def test_sweep_packed_exact_vs_bf16_rounded_ref():
    """The packed forward is EXACT on bf16-rounded inputs: compare against
    the XLA reference fed the same rounded values (f32 compute both sides)."""
    from sgcdet_tpu.ops.sweep_pallas import plane_sweep_correlation_pallas

    src, ref, proj, nei, dv = _case(seed=4)
    srcr = src.astype(jnp.bfloat16).astype(jnp.float32)
    refr = ref.astype(jnp.bfloat16).astype(jnp.float32)
    want = _xla_ref(srcr[nei], refr, proj[nei], proj, dv)
    got = plane_sweep_correlation_pallas(
        src[nei].astype(jnp.bfloat16), ref.astype(jnp.bfloat16),
        proj[nei], proj, dv)
    scale = max(float(jnp.abs(want).max()), 1.0)
    # got is bf16 (output cast) — bf16 output rounding is the only delta
    assert float(jnp.abs(got.astype(jnp.float32) - want).max()) < 8e-3 * scale

    # bf16 inputs take the PACKED-row backward too (gather width 2c, update
    # rows f32 4c): grads must match the XLA reference's grads on the same
    # bf16-rounded inputs.  Deltas: the kernel's bf16 OUTPUT rounding
    # perturbs the upstream 2*out factor by ~bf16 eps, and the returned
    # grads are cast to bf16 — both ~1e-2 relative; a wrong corner/offset
    # mapping in the packed scatter would be O(1).
    def loss_pal(s, r):
        return jnp.sum(plane_sweep_correlation_pallas(
            s[nei], r, proj[nei], proj, dv).astype(jnp.float32) ** 2)

    def loss_xla(s, r):
        return jnp.sum(_xla_ref(s[nei], r, proj[nei], proj, dv) ** 2)

    gp = jax.grad(loss_pal, argnums=(0, 1))(
        src.astype(jnp.bfloat16), ref.astype(jnp.bfloat16))
    gx = jax.grad(loss_xla, argnums=(0, 1))(srcr, refr)
    for name, a, b in zip(["d_src", "d_ref"], gx, gp):
        b = b.astype(jnp.float32)
        scale = max(float(jnp.abs(a).max()), 1.0)
        assert float(jnp.abs(a - b).max()) < 2e-2 * scale, name
