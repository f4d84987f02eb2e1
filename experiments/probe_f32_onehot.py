"""Is an f32 one-hot selection matmul bit-exact on the MXU?

The windowed backward scatter is ``dimg[win] += S.T @ U`` with f32 U (update
rows are true f32 gradients).  TPU f32 matmuls decompose into bf16 passes;
selection by 1.0 must reproduce U's rows bit-for-bit for the windowed
scatter to match the copy-loop scatter.  Also checks the accumulate variant
(two chunks hitting the same row) against a plain sum.

Run on the TPU: python -m experiments.probe_f32_onehot
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(rel_ref, u_ref, out_ref, *, wwin, cm, nchunk):
    out_ref[:] = jnp.zeros_like(out_ref)

    def body(ci, _):
        off = ci * cm
        rel = rel_ref[pl.ds(off, cm), :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (cm, wwin), 1)
        s = (iota == rel).astype(jnp.float32)
        u = u_ref[pl.ds(off, cm), :]
        out_ref[:] += jnp.dot(s.T, u, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
        return 0

    jax.lax.fori_loop(0, nchunk, body, 0, unroll=False)


def scatter(u, rows, wwin):
    m, l = u.shape
    cm = 256
    return pl.pallas_call(
        functools.partial(_kernel, wwin=wwin, cm=cm, nchunk=m // cm),
        out_shape=jax.ShapeDtypeStruct((wwin, l), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(rows.reshape(m, 1), u)


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    wwin, m, l = 256, 2048, 1072
    key = jax.random.PRNGKey(0)
    # adversarial f32 values: wide exponent range + subnormal-ish tails
    u = (jax.random.normal(key, (m, l), jnp.float32)
         * jnp.exp2(jax.random.randint(
             jax.random.PRNGKey(1), (m, 1), -40, 40).astype(jnp.float32)))
    rows = jax.random.randint(jax.random.PRNGKey(2), (m,), 0, wwin)
    out = jax.jit(functools.partial(scatter, wwin=wwin))(u, rows)
    ref = jax.ops.segment_sum(u, rows, num_segments=wwin)
    bits_out = np.asarray(out).view(np.uint32)
    bits_ref = np.asarray(ref).view(np.uint32)
    n_diff = int((bits_out != bits_ref).sum())
    err = float(jnp.max(jnp.abs(out - ref)))
    rel = err / float(jnp.max(jnp.abs(ref)))
    print(f"f32 one-hot S.T@U accumulate: {n_diff} differing bit-patterns "
          f"of {bits_ref.size}; max abs {err:.3e} rel {rel:.3e}")
    # NOTE: segment_sum may accumulate in a different order; bitwise match is
    # only expected when each row receives at most ~1 update — check that too
    rows_u = jnp.arange(m) % wwin  # each row hit m/wwin times, ordered
    out2 = jax.jit(functools.partial(scatter, wwin=wwin))(u, rows_u)
    ref2 = jax.ops.segment_sum(u, rows_u, num_segments=wwin)
    d2 = int((np.asarray(out2).view(np.uint32)
              != np.asarray(ref2).view(np.uint32)).sum())
    print(f"ordered variant: {d2} differing bit-patterns")
    # pure selection (each window row hit exactly once, no accumulation)
    perm = jax.random.permutation(jax.random.PRNGKey(3), wwin)
    out3 = jax.jit(functools.partial(scatter, wwin=wwin))(
        u[:wwin], perm)
    ref3 = jnp.zeros((wwin, l), jnp.float32).at[perm].set(u[:wwin])
    d3 = int((np.asarray(out3).view(np.uint32)
              != np.asarray(ref3).view(np.uint32)).sum())
    print(f"pure selection (no accumulation): {d3} differing bit-patterns")


if __name__ == "__main__":
    main()
