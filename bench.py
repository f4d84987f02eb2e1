"""Benchmark: multi-view scenes/sec on the SGCDet inference path
(backbone -> FPN -> depth -> lifting -> neck -> head) on whatever device
jax sees (the driver runs this on one real TPU chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Headline: SGCDet ScanNet, 40 views, an indoor-walkthrough trajectory (the
cameras move INSIDE the volume like a real ScanNet capture) with the
provably-exact auto-derived visibility budget.  This is the reference's own
protocol: its lifting rebatches each camera to exactly its visible queries
(deformable_cross_attention.py:759-783, padded to the per-scene max — the
same bound our budget uses), and the BASELINE.md reference estimate's
kernel term likewise counts visible samples.  The budget is exact by
construction (per-camera visible counts over ALL voxels of a level bound
any top-k subset's count; utils/visibility.py, exactness tested in
tests/test_visibility_budget.py), so the headline output is bit-identical
to the dense path.  The dense worst case (orbit trajectory, every camera
sees everything, no compaction) is reported in `extra`.

On-chip correctness checks folded into the run (the kernel test suite is
TPU-gated and skipped in CPU CI): a Pallas-vs-oracle DFA3D case (asserted),
plus per-scene derivation of the banded-Gram sweep's exact band
(utils/visibility.required_sweep_band — the banded path is used only when
its rig-derived exact band is small enough to pay; rigs that need the full
image height fall back to the always-exact gather kernel).

vs_baseline: measured scenes/sec divided by the documented reference
estimate (16 scenes/sec at 40 views on one RTX 3090 — component roofline +
overhead model with stated assumptions and +-50% error bars; see
BASELINE.md "Reference throughput estimate").  No GPU is reachable here and
the reference publishes no throughput numbers, so this denominator is an
estimate, not a measurement — the JSON says so via `baseline_kind`.

Timing: the axon TPU tunnel adds ~28 ms per host sync and its
block_until_ready can return early, so each figure is measured as the slope
between pipelined short and long runs with a single forcing host fetch at
the end (device time, sync overhead cancelled).
"""
import dataclasses
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

# documented estimates / measurements (see BASELINE.md)
REF_EST_40VIEW = 16.0        # scenes/sec, RTX 3090 estimate, 40 views
REF_EST_100VIEW = 9.0        # scenes/sec, RTX 3090 estimate, 100 views
XLA_PATH_40VIEW = 1.0 / 0.637  # scenes/sec, this repo w/o Pallas kernel, v5e, 2026-08-16


def derive_sweep_band(scene, cfg, n_views, max_paying=28):
    """Rig-derived exact band for the banded-Gram plane sweep, or None when
    the rig needs a band too tall to pay (utils/visibility.
    required_sweep_band — exact by construction; rigs with strong
    inter-neighbor rotation or z~0 plane crossings need the full height)."""
    from sgcdet_tpu.utils.visibility import required_sweep_band

    h, w = cfg.data.img_shape[0] // 4, cfg.data.img_shape[1] // 4
    band = required_sweep_band(np.asarray(scene["proj_feat4"]), n_views,
                               cfg.model, (h, w))
    return band if band <= max_paying else None


def scene_time(cfg_name, n_views, visibility_budget=None, trajectory="ring",
               check_band=False):
    """Measured seconds/scene for one config via the pipelined slope method.

    visibility_budget: None (dense/exact), a float fraction, or "auto" — the
    provably-exact per-camera bound derived from this scene's geometry
    (utils/visibility.py); "auto" keeps the lifting bit-identical to dense.
    trajectory: "ring" (orbit, sees everything) or "indoor" (walkthrough
    inside the volume — realistic partial per-camera visibility).
    Returns (seconds_per_scene, info dict).
    """
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_scene
    from sgcdet_tpu.configs.config import get_config
    from sgcdet_tpu.models import SGCDet

    cfg = get_config(cfg_name)
    scene = _example_scene(cfg.data.img_shape, cfg.data.pad_size, n_views,
                           trajectory=trajectory)
    info = {}
    band = derive_sweep_band(scene, cfg, n_views) if check_band else None
    info["sweep_band"] = band
    if visibility_budget == "auto":
        from sgcdet_tpu.utils.visibility import derive_visibility_budget

        visibility_budget = derive_visibility_budget(
            [(np.asarray(scene["origin"]), np.asarray(scene["proj_img"]))],
            cfg.data.img_shape, cfg.model,
        )
        info["auto_budget"] = round(float(visibility_budget), 4)
        if visibility_budget >= 1.0:
            visibility_budget = None
    mcfg = dataclasses.replace(cfg.model, visibility_budget=visibility_budget,
                               sweep_band=band)
    model = SGCDet(cfg=mcfg, img_shape=cfg.data.img_shape, query_chunk=100)
    init = jax.jit(lambda r, a, b, c, d: model.init(
        {"params": r}, a, b, c, d, train=False))
    variables = init(jax.random.PRNGKey(0), scene["imgs"], scene["proj_img"],
                     scene["proj_feat4"], scene["origin"])

    @jax.jit
    def fwd(v, imgs, proj_img, proj4, origin):
        out = model.apply(v, imgs, proj_img, proj4, origin, train=False)
        return sum(jnp.sum(jnp.abs(x))
                   for x in jax.tree_util.tree_leaves(out["head_outs"]))

    args = (variables, scene["imgs"], scene["proj_img"], scene["proj_feat4"],
            scene["origin"])
    s = float(fwd(*args))  # compile + warm; host fetch forces completion
    assert np.isfinite(s), "non-finite forward output"

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fwd(*args)
        float(o)
        return time.perf_counter() - t0

    lo = min(run(1), run(1))
    hi = min(run(5), run(5))
    return (hi - lo) / 4.0, info


def kernel_oracle_check():
    """One small Pallas-vs-jnp-oracle case executed on the bench chip, so
    kernel correctness ON HARDWARE is recorded in the bench JSON (the kernel
    test suite is TPU-gated and skipped in the CPU CI run).  Returns the max
    abs error over both kernel variants (fwd), or None off-TPU."""
    import jax
    import jax.numpy as jnp

    from sgcdet_tpu.ops.dfa3d import pallas_available
    from sgcdet_tpu.ops.msda import dfa3d_attention

    if not pallas_available():
        return None
    from sgcdet_tpu.ops.dfa3d_pallas import dfa3d_attention_pallas
    from sgcdet_tpu.ops.dfa3d_pallas2 import dfa3d_attention_pallas_v2

    n, h, w, k, heads, c, p, d = 2, 10, 12, 40, 4, 16, 2, 6
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    value_img = jax.random.normal(ks[0], (n, h, w, heads * c), jnp.float32)
    dpt_img = jax.nn.softmax(jax.random.normal(ks[1], (n, h, w, d)), axis=-1)
    locs = jax.random.uniform(ks[2], (n, k, heads, p, 3), minval=-0.1, maxval=1.1)
    attn = jax.nn.softmax(jax.random.normal(ks[3], (n, k, heads, p)), axis=-1)
    ref, _ = dfa3d_attention(
        value_img.reshape(n, h * w, heads, c), dpt_img.reshape(n, h * w, d),
        ((h, w),), locs[:, :, :, None], attn[:, :, :, None],
    )
    err = 0.0
    for fn in (dfa3d_attention_pallas, dfa3d_attention_pallas_v2):
        out = fn(value_img, dpt_img, locs, attn, heads)
        err = max(err, float(jnp.abs(out - ref).max()))
    return err


def main():
    import sys
    t0 = time.perf_counter()
    # compiles through the axon tunnel take 1.5-4.5 min each and do not hit
    # the persistent cache; run the extra protocol variants best-effort under
    # a soft deadline so the headline JSON always lands
    deadline = float(os.environ.get("BENCH_DEADLINE_SEC", "1500"))

    def log(msg):
        print(f"[bench +{time.perf_counter()-t0:.0f}s] {msg}", file=sys.stderr)

    kerr = kernel_oracle_check()
    log(f"pallas kernel oracle check: max err {kerr}")
    if kerr is not None:
        assert kerr < 2e-4, f"Pallas kernel drifted from oracle: {kerr}"

    t_40, info = scene_time("scannet", 40, visibility_budget="auto",
                            trajectory="indoor", check_band=True)
    log(f"scannet 40v indoor+auto-exact-budget: {t_40:.3f}s/scene ({info})")
    sps_40 = 1.0 / t_40

    extra = {
        "baseline_kind": "estimate",
        "headline_protocol": "indoor walkthrough, auto exact visibility "
                             "budget (bit-identical to dense)",
        "pallas_kernel_oracle_maxerr": kerr,
        "baseline_scenes_per_sec_40views_rtx3090_est": REF_EST_40VIEW,
        "vs_same_chip_xla_path_measured": round(sps_40 / XLA_PATH_40VIEW, 4),
        **{f"headline_{k}": v for k, v in info.items()},
        # measured 2026-08-18 on v5e (banded-Gram sweep + v2 dispatch rev;
        # keys re-measured live land in `live` and flip extras_kind):
        "scannet_40view_dense_ring_scenes_per_sec": 4.0744,
        "scannet_100view_eval_scenes_per_sec": 1.9033,
        "scannet200_large_40view_scenes_per_sec": 1.2003,
        "extras_kind": "cached_2026-08-18_r3c",
    }
    variants = [
        # dense worst case: orbit rig, every camera sees ~everything
        ("scannet_40view_dense_ring_scenes_per_sec", "scannet", 40, None,
         "ring"),
        # released eval protocol (100 views), realistic trajectory
        ("scannet_100view_eval_scenes_per_sec", "scannet", 100, "auto",
         "indoor"),
        ("scannet200_large_40view_scenes_per_sec", "scannet200_large", 40,
         "auto", "indoor"),
    ]
    live = set()
    for key, cfg_name, n_views, budget, traj in variants:
        if time.perf_counter() - t0 > deadline - 240:
            log(f"deadline: skipping re-measure of {key}")
            break
        t, vinfo = scene_time(cfg_name, n_views, visibility_budget=budget,
                              trajectory=traj, check_band=True)
        log(f"{key}: {t:.3f}s/scene ({vinfo})")
        extra[key] = round(1.0 / t, 4)
        live.add(key)
    if len(live) == len(variants):
        extra["extras_kind"] = "measured_live"
    # derived ratio: only pair a live numerator with the estimate denominator;
    # a cached numerator gets an explicitly _cached-suffixed key
    ratio = round(extra["scannet_100view_eval_scenes_per_sec"] / REF_EST_100VIEW, 4)
    if "scannet_100view_eval_scenes_per_sec" in live:
        extra["scannet_100view_vs_baseline_est"] = ratio
    else:
        extra["scannet_100view_vs_baseline_est_cached"] = ratio

    print(json.dumps({
        "metric": "multiview_scenes_per_sec_40views",
        "value": round(sps_40, 4),
        "unit": "scenes/sec/chip",
        "vs_baseline": round(sps_40 / REF_EST_40VIEW, 4),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
