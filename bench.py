"""Benchmark: multi-view scenes/sec on the SGCDet inference path
(backbone -> FPN -> depth -> lifting -> neck -> head) on whatever device
jax sees (the driver runs this on one real TPU chip).

Prints JSON lines {"metric", "value", "unit", "vs_baseline", "extra"};
the LAST line printed is always the most complete result.  Robustness
contract (round-3 bench died rc=124 with no output at all — a hung compile
through the flaky axon TPU tunnel):

  * a provisional JSON line (cached values, ``value_kind: "cached_*"``) is
    printed BEFORE jax is even imported, so any later hang still leaves a
    parseable result;
  * every stage (headline, kernel oracle check, train step, protocol
    variants) runs under its own remaining-time budget and a try/except —
    a failed or skipped stage records an ``*_error``/skip note and the run
    continues;
  * a daemon watchdog thread re-emits the best-known JSON and hard-exits 0
    shortly before the soft deadline (``BENCH_DEADLINE_SEC``, default
    1380 s) — this fires even if the main thread is stuck inside a compile
    RPC that never returns;
  * SIGTERM/SIGINT emit the best-known JSON before dying.

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
import signal
import sys
import threading
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

# documented estimates / measurements (see BASELINE.md)
REF_EST_40VIEW = 16.0        # scenes/sec, RTX 3090 estimate, 40 views
REF_EST_100VIEW = 9.0        # scenes/sec, RTX 3090 estimate, 100 views
XLA_PATH_40VIEW = 1.0 / 0.637  # scenes/sec, this repo w/o Pallas kernel, v5e, 2026-08-16

T0 = time.perf_counter()
DEADLINE = float(os.environ.get("BENCH_DEADLINE_SEC", "1380"))

# cached on-chip measurements (v5e, depth-remat-drop rev, 2026-08-21)
# — every key re-measured live this run is overwritten and listed in
# extra["measured_live_keys"]
CACHED = {
    "scannet_40view_dense_ring_scenes_per_sec": 4.2874,
    "scannet_100view_eval_scenes_per_sec": 2.7062,
    "scannet200_large_40view_scenes_per_sec": 1.3103,
    "train_scenes_per_sec_40views": 2.4524,
}
CACHED_HEADLINE = 6.8581  # indoor walkthrough + auto exact budget, 2026-08-21

_LOCK = threading.Lock()
_RESULT = {
    "metric": "multiview_scenes_per_sec_40views",
    "value": CACHED_HEADLINE,
    "unit": "scenes/sec/chip",
    "vs_baseline": round(CACHED_HEADLINE / REF_EST_40VIEW, 4),
    "extra": {
        "baseline_kind": "estimate",
        "headline_protocol": "indoor walkthrough, auto exact visibility "
                             "budget (bit-identical to dense)",
        "value_kind": "cached_2026-08-19",
        "baseline_scenes_per_sec_40views_rtx3090_est": REF_EST_40VIEW,
        # cross-scene pipelining A/B (round-3 verdict 2a): measured NEGATIVE
        # on the v5e 2026-08-20 (experiments/bench_batch2.py) — 2-scene
        # jit(vmap) runs 339.0 ms = 5.90 scenes/s vs 2x155.8 ms single
        # (0.919x); one TPU core executes one program serially, so there is
        # no idle engine for the trunk/lifting overlap.  Not shipped.
        "batch2_scenes_per_sec_measured_2026_08_20": 5.90,
        "batch2_verdict": "negative_0.92x_vs_2x_single_not_shipped",
        "measured_live_keys": [],
        **CACHED,
    },
}


def log(msg):
    print(f"[bench +{time.perf_counter() - T0:.0f}s] {msg}", file=sys.stderr,
          flush=True)


def emit():
    """Print the best-known JSON line (the driver parses the last one)."""
    with _LOCK:
        print(json.dumps(_RESULT), flush=True)


def update(value=None, live_key=None, **extra):
    with _LOCK:
        if value is not None:
            _RESULT["value"] = round(value, 4)
            _RESULT["vs_baseline"] = round(value / REF_EST_40VIEW, 4)
            _RESULT["extra"]["value_kind"] = "measured_live"
        if live_key is not None:
            _RESULT["extra"]["measured_live_keys"].append(live_key)
        _RESULT["extra"].update(extra)
    emit()


def _watchdog():
    time.sleep(max(DEADLINE - 45 - (time.perf_counter() - T0), 1.0))
    log("watchdog: soft deadline reached; emitting best-known JSON, exit 0")
    emit()
    os._exit(0)


def _on_signal(signum, frame):  # pragma: no cover - signal path
    log(f"signal {signum}: emitting best-known JSON, exit 0")
    emit()
    os._exit(0)


def remaining():
    return DEADLINE - (time.perf_counter() - T0)


def stage(name, min_budget_s, fn):
    """Run one bench stage if enough soft-deadline budget remains; record
    failures in the JSON instead of crashing the whole bench."""
    if remaining() < min_budget_s:
        log(f"skip {name}: {remaining():.0f}s left < {min_budget_s}s budget")
        update(**{f"{name}_skipped": "deadline"})
        return None
    t = time.perf_counter()
    try:
        r = fn()
        log(f"{name} done in {time.perf_counter() - t:.0f}s")
        return r
    except Exception as e:  # noqa: BLE001 - bench must survive any stage
        log(f"{name} FAILED after {time.perf_counter() - t:.0f}s: {e!r}")
        update(**{f"{name}_error": repr(e)[:300]})
        return None


def derive_sweep_band(scene, cfg, n_views, max_paying=20):
    """Rig-derived exact band for the banded-Gram plane sweep, or None when
    the rig needs a band too tall to pay (utils/visibility.
    required_sweep_band — exact by construction; rigs with strong
    inter-neighbor rotation or z~0 plane crossings need the full height).
    Threshold re-measured 2026-08-21 after the gather kernel's transposed-
    window fix: at 100 views, band 22 runs 59.2 ms/call vs the gather
    kernel's 56.5 — banded pays only below ~20 rows now (was 28)."""
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
        from sgcdet_tpu.utils.visibility import derive_visibility_budgets

        visibility_budget = derive_visibility_budgets(
            [(np.asarray(scene["origin"]), np.asarray(scene["proj_img"]))],
            cfg.data.img_shape, cfg.model,
        )
        info["auto_budget"] = [round(float(b), 4) for b in visibility_budget]
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


def train_step_time(cfg_name="scannet", n_views=40, trajectory="indoor"):
    """Seconds per TRAINING step (forward + backward + AdamW, bs=1) at the
    reference's train setting (40 random views, configs/SGCDet_ScanNet.py:
    139,194-207), slope method."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_scene
    from sgcdet_tpu.configs.config import get_config
    from sgcdet_tpu.train.loop import init_train_state, make_train_step
    from sgcdet_tpu.utils.visibility import derive_visibility_budgets

    cfg = get_config(cfg_name)
    scene = _example_scene(cfg.data.img_shape, cfg.data.pad_size, n_views,
                           trajectory=trajectory)
    budget = derive_visibility_budgets(
        [(np.asarray(scene["origin"]), np.asarray(scene["proj_img"]))],
        cfg.data.img_shape, cfg.model,
    )
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, visibility_budget=budget,
                                       depth_loss=True))

    rng = np.random.RandomState(3)
    max_boxes = 16
    boxes = np.zeros((max_boxes, 7), np.float32)
    boxes[:, :3] = rng.uniform(-2, 2, (max_boxes, 3))
    boxes[:, 3:6] = rng.uniform(0.3, 1.5, (max_boxes, 3))
    # GT depth maps live at downsample_factor x the stride-4 prediction grid
    # (ScanNet: 8 x (60, 80) = 480x640 native depth PNGs; ARKit: 4x)
    dh = cfg.data.pad_size[0] // 4 * cfg.model.downsample_factor
    dw = cfg.data.pad_size[1] // 4 * cfg.model.downsample_factor
    scene = dict(
        scene,
        gt_boxes=jnp.asarray(boxes),
        gt_labels=jnp.asarray(
            rng.randint(0, cfg.model.n_classes, max_boxes).astype(np.int32)),
        gt_mask=jnp.asarray((np.arange(max_boxes) < 8)),
        gt_depth=jnp.asarray(
            rng.uniform(0.5, 4.5, (n_views, dh, dw)).astype(np.float32)),
    )
    model, state, tx = init_train_state(cfg, jax.random.PRNGKey(0), scene)
    step = make_train_step(model, cfg, tx)
    key = jax.random.PRNGKey(1)
    batch = {k: v[None] for k, v in scene.items()}  # bs=1 (mesh-less step)
    state, metrics = step(state, batch, key)  # compile + warm
    assert np.isfinite(float(metrics["loss"]))

    def run(m):
        s, mt = state, None
        t0 = time.perf_counter()
        for _ in range(m):
            s, mt = step(s, batch, key)
        float(mt["loss"])
        return time.perf_counter() - t0

    lo = min(run(1), run(1))
    hi = min(run(4), run(4))
    return (hi - lo) / 3.0


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _on_signal)
        except Exception:
            pass
    emit()  # provisional line lands before jax is even imported

    # --- headline: ScanNet 40v, indoor walkthrough, auto exact budget ---
    def _headline():
        t, info = scene_time("scannet", 40, visibility_budget="auto",
                             trajectory="indoor", check_band=True)
        log(f"scannet 40v indoor+auto-exact-budget: {t:.3f}s/scene ({info})")
        update(value=1.0 / t, live_key="headline",
               vs_same_chip_xla_path_measured=round((1.0 / t) / XLA_PATH_40VIEW, 4),
               **{f"headline_{k}": v for k, v in info.items()})

    stage("headline", 60, _headline)

    # --- on-chip kernel correctness record ---
    def _oracle():
        kerr = kernel_oracle_check()
        log(f"pallas kernel oracle check: max err {kerr}")
        update(pallas_kernel_oracle_maxerr=kerr,
               pallas_kernel_oracle_ok=(kerr is None or kerr < 2e-4))

    stage("kernel_oracle", 120, _oracle)

    # --- training-step throughput (the reference's actual budget regime) ---
    def _train():
        t = train_step_time("scannet", 40, "indoor")
        log(f"train step scannet 40v indoor+auto: {t:.3f}s/step")
        update(live_key="train_scenes_per_sec_40views",
               train_scenes_per_sec_40views=round(1.0 / t, 4))

    # --- protocol variants, best-effort under the soft deadline ---
    variants = [
        # released eval protocol (100 views), realistic trajectory
        ("scannet_100view_eval_scenes_per_sec", "scannet", 100, "auto",
         "indoor", 240),
        # dense worst case: orbit rig, every camera sees ~everything
        ("scannet_40view_dense_ring_scenes_per_sec", "scannet", 40, None,
         "ring", 240),
        ("scannet200_large_40view_scenes_per_sec", "scannet200_large", 40,
         "auto", "indoor", 300),
    ]

    def _variant(key, cfg_name, n_views, budget, traj):
        def go():
            t, vinfo = scene_time(cfg_name, n_views, visibility_budget=budget,
                                  trajectory=traj, check_band=True)
            log(f"{key}: {t:.3f}s/scene ({vinfo})")
            kw = {key: round(1.0 / t, 4)}
            if key.startswith("scannet_100view"):
                kw["scannet_100view_vs_baseline_est"] = round(
                    (1.0 / t) / REF_EST_100VIEW, 4)
            update(live_key=key, **kw)
        return go

    stage("train_step", 240, _train)
    stage("variant_100view", 200, _variant(*variants[0][:5]))
    stage("variant_dense_ring", 200, _variant(*variants[1][:5]))
    stage("variant_scannet200", 240, _variant(*variants[2][:5]))

    emit()


if __name__ == "__main__":
    main()
