"""Visibility statistics -> provably-exact per-camera budget sizing.

The ``visibility_budget`` compaction in ``DeformCrossAttention``
(view_transformer.py) is EXACT whenever the per-camera kept-query budget
B = ceil(budget * K) is at least the number of visible queries in every
camera (the reference rebatches exactly the visible set,
deformable_cross_attention.py:759-783).  The selected top-k query sets of the
finer levels are unknown before training, but they are subsets of the full
voxel grid — so the per-camera visible count over ALL voxels of a level upper
bounds the visible count of ANY selected subset.  A budget fraction derived
from that bound is therefore exact for every possible selection.
"""
from __future__ import annotations

import numpy as np

from ..geometry.voxel_grid import voxel_centers_zero_origin


def _visible_counts(ref_points, origin, projection, img_shape, dbound):
    """NumPy mirror of view_transformer.point_sampling's visibility mask.

    ref_points: (K, 3); projection: (N, 3, 4). Returns (N,) visible counts.
    """
    eps = 1e-5
    ogf_h, ogf_w = img_shape
    pts = ref_points + np.asarray(origin, np.float32)[None, :]
    hom = np.concatenate([pts, np.ones_like(pts[:, :1])], axis=-1)
    cam = np.einsum("nij,kj->nki", np.asarray(projection, np.float32), hom)
    d = cam[..., 2]
    uv = cam[..., :2] / np.maximum(d, eps)[..., None]
    u = uv[..., 0] / ogf_w
    v = uv[..., 1] / ogf_h
    mask = (
        (d > eps) & (u > eps) & (u < 1.0 - eps) & (v > eps) & (v < 1.0 - eps)
    )
    return mask.sum(axis=1)


def scene_visibility_fractions(origin, projection, img_shape, model_cfg):
    """Max per-camera visible fraction of each level's query count.

    For level 0 the query set is the whole grid; for level i>0 it is a top-k
    subset, bounded by min(k, visible_all).  Returns a list of per-level
    fractions in [0, 1]; their max (plus margin) is an exact budget for this
    scene.
    """
    fracs = []
    for i, nvox in enumerate(model_cfg.n_voxels_list):
        ref_all = voxel_centers_zero_origin(nvox, model_cfg.voxel_size_list[i])
        counts = _visible_counts(
            np.asarray(ref_all, np.float32), origin, projection, img_shape,
            model_cfg.dbound,
        )
        k = (
            int(np.prod(nvox)) if i == 0 else int(model_cfg.topk_list[i - 1])
        )
        bound = min(k, int(counts.max())) if counts.size else 0
        fracs.append(bound / max(k, 1))
    return fracs


def derive_visibility_budgets(scenes, img_shape, model_cfg, margin=1.05):
    """Exact PER-LEVEL visibility budgets over (origin, projection) pairs.

    Coarse levels see large voxels (most cameras see most of the 10x10x4
    grid) while the finest level's visible fraction is set by actual frustum
    coverage — a single scalar budget (the max over levels) therefore
    over-provisions exactly the level whose stage-2 kernel dominates the
    lifting cost.  Per-level fractions compact strictly more while staying
    provably exact (the level-i bound covers every possible top-k subset of
    level i; see module docstring).

    Args:
      scenes: iterable of (origin (3,), projection (N, 3, 4)) numpy pairs —
        e.g. generated from dataset infos, or synthetic trajectories.
      margin: multiplicative safety factor (the compaction rounds the kept
        count up to a multiple of 128 anyway).
    Returns a tuple of per-level budget fractions (each clipped to 1.0;
    a level at 1.0 disables compaction for that level); passing it as
    ``model.visibility_budget`` keeps the lifting exact for every scene seen.
    """
    worst = [0.0] * len(model_cfg.n_voxels_list)
    for origin, projection, *_ in scenes:
        fracs = scene_visibility_fractions(origin, projection, img_shape, model_cfg)
        worst = [max(w, f) for w, f in zip(worst, fracs)]
    return tuple(float(min(1.0, w * margin)) for w in worst)


def derive_visibility_budget(scenes, img_shape, model_cfg, margin=1.05):
    """Scalar (max-over-levels) variant of ``derive_visibility_budgets`` —
    kept for callers that want one fraction for every level."""
    budgets = derive_visibility_budgets(scenes, img_shape, model_cfg, margin)
    return max(budgets) if budgets else 1.0


def required_sweep_band(proj_feat, n_views, model_cfg, feat_shape):
    """Smallest exact source-row band for the banded-Gram plane sweep
    (ops/sweep_band.py) on a concrete rig.

    The band is exact iff, for every (neighbor pair, output row), all
    in-image source rows with nonzero bilinear weight fit the band — this
    computes that bound directly from the rig's warp grids.  Rigs whose
    neighbor views rotate strongly (or whose sweep planes cross a camera
    plane, z ~ 0) can need the full image height, at which point the banded
    path stops paying and the caller should keep ``sweep_band=None``.

    Args:
      proj_feat: (N, 4, 4) feature-resolution K[R|t] (the sweep's
        projections, proj_feat4).
      n_views: number of views N.
      model_cfg: ModelConfig (dbound, neighbor_img_num).
      feat_shape: (h, w) of the matching features (img_shape/4).
    Returns int band (<= h).
    """
    import jax.numpy as jnp

    from ..models.depth_net import _warp_grid, get_closest_frame_ids
    from ..ops.sweep_band import _corner_weights

    h, w = feat_shape
    db = model_cfg.dbound
    dv = jnp.asarray(
        np.arange(db[0], db[1], db[2], dtype=np.float32) + db[2] / 2)
    proj = jnp.asarray(np.asarray(proj_feat, np.float32))
    k = min(model_cfg.neighbor_img_num, n_views - 1)
    nei = get_closest_frame_ids(n_views, k)
    need = 1
    for j in range(k):
        xe, ye = _warp_grid(proj[nei[:, j]], proj, dv, h, w)
        _, y0, _, _, wv0, wv1 = _corner_weights(
            xe.reshape(-1, len(dv), h, w), ye.reshape(-1, len(dv), h, w),
            h, w)
        y0, wv0, wv1 = map(np.asarray, (y0, wv0, wv1))
        big = 10 * h
        lo = np.minimum(np.where(wv0 > 0, y0, big),
                        np.where(wv1 > 0, y0 + 1, big)).min(axis=(1, 3))
        hi = np.maximum(np.where(wv0 > 0, y0, -1),
                        np.where(wv1 > 0, y0 + 1, -1)).max(axis=(1, 3))
        span = np.where(hi >= 0, hi - np.minimum(lo, hi) + 1, 1)
        need = max(need, int(span.max()))
    return min(need, h)
