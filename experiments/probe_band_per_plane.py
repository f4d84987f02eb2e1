"""Per-plane sweep band requirement on the bench rigs.

The committed band derivation collapses (planes, x) per output row; if only
a few depth planes force the full-height band, a mixed dispatch (banded
Gram for small-band planes + gather kernel for the rest) pays.  This probe
prints the exact per-plane span distribution for each rig.
"""
import numpy as np
import jax.numpy as jnp

from __graft_entry__ import _example_scene
from sgcdet_tpu.configs.config import get_config
from sgcdet_tpu.models.depth_net import _warp_grid, get_closest_frame_ids
from sgcdet_tpu.ops.sweep_band import _corner_weights


def per_plane_spans(proj_feat, n_views, model_cfg, feat_shape):
    h, w = feat_shape
    db = model_cfg.dbound
    dv = jnp.asarray(np.arange(db[0], db[1], db[2], dtype=np.float32) + db[2] / 2)
    proj = jnp.asarray(np.asarray(proj_feat, np.float32))
    k = min(model_cfg.neighbor_img_num, n_views - 1)
    nei = get_closest_frame_ids(n_views, k)
    spans = []  # (pairsets, D) max span over rows+pairs per plane
    for j in range(k):
        xe, ye = _warp_grid(proj[nei[:, j]], proj, dv, h, w)
        _, y0, _, _, wv0, wv1 = _corner_weights(
            xe.reshape(-1, len(dv), h, w), ye.reshape(-1, len(dv), h, w), h, w)
        y0, wv0, wv1 = map(np.asarray, (y0, wv0, wv1))
        big = 10 * h
        lo = np.minimum(np.where(wv0 > 0, y0, big),
                        np.where(wv1 > 0, y0 + 1, big)).min(axis=3)   # (N,D,H)
        hi = np.maximum(np.where(wv0 > 0, y0, -1),
                        np.where(wv1 > 0, y0 + 1, -1)).max(axis=3)    # (N,D,H)
        span = np.where(hi >= 0, hi - np.minimum(lo, hi) + 1, 1)      # (N,D,H)
        spans.append(span.max(axis=(0, 2)))  # (D,) worst over pairs+rows
    return np.stack(spans).max(axis=0), len(dv)


for traj in ("indoor", "ring"):
    cfg = get_config("scannet")
    n_views = 40
    scene = _example_scene(cfg.data.img_shape, cfg.data.pad_size, n_views,
                           trajectory=traj)
    h, w = cfg.data.img_shape[0] // 4, cfg.data.img_shape[1] // 4
    spans, d = per_plane_spans(np.asarray(scene["proj_feat4"]), n_views,
                               cfg.model, (h, w))
    print(f"{traj}: h={h} D={d} per-plane worst spans = {spans.tolist()}")
