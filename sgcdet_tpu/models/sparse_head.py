"""Adaptive sparse 3D volume construction (coarse-to-fine).

Rebuild of AdaptiveSparseHead + DenseHead
(/root/reference/mmdet3d_plugin/models/im2voxel/AdaptiveSparseHead.py:9-103,
DenseHead.py:10-84): three pyramid levels; level 0 lifts every voxel, finer
levels trilinearly upsample the previous volume, score per-voxel occupancy,
select a *static* top-k of voxels, lift only those, and residual-add.

TPU-first: the reference materializes a hard 0/1 mask and dynamically gathers
``nonzero`` indices; here ``jax.lax.top_k`` yields a compact static-(K,) index
set — the lifting runs on exactly K queries (no masked waste) and the result
is scattered back with a static scatter. Unselected voxels keep the upsampled
value, bit-for-bit the reference's behavior.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..geometry.voxel_grid import voxel_centers_zero_origin
from .layers import Linear, interpolate_linear
from .view_transformer import ViewTransformer


class AdaptiveSparseVolume(nn.Module):
    embed_dims: int = 256
    voxel_size_list: Sequence = ((0.64, 0.64, 0.8), (0.32, 0.32, 0.4), (0.16, 0.16, 0.2))
    n_voxels_list: Sequence = ((10, 10, 4), (20, 20, 8), (40, 40, 16))
    topk_list: Sequence = (800, 6400)
    num_heads: int = 8
    num_points: int = 4
    ffn_dropout: float = 0.1
    query_chunk: int | None = 100
    # scalar fraction (all levels) or per-level tuple (one entry per pyramid
    # level; 1.0 disables compaction for that level) — see
    # utils.visibility.derive_visibility_budgets
    visibility_budget: float | Sequence | None = None
    sort_queries: bool = False

    @nn.compact
    def __call__(self, mlvl_feats, mlvl_dpt_dists, origin, projection, img_shape, dbound, train=False):
        """
        mlvl_feats: list of (N, C, H_l, W_l), finest first (FPN order).
        mlvl_dpt_dists: list of (N, D, H_l, W_l), finest first.
        origin: (3,); projection: (N, 3, 4) at image resolution.
        Returns (volume (C, X, Y, Z), valid (X, Y, Z) bool, occ_preds or None).
        """
        n_levels = len(self.n_voxels_list)
        img_h, img_w = img_shape
        finest_ds = 4

        volume = None
        occ_preds_list = []
        valid = None
        for i in range(n_levels):
            ds = finest_ds * (2 ** (n_levels - 1 - i))
            h_i, w_i = img_h // ds, img_w // ds
            feat_idx = n_levels - 1 - i
            feat = mlvl_feats[feat_idx][:, :, :h_i, :w_i]
            dpt = mlvl_dpt_dists[feat_idx][:, :, :h_i, :w_i]

            nvox = self.n_voxels_list[i]
            ref_all = jnp.asarray(
                voxel_centers_zero_origin(nvox, self.voxel_size_list[i])
            )  # (V, 3) static

            vb = self.visibility_budget
            if isinstance(vb, (list, tuple)):
                vb = float(vb[i])
                if vb >= 1.0:
                    vb = None
            transformer = ViewTransformer(
                embed_dims=self.embed_dims,
                num_heads=self.num_heads,
                num_points=self.num_points,
                num_levels=1,
                ffn_dropout=self.ffn_dropout,
                query_chunk=self.query_chunk,
                visibility_budget=vb,
                sort_queries=self.sort_queries,
                name=f"base_head{i}",
            )

            if i == 0:
                seeds = transformer(
                    ref_all, origin, projection, [feat], [dpt], img_shape, dbound, train
                )  # (V0, C)
                volume = seeds.T.reshape(self.embed_dims, *nvox)
            else:
                upsampled = interpolate_linear(
                    volume[None], nvox, align_corners=False
                )[0]  # (C, X, Y, Z)
                occ = nn.sigmoid(
                    Linear(1, name=f"occ_pred_head{i - 1}")(
                        jnp.transpose(upsampled, (1, 2, 3, 0))
                    )
                ).reshape(-1)  # (V,) flat C-order over (x, y, z)
                occ_preds_list.append(occ)
                k = self.topk_list[i - 1]
                _, top_idx = jax.lax.top_k(occ, k)  # static K indices
                # spatial scan order (the reference's nonzero() order,
                # AdaptiveSparseHead.py:85-92): downstream take/scatter are
                # permutation-equivariant, and scan-ordered queries project
                # to spatially COHERENT image rows — coherent single-row
                # gathers run ~3x the random rate in the Pallas lifting
                # kernels (sort of K int32 is noise next to that)
                top_idx = jnp.sort(top_idx)
                ref_sel = jnp.take(ref_all, top_idx, axis=0)  # (K, 3)
                seeds = transformer(
                    ref_sel, origin, projection, [feat], [dpt], img_shape, dbound, train
                )  # (K, C)
                flat = jnp.zeros((int(np.prod(nvox)), self.embed_dims), seeds.dtype)
                flat = flat.at[top_idx].set(seeds)
                volume = upsampled + flat.T.reshape(self.embed_dims, *nvox)
                if i == n_levels - 1:
                    vflat = jnp.zeros((int(np.prod(nvox)),), jnp.float32)
                    valid = vflat.at[top_idx].set(1.0).reshape(nvox)

        if occ_preds_list:
            occ_preds = jnp.concatenate(occ_preds_list[::-1], axis=0)
        else:
            occ_preds = None
            valid = jnp.ones(self.n_voxels_list[-1], jnp.float32)
        return volume, valid, occ_preds


def occ_loss(occ_pred, geo_occ, weight=0.5):
    """BCE between predicted occupancy and box-derived geometric occupancy
    (AdaptiveSparseHead.py:100-103). occ_pred (M,), geo_occ (>=M,) bool."""
    n = occ_pred.shape[0]
    target = geo_occ[:n].astype(occ_pred.dtype)
    p = jnp.clip(occ_pred, 1e-7, 1 - 1e-7)
    bce = -(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))
    return bce.mean() * weight
