"""Geometry-and-context-aware 2D->3D lifting (the view transformer).

Rebuild of the reference's PerceptionTransformer_DFA3D / VoxFormerEncoder_DFA3D
/ DeformCrossAttention_DFA3D / MSDeformableAttention3D_DFA3D stack
(/root/reference/mmdet3d_plugin/models/im2voxel/transformer_utils/
transformer.py:115-185, encoder.py:158-340,
deformable_cross_attention.py:343-501,691-837) as a *masked-dense* TPU module:

* The reference packs, per camera, only the voxels visible in that camera
  (dynamic ``nonzero`` + pad to max_len). Here every (camera, query) pair is
  computed densely with a static shape and the visibility mask is applied at
  the inter-view fusion — identical math, no dynamic shapes, and the query
  axis is chunked with ``lax.map`` so the sampling gathers never materialize
  more than a chunk at a time.
* The two CUDA kernels (depth-score sampling + weighted MSDA) are the fused
  ``dfa3d_attention`` op (jnp reference / Pallas kernel).
"""
from __future__ import annotations

import math



import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.msda import dfa3d_attention, msda_2d
from ..ops.dfa3d import dfa3d_attend, msda_2d_attend
from .layers import (
    FFN,
    LayerNorm,
    Linear,
    MultiheadAttention,
    xavier_uniform_init,
)


def point_sampling(ref_points, origin, projection, img_shape, dbound):
    """Project voxel centers into every camera.

    Args:
      ref_points: (K, 3) voxel centers relative to scene origin.
      origin: (3,) scene origin.
      projection: (N, 3, 4) world->pixel projections at image resolution.
      img_shape: static (H, W) of the resized (pre-pad) image.
      dbound: (d_min, d_max, d_step).

    Returns:
      ref_cam: (N, K, 3) normalized (u, v, d_norm)
      mask:    (N, K) visibility (encoder.py:179-223 semantics).
    """
    eps = 1e-5
    ogf_h, ogf_w = img_shape
    pts = ref_points + origin[None, :]
    hom = jnp.concatenate([pts, jnp.ones_like(pts[:, :1])], axis=-1)  # (K, 4)
    cam = jnp.einsum("nij,kj->nki", projection, hom)  # (N, K, 3)
    d = cam[..., 2]
    uv = cam[..., :2] / jnp.maximum(d, eps)[..., None]
    u = uv[..., 0] / ogf_w
    v = uv[..., 1] / ogf_h
    d_norm = (d - dbound[0]) / (dbound[1] - dbound[0])
    mask = (
        (d > eps)
        & (u > eps)
        & (u < 1.0 - eps)
        & (v > eps)
        & (v < 1.0 - eps)
    )
    return jnp.stack([u, v, d_norm], axis=-1), mask


def _uv_offset_bias(num_heads, num_levels, num_points):
    """Directional grid init of the 2D sampling-offset bias
    (deformable_cross_attention.py:194-208)."""
    thetas = np.arange(num_heads, dtype=np.float32) * (2.0 * math.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid.reshape(num_heads, 1, 1, 2), (1, num_levels, num_points, 1))
    for i in range(num_points):
        grid[:, :, i, :] *= i + 1
    return grid.reshape(-1)


def _depth_offset_bias(num_heads, num_levels, num_points):
    """(cos+sin)/2 depth-offset bias (deformable_cross_attention.py:351-362)."""
    thetas = np.arange(num_heads, dtype=np.float32) * (2.0 * math.pi / num_heads)
    grid = ((np.cos(thetas) + np.sin(thetas)) / 2.0).reshape(num_heads, 1, 1, 1)
    grid = np.tile(grid, (1, num_levels, num_points, 1))
    for i in range(num_points):
        grid[:, :, i, :] *= i + 1
    return grid.reshape(-1)


def _chunked_dfa3d(value, dpt, spatial_shapes, locs, attn, chunk):
    """dfa3d_attention with the query axis processed in lax.map chunks."""
    n, k = locs.shape[0], locs.shape[1]
    if chunk is None or k <= chunk or k % chunk != 0:
        return dfa3d_attention(value, dpt, spatial_shapes, locs, attn)[0]
    n_chunks = k // chunk
    locs_c = locs.reshape(n, n_chunks, chunk, *locs.shape[2:]).transpose(1, 0, 2, 3, 4, 5, 6)
    attn_c = attn.reshape(n, n_chunks, chunk, *attn.shape[2:]).transpose(1, 0, 2, 3, 4, 5)

    def body(args):
        lc, ac = args
        return dfa3d_attention(value, dpt, spatial_shapes, lc, ac)[0]

    out = jax.lax.map(body, (locs_c, attn_c))  # (n_chunks, N, chunk, C)
    return out.transpose(1, 0, 2, 3).reshape(n, k, -1)


class MSDeformableAttention3D(nn.Module):
    """Context branch: learned-offset depth-weighted deformable attention
    (deformable_cross_attention.py:343-501)."""

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    query_chunk: int | None = 100

    @nn.compact
    def __call__(self, query, value_img, dpt_img, ref_points, spatial_shapes,
                 valid_counts=None):
        """
        query: (N, K, C); value_img: (N, H, W, C); dpt_img: (N, H, W, D)
        ref_points: (N, K, 1, 3) normalized; spatial_shapes: static ((H, W),)
        valid_counts: optional (N,) per-camera real-query counts (queries
        packed visible-first) — lets the TPU kernel skip padded blocks whose
        outputs the caller masks anyway (see ops.dfa3d.dfa3d_attend).
        Returns (N, K, C).
        """
        n, k, c = query.shape
        h, l, p = self.num_heads, self.num_levels, self.num_points
        d_dim = dpt_img.shape[-1]

        v_img = Linear(c, kernel_init=xavier_uniform_init,
                       bias_init=nn.initializers.zeros, name="value_proj")(value_img)

        off_uv = Linear(
            h * l * p * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                _uv_offset_bias(h, l, p), dtype
            ),
            name="sampling_offsets",
        )(query).reshape(n, k, h, l, p, 2)
        off_d = Linear(
            h * l * p,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                _depth_offset_bias(h, l, p), dtype
            ),
            name="sampling_offsets_depth",
        )(query).reshape(n, k, h, l, p, 1)
        offsets = jnp.concatenate([off_uv, off_d], axis=-1)

        attn = Linear(
            h * l * p,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(n, k, h, l * p)
        attn = jax.nn.softmax(attn, axis=-1).reshape(n, k, h, l, p)

        # normalizer [W, H, D] per level (deformable_cross_attention.py:445-451)
        normalizer = jnp.asarray(
            [[w_, h_, d_dim] for (h_, w_) in spatial_shapes], jnp.float32
        )
        locs = ref_points[:, :, None, None, :, :] + offsets / normalizer[None, None, None, :, None, :]
        locs = locs.reshape(n, k, h, l, p, 3)
        # single-level fast path: Pallas kernel on TPU, patch-gather on CPU
        out = dfa3d_attend(
            v_img, dpt_img, locs[:, :, :, 0], attn[:, :, :, 0],
            num_heads=h, query_chunk=self.query_chunk,
            valid_counts=valid_counts,
        )
        return out


class MSDeformableAttention2D(nn.Module):
    """Plain 2D multi-scale deformable attention (no depth weighting) — the
    reference's MSDeformableAttention3D used by the non-DFA3D path
    (deformable_cross_attention.py:119-340)."""

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    query_chunk: int | None = 100

    @nn.compact
    def __call__(self, query, value, ref_points, spatial_shapes):
        """query: (N, K, C); value: (N, num_value, C);
        ref_points: (N, K, 1, 2) normalized."""
        n, k, c = query.shape
        h, l, p = self.num_heads, self.num_levels, self.num_points
        v = Linear(c, kernel_init=xavier_uniform_init,
                   bias_init=nn.initializers.zeros, name="value_proj")(value)
        v = v.reshape(n, -1, h, c // h)
        off = Linear(
            h * l * p * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                _uv_offset_bias(h, l, p), dtype
            ),
            name="sampling_offsets",
        )(query).reshape(n, k, h, l, p, 2)
        attn = Linear(
            h * l * p, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="attention_weights",
        )(query).reshape(n, k, h, l * p)
        attn = jax.nn.softmax(attn, axis=-1).reshape(n, k, h, l, p)
        normalizer = jnp.asarray(
            [[w_, h_] for (h_, w_) in spatial_shapes], jnp.float32
        )
        locs = ref_points[:, :, None, None, :, :] + off / normalizer[None, None, None, :, None, :]
        locs = locs.reshape(n, k, h, l, p, 2)
        if l == 1:
            # single-level fast path: image-layout sampling via the DFA3D
            # dispatcher (Pallas on TPU, patch-gather elsewhere)
            h_, w_ = spatial_shapes[0]
            v_img = v.reshape(n, h_, w_, c)
            return msda_2d_attend(
                [v_img], locs, attn, num_heads=h, query_chunk=self.query_chunk
            )
        return msda_2d(v, spatial_shapes, locs, attn)


class DeformCrossAttention(nn.Module):
    """Two-stage per-view aggregation + masked-mean / attention inter-view
    fusion (deformable_cross_attention.py:691-837).

    ``visibility_budget`` re-expresses the reference's per-camera rebatching
    of visible voxels (deformable_cross_attention.py:759-783) with static
    shapes: per camera, keep the top-B queries by visibility (top_k over the
    0/1 mask keeps every visible voxel first, ties broken by index), run both
    sampling stages on the compacted set, and scatter the results back.
    EXACT whenever B >= the max number of visible voxels in any camera —
    invisible slots are masked out of the fusion either way.  If B is smaller,
    the lowest-index visible voxels win (a deviation the reference never
    makes; size the budget from data statistics)."""

    embed_dims: int = 256
    num_heads: int = 8
    num_points: int = 4
    num_levels: int = 1
    dropout: float = 0.0
    inter_view_aggregation: str = "attn"
    query_chunk: int | None = 100
    use_depth: bool = True  # False -> the reference's non-DFA3D 2D path
    visibility_budget: float | None = None  # fraction of K kept per camera
    # Order the compacted per-camera queries by their projected image row
    # (an exact permutation: per-query compute is order-independent and the
    # fusion reads scattered-back slots).  Makes the DFA3D kernels' row
    # gathers chunk-coherent for the windowed-matmul kernels
    # (ops/dfa3d_pallas4/5.py).  Off by default: the permutation costs
    # ~14 ms at the 40-view ScanNet shape (lax.top_k) and no dispatched
    # kernel currently beats the copy-loop gather from coherence alone
    # (see docs/roadmap.md round-3 notes).
    sort_queries: bool = False

    @nn.compact
    def __call__(
        self,
        query,            # (K, C) voxel queries (zeros at init)
        value_img,        # (N, H, W, C) camera features (image layout)
        dpt_img,          # (N, H, W, D) depth distributions
        ref_cam,          # (N, K, 3) normalized (u, v, d)
        mask,             # (N, K) visibility
        spatial_shapes,   # static ((H, W),)
        train: bool = False,
    ):
        n, k = mask.shape
        c = self.embed_dims
        inp_residual = query

        if self.visibility_budget is None:
            budget = k if self.sort_queries else None
        else:
            budget = min(k, max(128, -(-int(k * self.visibility_budget) // 128) * 128))
        compact = (
            self.use_depth and budget is not None
            and ((0 < budget < k) or (self.sort_queries and budget == k))
        )
        valid_counts = None
        if compact:
            # per-camera count of REAL (visible) queries in the compacted
            # order (top_k packs them first): lets the TPU stage-2 kernel
            # skip whole padded blocks — exact, their outputs are masked by
            # the fusion below either way (ops.dfa3d.dfa3d_attend)
            valid_counts = jnp.minimum(
                mask.sum(axis=1), budget).astype(jnp.float32)
            scores = mask.astype(jnp.float32)
            if self.sort_queries:
                # fold the predicted quad-row id of the projection center
                # into the score: visible first (scores > 1), row-ascending
                # within visible.  Exactness of the budget is unchanged —
                # every visible query still outranks every invisible one.
                h0, w0 = spatial_shapes[0]
                u_pix = jnp.clip(
                    jnp.floor(ref_cam[..., 0] * w0 - 0.5), -1.0, w0 - 1.0) + 1.0
                v_pix = jnp.clip(
                    jnp.floor(ref_cam[..., 1] * h0 - 0.5), -1.0, h0 - 1.0) + 1.0
                row_norm = (v_pix * (w0 + 1) + u_pix) / float(
                    (h0 + 1) * (w0 + 1) + 1)
                scores = scores * 2.0 - row_norm.astype(jnp.float32)
            _, sel_idx = jax.lax.top_k(scores, budget)  # (N, B) visible first
            ref_cam_s = jnp.take_along_axis(ref_cam, sel_idx[..., None], axis=1)
            # selected-set mask; fusion masks with (visible AND selected)
            sel = jax.vmap(
                lambda i: jnp.zeros((k,), bool).at[i].set(True)
            )(sel_idx)
            mask = mask & sel
        else:
            ref_cam_s = ref_cam

        if self.use_depth:
            kk = ref_cam_s.shape[1]
            # stage 1 — "geometry": depth-weighted trilinear sample at the
            # projected point (1 head = full C, 1 point, weight 1).
            locs1 = ref_cam_s[:, :, None, None, :].astype(jnp.float32)
            attn1 = jnp.ones((n, kk, 1, 1), jnp.float32)
            queries_per_image = dfa3d_attend(
                value_img, dpt_img, locs1, attn1, num_heads=1,
                query_chunk=self.query_chunk, valid_counts=valid_counts,
            )  # (N, K', C)

            # stage 2 — "context": deformable attention around the projection
            queries = MSDeformableAttention3D(
                embed_dims=c,
                num_heads=self.num_heads,
                num_levels=self.num_levels,
                num_points=self.num_points,
                query_chunk=self.query_chunk,
                name="deformable_attention",
            )(
                queries_per_image,
                value_img,
                dpt_img,
                ref_cam_s[:, :, None, :],
                spatial_shapes,
                valid_counts=valid_counts,
            )
            if compact:
                queries = jax.vmap(
                    lambda q, i: jnp.zeros((k, c), q.dtype).at[i].set(q)
                )(queries, sel_idx)
        else:
            # 2D path (deformable_cross_attention.py:504-688): bilinear
            # grid-sample stage + plain MSDA stage with residual add.
            value = value_img.reshape(n, -1, c)
            locs1 = ref_cam[:, :, None, None, :2].astype(jnp.float32)
            attn1 = jnp.ones((n, k, 1, 1, 1), jnp.float32)
            queries_per_image = msda_2d_attend(
                [value_img], locs1[:, :, :, None], attn1, num_heads=1,
                query_chunk=self.query_chunk,
            )
            queries = MSDeformableAttention2D(
                embed_dims=c,
                num_heads=self.num_heads,
                num_levels=self.num_levels,
                num_points=self.num_points,
                query_chunk=self.query_chunk,
                name="deformable_attention",
            )(queries_per_image, value, ref_cam[:, :, None, :2], spatial_shapes)
            queries = queries + queries_per_image

        # inter-view fusion: masked mean over visible views ...
        maskf = mask.astype(queries.dtype)[..., None]
        slots = queries * maskf  # zero out invisible pairs
        count = mask.sum(axis=0)  # (K,)
        mean = slots.sum(axis=0) / jnp.maximum(count, 1)[..., None]
        slots_mean = Linear(
            c, kernel_init=xavier_uniform_init, bias_init=nn.initializers.zeros,
            name="output_proj",
        )(mean)  # (K, C)

        # ... then attention pooling over views (query = mean, keys = views)
        if self.inter_view_aggregation == "attn":
            q = slots_mean[None]  # (1, K, C): seq 1, batch K
            kv = slots  # (N, K, C): seq N, batch K
            key_padding = ~mask.T  # (K, N)
            slots_mean = MultiheadAttention(
                embed_dims=c, num_heads=8, name="attention_pooling"
            )(q, kv, kv, key_padding)[0]

        output = jnp.where((count > 0)[:, None], slots_mean, 0.0)
        output = nn.Dropout(self.dropout, deterministic=not train)(output)
        return output + inp_residual


class VoxFormerLayer(nn.Module):
    """cross_attn -> norm -> ffn -> norm (encoder.py:226-340 with the
    operation_order of configs/SGCDet_ScanNet.py:50)."""

    embed_dims: int = 256
    num_heads: int = 8
    num_points: int = 4
    num_levels: int = 1
    ffn_dropout: float = 0.1
    attn_dropout: float = 0.0
    query_chunk: int | None = 100
    use_depth: bool = True
    visibility_budget: float | None = None
    sort_queries: bool = False

    @nn.compact
    def __call__(self, query, value, dpt_dist, ref_cam, mask, spatial_shapes, train=False):
        query = DeformCrossAttention(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            num_points=self.num_points,
            num_levels=self.num_levels,
            dropout=self.attn_dropout,
            query_chunk=self.query_chunk,
            use_depth=self.use_depth,
            visibility_budget=self.visibility_budget,
            sort_queries=self.sort_queries,
            name="cross_attn",
        )(query, value, dpt_dist, ref_cam, mask, spatial_shapes, train)
        query = LayerNorm(name="norm1")(query)
        query = FFN(
            self.embed_dims, self.embed_dims * 2, self.ffn_dropout, name="ffn"
        )(query, train=train)
        query = LayerNorm(name="norm2")(query)
        return query


class ViewTransformer(nn.Module):
    """One encoder pass over a set of voxel queries (num_layers=1 in all
    released configs; transformer.py:115-185)."""

    embed_dims: int = 256
    num_heads: int = 8
    num_points: int = 4
    num_levels: int = 1
    num_layers: int = 1
    ffn_dropout: float = 0.1
    query_chunk: int | None = 100
    use_depth: bool = True
    visibility_budget: float | None = None
    sort_queries: bool = False

    @nn.compact
    def __call__(self, ref_points, origin, projection, feats, dpt_dists, img_shape, dbound, train=False):
        """
        ref_points: (K, 3) selected voxel centers (origin-relative)
        feats: list of (N, C, H_l, W_l) per level; dpt_dists likewise (N, D, H, W)
        Returns seed features (K, C).
        """
        assert len(feats) == 1, "single-level lifting (all released configs)"
        spatial_shapes = tuple((f.shape[2], f.shape[3]) for f in feats)
        value_img = jnp.transpose(feats[0], (0, 2, 3, 1))  # (N, H, W, C)
        dpt_img = jnp.transpose(dpt_dists[0], (0, 2, 3, 1))  # (N, H, W, D)

        ref_cam, mask = point_sampling(ref_points, origin, projection, img_shape, dbound)
        query = jnp.zeros((ref_points.shape[0], self.embed_dims), value_img.dtype)
        for i in range(self.num_layers):
            query = VoxFormerLayer(
                embed_dims=self.embed_dims,
                num_heads=self.num_heads,
                num_points=self.num_points,
                num_levels=self.num_levels,
                ffn_dropout=self.ffn_dropout,
                query_chunk=self.query_chunk,
                use_depth=self.use_depth,
                visibility_budget=self.visibility_budget,
                sort_queries=self.sort_queries,
                name=f"layer{i}",
            )(query, value_img, dpt_img, ref_cam, mask, spatial_shapes, train)
        return query
