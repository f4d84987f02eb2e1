"""Test-only PyTorch transcription of the reference LIFTING stack.

Used exclusively as a parity oracle (like tests/torch_ref_sgcdet.py): plain
eager PyTorch re-statement of the reference's 2D->3D lifting semantics —
point sampling (encoder.py:177-223), per-camera visible-query rebatching +
two-stage DFA3D aggregation + masked-mean / attention-pooling fusion
(deformable_cross_attention.py:21-116,343-501,691-837), the VoxFormer layer
(custom_base_transformer_layer operation_order cross_attn->norm->ffn->norm),
DenseHead query scatter (DenseHead.py:10-84), and the coarse-to-fine
AdaptiveSparseHead loop (AdaptiveSparseHead.py:9-103).

The CUDA DFA3D op is replaced by explicit corner math implementing the
kernel spec (wms_deform_attn_cuda_kernel.cuh:24-80 +
ms_depth_score_sample_cuda_kernel.cuh:89-148: loc*size-0.5 denormalization,
per-corner zero padding, per-side depth-lerp validity).

Module attribute names mirror the reference state_dict naming so
``convert_torch_state_dict`` maps these weights onto the flax tree.
"""
from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def dfa3d_sample(value, dpt_dist, shapes, locs, attn):
    """Explicit-corner DFA3D sampling (single level).

    value: (bs, nv, heads, c); dpt_dist: (bs, nv, heads, D);
    locs: (bs, nq, heads, P, 3) normalized; attn: (bs, nq, heads, P).
    Returns (bs, nq, heads*c).
    """
    (h, w), = shapes
    bs, nv, heads, c = value.shape
    d_size = dpt_dist.shape[-1]
    nq, p = locs.shape[1], locs.shape[3]

    u = locs[..., 0] * w - 0.5
    v = locs[..., 1] * h - 0.5
    d = locs[..., 2] * d_size - 0.5
    x0 = torch.floor(u)
    y0 = torch.floor(v)
    d0 = torch.floor(d)
    lx, ly, ld = u - x0, v - y0, d - d0
    x0, y0, d0 = x0.long(), y0.long(), d0.long()

    vd0 = (d0 >= 0) & (d0 <= d_size - 1)
    vd1 = (d0 + 1 >= 0) & (d0 + 1 <= d_size - 1)
    d0c = d0.clamp(0, d_size - 1)
    d1c = (d0 + 1).clamp(0, d_size - 1)

    out = torch.zeros(bs, nq, heads, c, dtype=value.dtype)
    for dy, dx, wgt in (
        (0, 0, (1 - ly) * (1 - lx)),
        (0, 1, (1 - ly) * lx),
        (1, 0, ly * (1 - lx)),
        (1, 1, ly * lx),
    ):
        yi, xi = y0 + dy, x0 + dx
        valid = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
        flat = yi.clamp(0, h - 1) * w + xi.clamp(0, w - 1)  # (bs, nq, heads, P)
        # gather value/dpt rows at the corner pixel, per head
        v_rows = torch.zeros(bs, nq, heads, p, c)
        ds_rows0 = torch.zeros(bs, nq, heads, p)
        ds_rows1 = torch.zeros(bs, nq, heads, p)
        for b in range(bs):
            fl = flat[b].reshape(-1)  # nq*heads*P
            hh = (
                torch.arange(heads)
                .view(1, heads, 1)
                .expand(nq, heads, p)
                .reshape(-1)
            )
            v_rows[b] = value[b][fl, hh].reshape(nq, heads, p, c)
            dd = dpt_dist[b][fl, hh]  # (nq*heads*P, D)
            ds_rows0[b] = dd.gather(
                1, d0c[b].reshape(-1, 1)
            ).reshape(nq, heads, p)
            ds_rows1[b] = dd.gather(
                1, d1c[b].reshape(-1, 1)
            ).reshape(nq, heads, p)
        # per-corner trilinear depth score with per-side validity
        ds = ds_rows0 * ((1 - ld) * vd0) + ds_rows1 * (ld * vd1)
        weight = wgt * valid.to(wgt.dtype) * ds * attn  # (bs, nq, heads, P)
        out = out + (weight[..., None] * v_rows).sum(dim=3)
    return out.reshape(bs, nq, heads * c)


class MSDeformableAttention3D(nn.Module):
    """Reference MSDeformableAttention3D_DFA3D
    (deformable_cross_attention.py:343-501), CUDA op replaced by
    ``dfa3d_sample``."""

    def __init__(self, embed_dims, num_heads, num_points, num_levels=1):
        super().__init__()
        self.embed_dims = embed_dims
        self.num_heads = num_heads
        self.num_points = num_points
        self.num_levels = num_levels
        h, l, p = num_heads, num_levels, num_points
        self.sampling_offsets = nn.Linear(embed_dims, h * l * p * 2)
        self.sampling_offsets_depth = nn.Linear(embed_dims, h * l * p)
        self.attention_weights = nn.Linear(embed_dims, h * l * p)
        self.value_proj = nn.Linear(embed_dims, embed_dims)

    def forward(self, query, value, value_dpt_dist, reference_points, shapes):
        """query: (bs, nq, C); value: (bs, nv, C); value_dpt_dist: (bs, nv, D);
        reference_points: (bs, nq, 1, 3)."""
        bs, nq, _ = query.shape
        h, l, p = self.num_heads, self.num_levels, self.num_points
        d_size = value_dpt_dist.shape[-1]
        (fh, fw), = shapes

        v = self.value_proj(value).view(bs, -1, h, self.embed_dims // h)
        dpt = value_dpt_dist[:, :, None].expand(bs, value.shape[1], h, d_size)

        off_uv = self.sampling_offsets(query).view(bs, nq, h, l, p, 2)
        off_d = self.sampling_offsets_depth(query).view(bs, nq, h, l, p, 1)
        offsets = torch.cat([off_uv, off_d], dim=-1)
        attn = self.attention_weights(query).view(bs, nq, h, l * p)
        attn = attn.softmax(-1).view(bs, nq, h, l, p)

        normalizer = torch.tensor([[fw, fh, d_size]], dtype=torch.float32)
        locs = reference_points[:, :, None, None] + offsets / normalizer[
            None, None, None, :, None, :
        ]
        locs = locs.view(bs, nq, h, l, p, 3)
        return dfa3d_sample(v, dpt, shapes, locs[:, :, :, 0], attn[:, :, :, 0])


class DeformCrossAttention(nn.Module):
    """Reference DeformCrossAttention_DFA3D
    (deformable_cross_attention.py:691-837): per-camera visible-query
    rebatch, stage-1 projected-point sample (weights 1), stage-2 deformable
    attention, masked-mean + MultiheadAttention pooling fusion."""

    def __init__(self, embed_dims, num_heads, num_points):
        super().__init__()
        self.embed_dims = embed_dims
        self.deformable_attention = MSDeformableAttention3D(
            embed_dims, num_heads, num_points
        )
        self.output_proj = nn.Linear(embed_dims, embed_dims)
        self.attention_pooling = nn.MultiheadAttention(embed_dims, 8)

    def forward(self, query, value_cams, dpt_cams, ref_cam, bev_mask, shapes):
        """query: (1, K, C); value_cams: (cams, HW, C); dpt_cams: (cams, HW, D);
        ref_cam: (cams, K, 3); bev_mask: (cams, K) bool."""
        inp_residual = query
        bs, nq, c = query.shape
        num_cams = value_cams.shape[0]

        indexes = [m.nonzero().squeeze(-1) for m in bev_mask]
        max_len = max(len(i) for i in indexes)
        queries_rebatch = query.new_zeros(num_cams, max_len, c)
        ref_rebatch = ref_cam.new_zeros(num_cams, max_len, 1, 3)
        for i in range(num_cams):
            idx = indexes[i]
            queries_rebatch[i, : len(idx)] = query[0, idx]
            ref_rebatch[i, : len(idx), 0] = ref_cam[i, idx]

        # stage 1: projected-point sample, heads=1, P=1, weights 1
        v1 = value_cams.view(num_cams, -1, 1, c)
        locs1 = ref_rebatch.view(num_cams, max_len, 1, 1, 3)
        attn1 = torch.ones(num_cams, max_len, 1, 1)
        dpt1 = dpt_cams.view(num_cams, -1, 1, dpt_cams.shape[-1])
        queries_per_image = dfa3d_sample(
            v1, dpt1, shapes, locs1, attn1
        )

        # stage 2: deformable attention (REPLACES stage-1 output)
        queries = self.deformable_attention(
            queries_per_image, value_cams, dpt_cams,
            ref_rebatch.view(num_cams, max_len, 1, 3), shapes,
        )

        # scatter back + masked-mean fusion
        slots = torch.zeros(num_cams, nq, c)
        for i in range(num_cams):
            idx = indexes[i]
            slots[i, idx] = queries[i, : len(idx)]
        count = bev_mask.sum(dim=0)  # (K,)
        valid_index = count.nonzero().squeeze(-1)
        valid_num = count[valid_index].to(slots.dtype)
        valid_slots = slots[:, valid_index]  # (cams, L, C)
        valid_mask = bev_mask[:, valid_index]  # (cams, L)
        slots_mean = (valid_slots * valid_mask[..., None]).sum(0) / valid_num[
            :, None
        ]
        slots_mean = self.output_proj(slots_mean)  # (L, C)

        q = slots_mean[None]  # (1, L, C) seq-first
        kv = valid_slots  # (cams, L, C)
        key_padding = ~valid_mask.transpose(0, 1)  # (L, cams)
        slots_mean, _ = self.attention_pooling(q, kv, kv, key_padding)

        output = torch.zeros(bs, nq, c)
        output[:, valid_index] = slots_mean[0]
        return output + inp_residual


class _FfnInner(nn.Module):
    def __init__(self, c, cff):
        super().__init__()
        self.layers = nn.ModuleList(
            [nn.Sequential(nn.Linear(c, cff), nn.ReLU()), nn.Linear(cff, c)]
        )

    def forward(self, x):
        return x + self.layers[1](self.layers[0](x))


class VoxFormerLayer(nn.Module):
    """cross_attn -> norm -> ffn -> norm."""

    def __init__(self, embed_dims, num_heads, num_points):
        super().__init__()
        self.attentions = nn.ModuleList(
            [DeformCrossAttention(embed_dims, num_heads, num_points)]
        )
        self.ffns = nn.ModuleList([_FfnInner(embed_dims, embed_dims * 2)])
        self.norms = nn.ModuleList(
            [nn.LayerNorm(embed_dims), nn.LayerNorm(embed_dims)]
        )

    def forward(self, query, value_cams, dpt_cams, ref_cam, bev_mask, shapes):
        q = self.attentions[0](query, value_cams, dpt_cams, ref_cam, bev_mask, shapes)
        q = self.norms[0](q)
        q = self.ffns[0](q)
        return self.norms[1](q)


class _Encoder(nn.Module):
    def __init__(self, embed_dims, num_heads, num_points):
        super().__init__()
        self.layers = nn.ModuleList(
            [VoxFormerLayer(embed_dims, num_heads, num_points)]
        )

    def forward(self, *args):
        return self.layers[0](*args)


class _Transformer(nn.Module):
    def __init__(self, embed_dims, num_heads, num_points):
        super().__init__()
        self.encoder = _Encoder(embed_dims, num_heads, num_points)


def point_sampling(ref_points, origin, projection, img_shape, dbound):
    """encoder.py:177-223 semantics. ref_points: (K, 3); projection:
    (cams, 3, 4). Returns ref_cam (cams, K, 3), mask (cams, K)."""
    eps = 1e-5
    ogfh, ogfw = img_shape
    pts = ref_points + origin[None]
    hom = torch.cat([pts, torch.ones_like(pts[:, :1])], dim=-1)
    cam = torch.einsum("nij,kj->nki", projection, hom)
    d = cam[..., 2]
    uv = cam[..., :2] / torch.clamp(d, min=eps)[..., None]
    u = uv[..., 0] / ogfw
    v = uv[..., 1] / ogfh
    d_norm = (d - dbound[0]) / (dbound[1] - dbound[0])
    mask = (
        (d > eps) & (u > eps) & (u < 1 - eps) & (v > eps) & (v < 1 - eps)
    )
    return torch.stack([u, v, d_norm], dim=-1), mask


class BaseHead(nn.Module):
    """DenseHead (DenseHead.py:10-84): zero queries, transformer over
    unmasked voxels, scatter back to a dense volume."""

    def __init__(self, embed_dims, n_voxels, voxel_size, num_heads, num_points):
        super().__init__()
        self.embed_dims = embed_dims
        self.n_voxels = n_voxels
        self.voxel_size = voxel_size
        self.cross_transformer = _Transformer(embed_dims, num_heads, num_points)
        nv = torch.tensor(n_voxels, dtype=torch.float32)
        vs = torch.tensor(voxel_size, dtype=torch.float32)
        pts = torch.stack(
            torch.meshgrid(
                torch.arange(n_voxels[0]),
                torch.arange(n_voxels[1]),
                torch.arange(n_voxels[2]),
                indexing="ij",
            )
        ).to(torch.float32)
        origin_new = -nv / 2.0 * vs
        pts = pts * vs.view(3, 1, 1, 1) + origin_new.view(3, 1, 1, 1)
        self.ref_3d = pts.view(3, -1).permute(1, 0)  # (V, 3)

    def forward(self, feat, dpt_dist, origin, projection, img_shape, dbound,
                proposal=None):
        """feat: (cams, C, H, W); dpt_dist: (cams, D, H, W)."""
        cams, c, h, w = feat.shape
        total = self.ref_3d.shape[0]
        if proposal is None:
            unmasked = torch.arange(total)
        else:
            unmasked = (proposal > 0).nonzero().squeeze(-1)
        ref = self.ref_3d[unmasked]
        ref_cam, mask = point_sampling(ref, origin, projection, img_shape, dbound)
        value_cams = feat.flatten(2).permute(0, 2, 1)  # (cams, HW, C)
        dpt_cams = dpt_dist.flatten(2).permute(0, 2, 1)  # (cams, HW, D)
        query = torch.zeros(1, len(unmasked), self.embed_dims)
        seeds = self.cross_transformer.encoder(
            query, value_cams, dpt_cams, ref_cam, mask, ((h, w),)
        )[0]
        vol = torch.zeros(total, self.embed_dims)
        vol[unmasked] = seeds
        return (
            vol.view(*self.n_voxels, self.embed_dims)
            .permute(3, 0, 1, 2)
            .unsqueeze(0)
        )


class AdaptiveSparseHead(nn.Module):
    """AdaptiveSparseHead.py:9-103 coarse-to-fine loop."""

    def __init__(self, embed_dims, n_voxels_list, voxel_size_list, topk_list,
                 num_heads, num_points):
        super().__init__()
        self.n_voxels_list = n_voxels_list
        self.topk_list = topk_list
        self.base_heads = nn.ModuleList(
            [
                BaseHead(embed_dims, nv, vs, num_heads, num_points)
                for nv, vs in zip(n_voxels_list, voxel_size_list)
            ]
        )
        self.occ_pred_heads = nn.ModuleList(
            [
                nn.Sequential(nn.Linear(embed_dims, 1), nn.Sigmoid())
                for _ in range(len(n_voxels_list) - 1)
            ]
        )

    def forward(self, mlvl_feats, mlvl_dpt_dists, origin, projection,
                img_shape, dbound):
        """mlvl_feats: list (cams, C, H, W) finest first (FPN order)."""
        n_levels = len(self.base_heads)
        img_h, img_w = img_shape
        finest_ds = 4
        volume = None
        occ_preds_list = []
        valid = None
        for i in range(n_levels):
            ds = finest_ds * (2 ** (n_levels - 1 - i))
            h_i, w_i = img_h // ds, img_w // ds
            fi = n_levels - 1 - i
            feat = mlvl_feats[fi][:, :, :h_i, :w_i]
            dpt = mlvl_dpt_dists[fi][:, :, :h_i, :w_i]
            if i == 0:
                volume = self.base_heads[i](
                    feat, dpt, origin, projection, img_shape, dbound
                )
            else:
                upsampled = F.interpolate(
                    volume, scale_factor=2, mode="trilinear", align_corners=False
                )
                occ = self.occ_pred_heads[i - 1](
                    upsampled.permute(0, 2, 3, 4, 1)
                ).reshape(1, -1)
                occ_preds_list.append(occ)
                k = self.topk_list[i - 1]
                _, top_idx = torch.topk(occ, k, dim=1)
                proposal = torch.zeros_like(occ)
                proposal.scatter_(1, top_idx, 1.0)
                proposal = proposal.squeeze(0)
                volume = upsampled + self.base_heads[i](
                    feat, dpt, origin, projection, img_shape, dbound,
                    proposal=proposal,
                )
                if i == n_levels - 1:
                    valid = (
                        proposal.view(*self.n_voxels_list[-1]).bool().long()
                    )
        occ_preds = (
            torch.cat(occ_preds_list[::-1], dim=1) if occ_preds_list else None
        )
        return volume, valid, occ_preds
