"""Per-stage device timing of the SGCDet forward at the 40-view setting.

Times each stage as its own jitted function with real intermediate inputs
(slope method: difference of pipelined 1- and 7-iteration runs), so the
split is measured, not guessed.  Run: python -m experiments.profile_stages
"""
import time

import jax
import jax.numpy as jnp

from __graft_entry__ import _example_scene
from sgcdet_tpu.configs.config import get_config
from sgcdet_tpu.models import SGCDet
from sgcdet_tpu.models.depth_net import DepthNetFusion
from sgcdet_tpu.models.det_head import ImVoxelHead
from sgcdet_tpu.models.fpn import FPN
from sgcdet_tpu.models.layers import interpolate_nearest_size, set_compute_dtype
from sgcdet_tpu.models.neck3d import FastIndoorImVoxelNeck
from sgcdet_tpu.models.resnet import ResNet
from sgcdet_tpu.models.sparse_head import AdaptiveSparseVolume


def slope_time(fn, *args, iters=6):
    """Times a scalar-reduced version of fn (the axon tunnel's
    block_until_ready can return early; a host fetch forces completion)."""

    @jax.jit
    def scalar_fn(*a):
        out = fn(*a)
        return sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                   for x in jax.tree_util.tree_leaves(out))

    float(scalar_fn(*args))

    def run(m):
        t0 = time.perf_counter()
        o = None
        for _ in range(m):
            o = scalar_fn(*args)
        float(o)
        return time.perf_counter() - t0

    lo = min(run(1), run(1))
    hi = min(run(1 + iters), run(1 + iters))
    return (hi - lo) / iters


def main(cfg_name="scannet", n_views=40, trajectory="ring", budget=None):
    import dataclasses

    import numpy as np

    cfg = get_config(cfg_name)
    scene = _example_scene(cfg.data.img_shape, cfg.data.pad_size, n_views,
                           trajectory=trajectory)
    if budget == "auto":
        from sgcdet_tpu.utils.visibility import derive_visibility_budgets

        budget = derive_visibility_budgets(
            [(np.asarray(scene["origin"]), np.asarray(scene["proj_img"]))],
            cfg.data.img_shape, cfg.model,
        )
        print(f"auto per-level visibility budgets: "
              f"{[round(b, 3) for b in budget]}")
        if all(b >= 1.0 for b in budget):
            budget = None
    mcfg = dataclasses.replace(cfg.model, visibility_budget=budget)
    set_compute_dtype(mcfg.compute_dtype)

    model = SGCDet(cfg=mcfg, img_shape=cfg.data.img_shape, query_chunk=100)
    variables = jax.jit(lambda r, a, b, c, d: model.init(
        {"params": r}, a, b, c, d, train=False
    ))(jax.random.PRNGKey(0), scene["imgs"], scene["proj_img"],
       scene["proj_feat4"], scene["origin"])

    def sub(name):
        return {k: v[name] for k, v in variables.items() if name in v}

    backbone = ResNet(depth=50)
    fpn = FPN(out_channels=mcfg.embed_dims)
    depth = DepthNetFusion(dbound=mcfg.dbound,
                           neighbor_img_num=mcfg.neighbor_img_num,
                           mono_channels=mcfg.embed_dims)
    lifting = AdaptiveSparseVolume(
        embed_dims=mcfg.embed_dims, voxel_size_list=mcfg.voxel_size_list,
        n_voxels_list=mcfg.n_voxels_list, topk_list=mcfg.topk_list,
        num_heads=mcfg.num_heads, num_points=mcfg.num_points,
        ffn_dropout=mcfg.ffn_dropout, query_chunk=100,
        visibility_budget=mcfg.visibility_budget)
    neck3d = FastIndoorImVoxelNeck(out_channels=mcfg.neck3d_out_channels,
                                   n_blocks=mcfg.neck3d_n_blocks)
    head = ImVoxelHead(n_classes=mcfg.n_classes, n_reg_outs=mcfg.n_reg_outs,
                       n_scales=mcfg.n_scales, head_type=mcfg.head_type)

    # params ride as jit ARGUMENTS, not closure constants — embedding them in
    # the HLO blows past the axon remote-compile request size limit (HTTP 413)
    f_backbone = jax.jit(lambda p, im: backbone.apply(p, im, False))
    x = f_backbone(sub("backbone"), scene["imgs"])
    f_fpn = jax.jit(lambda p, x: fpn.apply(p, x))
    feats = f_fpn(sub("neck"), x)
    f_depth = jax.jit(lambda p, f0, im, p4: depth.apply(p, f0, im, p4, False))
    dpt = f_depth(sub("depth_head"), feats[0], scene["imgs"],
                  scene["proj_feat4"])
    h4, w4 = dpt.shape[-2:]
    mlvl = [dpt, interpolate_nearest_size(dpt, (h4 // 2, w4 // 2)),
            interpolate_nearest_size(dpt, (h4 // 4, w4 // 4))]
    f_lift = jax.jit(lambda pr, f, m, o, p: lifting.apply(
        pr, f, m, o, p, cfg.data.img_shape, mcfg.dbound, False))
    vol, valid, occ = f_lift(sub("voxel_head"), feats[:3], mlvl,
                             scene["origin"], scene["proj_img"])
    f_neck = jax.jit(lambda p, v: neck3d.apply(p, v[None], False))
    nouts = f_neck(sub("neck_3d"), vol)
    f_head = jax.jit(lambda p, n: head.apply(p, n))

    stages = [
        ("backbone", f_backbone, (sub("backbone"), scene["imgs"])),
        ("fpn", f_fpn, (sub("neck"), x)),
        ("depth", f_depth,
         (sub("depth_head"), feats[0], scene["imgs"], scene["proj_feat4"])),
        ("lifting", f_lift,
         (sub("voxel_head"), feats[:3], mlvl, scene["origin"],
          scene["proj_img"])),
        ("neck3d", f_neck, (sub("neck_3d"), vol)),
        ("head", f_head, (sub("bbox_head"), nouts)),
    ]
    total = 0.0
    for name, fn, args in stages:
        t = slope_time(fn, *args)
        total += t
        print(f"{name:10s} {t*1e3:8.1f} ms")
    print(f"{'total':10s} {total*1e3:8.1f} ms  "
          f"({1.0/total:.2f} scenes/s stage-sum)")


if __name__ == "__main__":
    import sys

    main(*(sys.argv[1:2] or ["scannet"]),
         n_views=int(sys.argv[2]) if len(sys.argv) > 2 else 40,
         trajectory=sys.argv[3] if len(sys.argv) > 3 else "ring",
         budget="auto" if len(sys.argv) > 4 and sys.argv[4] == "auto" else None)
