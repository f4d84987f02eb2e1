"""Per-substage device timing of DepthNetFusion at the 40-view setting.

Decomposes the depth stage (matching extractor / plane sweep / U-Nets /
mono branch) the same way profile_stages.py decomposes the full forward.
Run: python -m experiments.profile_depth [cfg] [n_views] [trajectory]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _example_scene
from experiments.profile_stages import slope_time
from sgcdet_tpu.configs.config import get_config
from sgcdet_tpu.models.depth_net import (
    ConvBnReLU2D, DepthNetFusion, SimpleUnet2D, get_closest_frame_ids,
    plane_sweep_correlation,
)
from sgcdet_tpu.models.fpn import FPN
from sgcdet_tpu.models.layers import Conv, set_compute_dtype
from sgcdet_tpu.models.resnet import ResNet, ResNetFPNMatching


def main(cfg_name="scannet", n_views=40, trajectory="indoor"):
    cfg = get_config(cfg_name)
    scene = _example_scene(cfg.data.img_shape, cfg.data.pad_size, n_views,
                           trajectory=trajectory)
    mcfg = cfg.model
    set_compute_dtype(mcfg.compute_dtype)

    depth = DepthNetFusion(dbound=mcfg.dbound,
                           neighbor_img_num=mcfg.neighbor_img_num,
                           mono_channels=mcfg.embed_dims)

    backbone = ResNet(depth=50)
    fpn = FPN(out_channels=mcfg.embed_dims)
    bvars = jax.jit(lambda r, im: backbone.init({"params": r}, im, False))(
        jax.random.PRNGKey(0), scene["imgs"])
    x = jax.jit(lambda p, im: backbone.apply(p, im, False))(bvars, scene["imgs"])
    fvars = jax.jit(lambda r, x: fpn.init({"params": r}, x))(
        jax.random.PRNGKey(1), x)
    feats0 = jax.jit(lambda p, x: fpn.apply(p, x)[0])(fvars, x)

    dvars = jax.jit(lambda r, f0, im, p4: depth.init(
        {"params": r}, f0, im, p4, train=False
    ))(jax.random.PRNGKey(2), feats0, scene["imgs"], scene["proj_feat4"])

    def sub(name):
        return {k: v[name] for k, v in dvars.items() if name in v}

    d_ch = depth.depth_channels
    depth_values = jnp.asarray(
        np.arange(mcfg.dbound[0], mcfg.dbound[1], mcfg.dbound[2],
                  dtype=np.float32) + mcfg.dbound[2] / 2)

    fnet = ResNetFPNMatching(output_dim=128)
    f_fnet = jax.jit(lambda p, im: fnet.apply(p, im, False))
    f_mvs = f_fnet(sub("fnet_mvs"), scene["imgs"])

    n = n_views
    k = min(mcfg.neighbor_img_num, n - 1)
    neighbor_ids = get_closest_frame_ids(n, k)

    def sweep(fm, proj):
        corr = jnp.zeros((n, d_ch) + fm.shape[2:], fm.dtype)
        for j in range(k):
            nei = neighbor_ids[:, j]
            corr = corr + plane_sweep_correlation(
                fm[nei], fm, proj[nei], proj, depth_values)
        return corr / k

    f_sweep = jax.jit(sweep)
    corr = f_sweep(f_mvs, scene["proj_feat4"])

    unet_corr = SimpleUnet2D(d_ch)
    f_ucorr = jax.jit(lambda p, c: unet_corr.apply(p, c, False))
    cost_reg = f_ucorr(sub("correlation_regulation"), corr)

    mono_conv = ConvBnReLU2D(128)
    unet_mono = SimpleUnet2D(128)

    def mono(pc, pu, f0):
        return unet_mono.apply(pu, mono_conv.apply(pc, f0, False), False)

    f_mono = jax.jit(mono)
    mono_reg = f_mono(sub("fnet_mono"), sub("mono_regulation"), feats0)

    unet_fuse = SimpleUnet2D(d_ch + 128)
    conv_out = Conv(d_ch, 3, 1, 1)

    def fuse(pf, po, cr, mr):
        fused = unet_fuse.apply(pf, jnp.concatenate([cr, mr], axis=1), False)
        return jax.nn.softmax(conv_out.apply(po, fused).astype(jnp.float32), axis=1)

    f_fuse = jax.jit(fuse)
    f_fuse(sub("fusion_regulation"), sub("depth_reg"), cost_reg, mono_reg)

    stages = [
        ("fnet_mvs", f_fnet, (sub("fnet_mvs"), scene["imgs"])),
        ("sweep", f_sweep, (f_mvs, scene["proj_feat4"])),
        ("unet_corr", f_ucorr, (sub("correlation_regulation"), corr)),
        ("mono", f_mono, (sub("fnet_mono"), sub("mono_regulation"), feats0)),
        ("fuse", f_fuse,
         (sub("fusion_regulation"), sub("depth_reg"), cost_reg, mono_reg)),
    ]
    total = 0.0
    for name, fn, args in stages:
        t = slope_time(fn, *args)
        total += t
        print(f"{name:10s} {t*1e3:8.1f} ms")
    print(f"{'total':10s} {total*1e3:8.1f} ms")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["scannet"]),
         n_views=int(sys.argv[2]) if len(sys.argv) > 2 else 40,
         trajectory=sys.argv[3] if len(sys.argv) > 3 else "indoor")
