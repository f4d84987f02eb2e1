"""Released-scale converter key coverage (VERDICT r3 item 5).

Builds the reference SGCDet's EXACT state-dict key set at released ScanNet
scale (ResNet50 backbone, embed 256, 18 classes, 40x40x16 finest volume —
configs/SGCDet_ScanNet.py) from the torch transcriptions of the reference
module definitions (tests/torch_ref_sgcdet.py, tests/torch_ref_lifting.py,
themselves parity-tested against the flax rebuild at small scale), fills
every tensor with random values, runs ``convert_torch_state_dict``, and
asserts

  * every reference key is consumed (``unused_out`` empty — no reference
    weight silently dropped), and
  * every flax param/batch-stat leaf is overwritten (zero-initialized trees
    have no all-zero leaf left).

The flax variable tree is obtained with ``jax.eval_shape`` (abstract init —
no full-scale forward runs on CPU).
"""
import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sgcdet_tpu.configs import scannet
from sgcdet_tpu.models import SGCDet
from sgcdet_tpu.train.checkpoint import convert_torch_state_dict

from torch_ref_lifting import AdaptiveSparseHead as TorchVoxelHead
from torch_ref_sgcdet import (
    DepthNetFusion as TorchDepthNet,
    FastIndoorImVoxelNeck as TorchNeck3D,
    FPN as TorchFPN,
    ResNet50 as TorchResNet50,
    ScanNetHead as TorchScanNetHead,
)


@pytest.fixture(scope="module")
def released_scale_sd():
    """Reference-named state dict at released ScanNet scale, random values."""
    cfg = scannet()
    m = cfg.model
    torch.manual_seed(0)
    modules = {
        "backbone": TorchResNet50(),
        "neck": TorchFPN(out_channels=m.embed_dims),
        "depth_head": TorchDepthNet(m.dbound, neighbor_img_num=m.neighbor_img_num,
                                    mono_channels=m.embed_dims),
        "voxel_head": TorchVoxelHead(
            m.embed_dims, list(m.n_voxels_list), list(m.voxel_size_list),
            list(m.topk_list), m.num_heads, m.num_points),
        "neck_3d": TorchNeck3D(m.embed_dims, tuple(m.neck3d_n_blocks),
                               m.neck3d_out_channels),
        "bbox_head": TorchScanNetHead(m.neck3d_out_channels, m.n_classes, 6,
                                      m.n_scales),
    }
    rng = np.random.RandomState(1)
    sd = {}
    for prefix, mod in modules.items():
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = rng.standard_normal(tuple(v.shape)).astype(
                np.float32) if v.ndim else np.float32(rng.standard_normal())
    # the reference's DenseHead also registers geometry buffers into the
    # state dict (DenseHead.py:29-30) — config-derived, no flax equivalent
    for i, nv in enumerate(m.n_voxels_list):
        total = int(np.prod(nv))
        sd[f"voxel_head.base_heads.{i}.vox_coords"] = np.zeros(
            (total, 4), np.float32)
        sd[f"voxel_head.base_heads.{i}.ref_3d"] = np.zeros(
            (total, 3), np.float32)
    return cfg, sd


def test_released_scale_full_coverage(released_scale_sd):
    cfg, sd = released_scale_sd
    model = SGCDet(cfg=cfg.model, img_shape=cfg.data.img_shape,
                   query_chunk=100)
    n_views = 4
    hp, wp = cfg.data.pad_size
    abstract = jax.eval_shape(
        lambda r, a, b, c, d: model.init(
            {"params": r}, a, b, c, d, train=False),
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((n_views, 3, hp, wp), jnp.float32),
        jax.ShapeDtypeStruct((n_views, 3, 4), jnp.float32),
        jax.ShapeDtypeStruct((n_views, 4, 4), jnp.float32),
        jax.ShapeDtypeStruct((3,), jnp.float32),
    )
    zeros = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, np.float32), abstract)
    params0, stats0 = zeros["params"], zeros.get("batch_stats", {})

    unused: set = set()
    params, stats = convert_torch_state_dict(sd, params0, stats0,
                                             unused_out=unused)

    assert not unused, (
        f"{len(unused)} reference keys not consumed, e.g. "
        f"{sorted(unused)[:10]}")

    missed = [
        "/".join(str(k.key) for k in path)
        for tree in (params, stats)
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        if leaf.size and float(np.abs(leaf).max()) == 0.0
    ]
    assert not missed, (
        f"{len(missed)} flax leaves never overwritten, e.g. {missed[:10]}")


def test_released_scale_param_count_matches(released_scale_sd):
    """Total learned-element count must agree between the reference key set
    and the flax tree — a coarse but scale-sensitive parity check."""
    cfg, sd = released_scale_sd
    model = SGCDet(cfg=cfg.model, img_shape=cfg.data.img_shape,
                   query_chunk=100)
    hp, wp = cfg.data.pad_size
    abstract = jax.eval_shape(
        lambda r, a, b, c, d: model.init(
            {"params": r}, a, b, c, d, train=False),
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((4, 3, hp, wp), jnp.float32),
        jax.ShapeDtypeStruct((4, 3, 4), jnp.float32),
        jax.ShapeDtypeStruct((4, 4, 4), jnp.float32),
        jax.ShapeDtypeStruct((3,), jnp.float32),
    )
    n_flax = sum(
        int(np.prod(l.shape))
        for tree in (abstract["params"], abstract.get("batch_stats", {}))
        for l in jax.tree_util.tree_leaves(tree)
    )
    skip = ("num_batches_tracked", ".vox_coords", ".ref_3d")
    n_torch = sum(
        int(np.prod(v.shape)) if hasattr(v, "shape") else 1
        for k, v in sd.items()
        if not k.endswith(skip)
        # the matching extractor's downsample BN appears twice in the
        # reference state dict (bn3 alias, layer_matching.py:118-127)
        and not (k.startswith("depth_head.fnet_mvs.")
                 and ".downsample.1." in k)
    )
    assert n_flax == n_torch, (n_flax, n_torch)
