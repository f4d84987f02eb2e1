"""Full-model torch->flax converter coverage: fabricate a reference-named
state dict for EVERY weight family and check every matching flax leaf is
overwritten with the correctly transposed values."""
import numpy as np
import pytest

import jax

from sgcdet_tpu.train.checkpoint import convert_torch_state_dict
from tests.test_model_forward import make_scene, tiny_config
from sgcdet_tpu.configs import scannet
from sgcdet_tpu.models import SGCDet


@pytest.fixture(scope="module")
def tiny_variables():
    cfg = tiny_config(scannet())
    scene = make_scene(cfg.data.img_shape, cfg.data.pad_size)
    model = SGCDet(cfg=cfg.model, img_shape=cfg.data.img_shape, query_chunk=None)
    variables = jax.jit(
        lambda r, a, b, c, d: model.init({"params": r}, a, b, c, d, train=False)
    )(jax.random.PRNGKey(0), scene["imgs"], scene["proj_img"],
      scene["proj_feat4"], scene["origin"])
    return cfg, variables


def _fabricate_sd(params, stats):
    """Build a torch-named random state dict by inverting the converter's
    mapping for every flax leaf we know how to name."""
    rng = np.random.RandomState(0)
    sd = {}

    def conv_t(k):  # flax (kh, kw, in, out) -> torch (out, in, kh, kw)
        return np.transpose(k, (3, 2, 0, 1))

    def conv3_t(k):
        return np.transpose(k, (4, 3, 0, 1, 2))

    def lin_t(k):
        return np.transpose(k, (1, 0))

    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_s = jax.tree_util.tree_flatten_with_path(stats)[0]

    def pathstr(path):
        return "/".join(p.key for p in path)

    # name translations flax->torch
    def torch_name(fp):
        t = fp
        t = t.replace("backbone/", "backbone.")
        t = t.replace("neck/lateral_", "neck.lateral_convs.TMP")
        t = t.replace("neck/fpn_", "neck.fpn_convs.TMP2")
        for s in range(1, 5):
            for b in range(25):
                t = t.replace(f"layer{s}_{b}/", f"layer{s}.{b}.")
        t = t.replace("downsample_conv", "downsample.0")
        t = t.replace("downsample_bn", "downsample.1")
        return t

    for path, leaf in flat_p + flat_s:
        fp = pathstr(path)
        val = rng.randn(*np.shape(leaf)).astype(np.float32) if np.ndim(leaf) else np.float32(rng.randn())
        parts = fp.split("/")
        is_stat = (path, leaf) in [(p, l) for p, l in flat_s]
        # handled families below; anything unmatched is simply absent from sd
        # (converter must leave it untouched)
        sd_key = None
        tv = val
        leafname = parts[-1]
        bn_leaf = {"scale": "weight", "bias": "bias", "mean": "running_mean", "var": "running_var"}
        if parts[0] == "bbox_head":
            if leafname == "kernel":
                sd_key = f"bbox_head.{parts[1]}.weight"
                tv = conv3_t(val)
            elif leafname == "bias":
                sd_key = f"bbox_head.{parts[1]}.bias"
            elif parts[1].startswith("scale"):
                sd_key = f"bbox_head.scales.{parts[1][-1]}.scale"
                tv = np.asarray([val], np.float32)
        elif parts[0] == "backbone":
            base = "backbone." + ".".join(parts[1:-1])
            for s in range(1, 5):
                for b in range(25):
                    base = base.replace(f"layer{s}_{b}", f"layer{s}.{b}")
            base = base.replace("downsample_conv", "downsample.0").replace(
                "downsample_bn", "downsample.1")
            if leafname == "kernel":
                sd_key, tv = f"{base}.weight", conv_t(val)
            else:
                sd_key = f"{base}.{bn_leaf.get(leafname, leafname)}"
        elif parts[0] == "neck":
            i = parts[1].split("_")[-1]
            group = "lateral_convs" if parts[1].startswith("lateral") else "fpn_convs"
            if leafname == "kernel":
                sd_key, tv = f"neck.{group}.{i}.conv.weight", conv_t(val)
            else:
                sd_key = f"neck.{group}.{i}.conv.bias"
        elif fp.startswith("voxel_head/occ_pred_head"):
            i = parts[1][-1]
            if leafname == "kernel":
                sd_key, tv = f"voxel_head.occ_pred_heads.{i}.0.weight", lin_t(val)
            else:
                sd_key = f"voxel_head.occ_pred_heads.{i}.0.bias"
        if sd_key is not None:
            sd[sd_key] = tv
    return sd


def test_converter_overwrites_all_covered_families(tiny_variables):
    cfg, variables = tiny_variables
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    sd = _fabricate_sd(params, stats)
    assert len(sd) > 100  # backbone alone has ~160 tensors

    new_p, new_s = convert_torch_state_dict(sd, params, stats)

    # every backbone conv kernel must have been overwritten with the transpose
    n_checked = 0
    for key, val in sd.items():
        if key.endswith("conv1.weight") and key.startswith("backbone.layer1.0"):
            got = new_p["backbone"]["layer1_0"]["conv1"]["kernel"]
            np.testing.assert_allclose(got, np.transpose(val, (2, 3, 1, 0)))
            n_checked += 1
        if key == "backbone.bn1.running_mean":
            np.testing.assert_allclose(new_s["backbone"]["bn1"]["mean"], val)
            n_checked += 1
        if key == "neck.lateral_convs.0.conv.weight":
            np.testing.assert_allclose(
                new_p["neck"]["lateral_0"]["kernel"], np.transpose(val, (2, 3, 1, 0)))
            n_checked += 1
        if key == "bbox_head.cls_conv.weight":
            np.testing.assert_allclose(
                new_p["bbox_head"]["cls_conv"]["kernel"], np.transpose(val, (2, 3, 4, 1, 0)))
            n_checked += 1
        if key == "voxel_head.occ_pred_heads.0.0.weight":
            np.testing.assert_allclose(
                new_p["voxel_head"]["occ_pred_head0"]["kernel"], val.T)
            n_checked += 1
    assert n_checked >= 5

    # count how many leaves changed: the covered families should all differ
    changed = 0
    total = 0
    for (path, old), (_, new) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(new_p)[0],
    ):
        total += 1
        if np.ndim(old) and not np.allclose(old, new):
            changed += 1
    # backbone (~160) + neck (16) + bbox head (3+3) + occ heads (4)
    assert changed > 150, f"only {changed}/{total} leaves converted"


def test_converter_transformer_and_depth_families(tiny_variables):
    """Spot-check the transformer + depth-head naming paths."""
    cfg, variables = tiny_variables
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    rng = np.random.RandomState(1)
    e = cfg.model.embed_dims

    da = params["voxel_head"]["base_head0"]["layer0"]["cross_attn"]["deformable_attention"]
    so_shape = da["sampling_offsets"]["kernel"].shape  # (e, h*l*p*2)
    mha = params["voxel_head"]["base_head0"]["layer0"]["cross_attn"]["attention_pooling"]

    sd = {
        "voxel_head.base_heads.0.cross_transformer.encoder.layers.0.attentions.0"
        ".deformable_attention.sampling_offsets.weight": rng.randn(so_shape[1], so_shape[0]).astype(np.float32),
        "voxel_head.base_heads.0.cross_transformer.encoder.layers.0.attentions.0"
        ".deformable_attention.sampling_offsets.bias": rng.randn(so_shape[1]).astype(np.float32),
        "voxel_head.base_heads.0.cross_transformer.encoder.layers.0.attentions.0"
        ".deformable_attention.sampling_offsets_depth.weight": rng.randn(so_shape[1] // 2, e).astype(np.float32),
        "voxel_head.base_heads.0.cross_transformer.encoder.layers.0.attentions.0"
        ".deformable_attention.sampling_offsets_depth.bias": rng.randn(so_shape[1] // 2).astype(np.float32),
        "voxel_head.base_heads.0.cross_transformer.encoder.layers.0.attentions.0"
        ".deformable_attention.attention_weights.weight": rng.randn(so_shape[1] // 2, e).astype(np.float32),
        "voxel_head.base_heads.0.cross_transformer.encoder.layers.0.attentions.0"
        ".deformable_attention.attention_weights.bias": rng.randn(so_shape[1] // 2).astype(np.float32),
        "voxel_head.base_heads.0.cross_transformer.encoder.layers.0.attentions.0"
        ".deformable_attention.value_proj.weight": rng.randn(e, e).astype(np.float32),
        "voxel_head.base_heads.0.cross_transformer.encoder.layers.0.attentions.0"
        ".deformable_attention.value_proj.bias": rng.randn(e).astype(np.float32),
        "voxel_head.base_heads.0.cross_transformer.encoder.layers.0.attentions.0"
        ".output_proj.weight": rng.randn(e, e).astype(np.float32),
        "voxel_head.base_heads.0.cross_transformer.encoder.layers.0.attentions.0"
        ".output_proj.bias": rng.randn(e).astype(np.float32),
        "voxel_head.base_heads.0.cross_transformer.encoder.layers.0.attentions.0"
        ".attention_pooling.in_proj_weight": rng.randn(3 * e, e).astype(np.float32),
        "voxel_head.base_heads.0.cross_transformer.encoder.layers.0.attentions.0"
        ".attention_pooling.in_proj_bias": rng.randn(3 * e).astype(np.float32),
        "voxel_head.base_heads.0.cross_transformer.encoder.layers.0.attentions.0"
        ".attention_pooling.out_proj.weight": rng.randn(e, e).astype(np.float32),
        "voxel_head.base_heads.0.cross_transformer.encoder.layers.0.attentions.0"
        ".attention_pooling.out_proj.bias": rng.randn(e).astype(np.float32),
        "voxel_head.base_heads.0.cross_transformer.encoder.layers.0"
        ".ffns.0.layers.0.0.weight": rng.randn(2 * e, e).astype(np.float32),
        "voxel_head.base_heads.0.cross_transformer.encoder.layers.0"
        ".ffns.0.layers.0.0.bias": rng.randn(2 * e).astype(np.float32),
        "voxel_head.base_heads.0.cross_transformer.encoder.layers.0"
        ".ffns.0.layers.1.weight": rng.randn(e, 2 * e).astype(np.float32),
        "voxel_head.base_heads.0.cross_transformer.encoder.layers.0"
        ".ffns.0.layers.1.bias": rng.randn(e).astype(np.float32),
        "voxel_head.base_heads.0.cross_transformer.encoder.layers.0"
        ".norms.0.weight": rng.randn(e).astype(np.float32),
        "voxel_head.base_heads.0.cross_transformer.encoder.layers.0"
        ".norms.0.bias": rng.randn(e).astype(np.float32),
        "voxel_head.base_heads.0.cross_transformer.encoder.layers.0"
        ".norms.1.weight": rng.randn(e).astype(np.float32),
        "voxel_head.base_heads.0.cross_transformer.encoder.layers.0"
        ".norms.1.bias": rng.randn(e).astype(np.float32),
        "depth_head.fnet_mono.conv.weight": np.transpose(
            np.asarray(params["depth_head"]["fnet_mono"]["conv"]["kernel"]),
            (3, 2, 0, 1)) * 0 + rng.randn(*np.transpose(
                params["depth_head"]["fnet_mono"]["conv"]["kernel"], (3, 2, 0, 1)).shape
            ).astype(np.float32),
        "depth_head.fnet_mono.bn.weight": rng.randn(128).astype(np.float32),
        "depth_head.fnet_mono.bn.bias": rng.randn(128).astype(np.float32),
        "depth_head.fnet_mono.bn.running_mean": rng.randn(128).astype(np.float32),
        "depth_head.fnet_mono.bn.running_var": np.abs(rng.randn(128)).astype(np.float32),
    }
    new_p, new_s = convert_torch_state_dict(sd, params, stats)
    lyr = new_p["voxel_head"]["base_head0"]["layer0"]
    np.testing.assert_allclose(
        lyr["cross_attn"]["deformable_attention"]["sampling_offsets"]["kernel"],
        sd["voxel_head.base_heads.0.cross_transformer.encoder.layers.0.attentions.0"
           ".deformable_attention.sampling_offsets.weight"].T)
    np.testing.assert_allclose(
        lyr["cross_attn"]["attention_pooling"]["in_proj_kernel"],
        sd["voxel_head.base_heads.0.cross_transformer.encoder.layers.0.attentions.0"
           ".attention_pooling.in_proj_weight"].T)
    np.testing.assert_allclose(
        lyr["ffn"]["fc1"]["kernel"],
        sd["voxel_head.base_heads.0.cross_transformer.encoder.layers.0"
           ".ffns.0.layers.0.0.weight"].T)
    np.testing.assert_allclose(
        lyr["norm2"]["scale"],
        sd["voxel_head.base_heads.0.cross_transformer.encoder.layers.0.norms.1.weight"])
    np.testing.assert_allclose(
        new_s["depth_head"]["fnet_mono"]["bn"]["mean"],
        sd["depth_head.fnet_mono.bn.running_mean"])


def test_torchvision_pretrained_conversion(tiny_variables):
    """ImageNet warm start: plain torchvision resnet50 (backbone) + resnet18
    (matching extractor) dicts, incl. the downsample.1 -> bn3 alias and
    ignoring fc./num_batches_tracked junk (extractor_matching.py:56-66)."""
    from sgcdet_tpu.train.checkpoint import convert_torchvision_pretrained

    cfg, variables = tiny_variables
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    rng = np.random.RandomState(3)

    def conv_t(k):
        return np.transpose(np.asarray(k), (3, 2, 0, 1))

    # --- torchvision-style resnet50 dict generated from the flax shapes ---
    backbone_sd = {"fc.weight": rng.randn(1000, 8).astype(np.float32),
                   "fc.bias": rng.randn(1000).astype(np.float32)}

    def emit_bn(tp, shape):
        for tn in ("weight", "bias", "running_mean", "running_var"):
            backbone_sd[f"{tp}.{tn}"] = rng.rand(*shape).astype(np.float32) + 0.1
        backbone_sd[f"{tp}.num_batches_tracked"] = np.asarray(7, np.int64)

    bb = params["backbone"]
    backbone_sd["conv1.weight"] = rng.randn(*conv_t(bb["conv1"]["kernel"]).shape).astype(np.float32)
    emit_bn("bn1", stats["backbone"]["bn1"]["mean"].shape)
    for name, node in bb.items():
        if "_" not in name or not name.startswith("layer"):
            continue
        s, b = name.replace("layer", "").split("_")
        tp = f"layer{s}.{b}"
        for i in (1, 2, 3):
            if f"conv{i}" in node:
                backbone_sd[f"{tp}.conv{i}.weight"] = rng.randn(
                    *conv_t(node[f"conv{i}"]["kernel"]).shape).astype(np.float32)
                emit_bn(f"{tp}.bn{i}", stats["backbone"][name][f"bn{i}"]["mean"].shape)
        if "downsample_conv" in node:
            backbone_sd[f"{tp}.downsample.0.weight"] = rng.randn(
                *conv_t(node["downsample_conv"]["kernel"]).shape).astype(np.float32)
            emit_bn(f"{tp}.downsample.1",
                    stats["backbone"][name]["downsample_bn"]["mean"].shape)

    # --- torchvision-style resnet18 dict for the matching extractor ---
    matching_sd = {"fc.weight": rng.randn(1000, 8).astype(np.float32)}
    fm = params["depth_head"]["fnet_mvs"]
    fs = stats["depth_head"]["fnet_mvs"]
    matching_sd["conv1.weight"] = rng.randn(*conv_t(fm["conv1"]["kernel"]).shape).astype(np.float32)
    for tn, fn in (("weight", "scale"), ("bias", "bias")):
        matching_sd[f"bn1.{tn}"] = rng.randn(*fm["bn1"][fn].shape).astype(np.float32)
    for tn, fn in (("running_mean", "mean"), ("running_var", "var")):
        matching_sd[f"bn1.{tn}"] = rng.rand(*fs["bn1"][fn].shape).astype(np.float32) + 0.1
    for lname in ("layer1", "layer2"):
        for b in (0, 1):
            node = fm[f"{lname}_{b}"]
            snode = fs[f"{lname}_{b}"]
            tp = f"{lname}.{b}"
            for i in (1, 2):
                matching_sd[f"{tp}.conv{i}.weight"] = rng.randn(
                    *conv_t(node[f"conv{i}"]["kernel"]).shape).astype(np.float32)
                for tn, fn in (("weight", "scale"), ("bias", "bias")):
                    matching_sd[f"{tp}.bn{i}.{tn}"] = rng.randn(
                        *node[f"bn{i}"][fn].shape).astype(np.float32)
                for tn, fn in (("running_mean", "mean"), ("running_var", "var")):
                    matching_sd[f"{tp}.bn{i}.{tn}"] = rng.rand(
                        *snode[f"bn{i}"][fn].shape).astype(np.float32) + 0.1
            if "downsample_conv" in node:
                matching_sd[f"{tp}.downsample.0.weight"] = rng.randn(
                    *conv_t(node["downsample_conv"]["kernel"]).shape).astype(np.float32)
                # torchvision names the downsample BN downsample.1 — the
                # converter must alias it onto the reference's bn3 slot
                for tn, fn in (("weight", "scale"), ("bias", "bias")):
                    matching_sd[f"{tp}.downsample.1.{tn}"] = rng.randn(
                        *node["bn3"][fn].shape).astype(np.float32)
                for tn, fn in (("running_mean", "mean"), ("running_var", "var")):
                    matching_sd[f"{tp}.downsample.1.{tn}"] = rng.rand(
                        *snode["bn3"][fn].shape).astype(np.float32) + 0.1

    new_p, new_s = convert_torchvision_pretrained(
        params, stats, backbone_sd=backbone_sd, matching_sd=matching_sd)

    np.testing.assert_allclose(
        new_p["backbone"]["conv1"]["kernel"],
        np.transpose(backbone_sd["conv1.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(
        new_s["backbone"]["bn1"]["var"], backbone_sd["bn1.running_var"])
    np.testing.assert_allclose(
        new_p["depth_head"]["fnet_mvs"]["conv1"]["kernel"],
        np.transpose(matching_sd["conv1.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(
        new_p["depth_head"]["fnet_mvs"]["layer2_0"]["bn3"]["scale"],
        matching_sd["layer2.0.downsample.1.weight"])
    np.testing.assert_allclose(
        new_s["depth_head"]["fnet_mvs"]["layer2_0"]["bn3"]["mean"],
        matching_sd["layer2.0.downsample.1.running_mean"])
    # final_conv_3ddet stays random-init (absent from torchvision dicts)
    np.testing.assert_allclose(
        new_p["depth_head"]["fnet_mvs"]["final_conv"]["kernel"],
        fm["final_conv"]["kernel"])
    # every backbone layer got overwritten
    changed = sum(
        1 for (pa, old), (_, new) in zip(
            jax.tree_util.tree_flatten_with_path(params["backbone"])[0],
            jax.tree_util.tree_flatten_with_path(new_p["backbone"])[0])
        if np.ndim(old) and not np.allclose(old, new))
    assert changed > 100
