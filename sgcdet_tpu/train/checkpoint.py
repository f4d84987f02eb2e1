"""Checkpointing: orbax save/restore + released-PyTorch-weights conversion.

Reference behavior being mirrored: Lightning ModelCheckpoint every epoch
(main.py:55-61) and the `--load_from` warm-start that keeps "model."-prefixed
keys (pl_model.py:29-36). `convert_torch_state_dict` maps the reference's
state-dict naming (mmdet ResNet/FPN + the plugin modules) onto this
framework's flax param tree so released checkpoints evaluate directly.
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np
import jax

try:
    import orbax.checkpoint as ocp
except Exception:  # pragma: no cover
    ocp = None


# ---------------------------------------------------------------------------
# orbax wrappers
# ---------------------------------------------------------------------------


def save_checkpoint(path, state, step=None):
    """Save one per-step checkpoint dir and update the `last` pointer.

    Mirrors the reference's ModelCheckpoint(every_n_epochs=1, save_top_k=-1,
    save_last=True) retention (main.py:55-61): every epoch's checkpoint is
    kept and `last` names the newest for auto-resume.
    """
    import os

    path = os.path.abspath(path)  # orbax rejects relative paths
    n = int(step if step is not None else state.step)
    ckptr = ocp.StandardCheckpointer()
    # force: the post-loop final save may coincide with the last epoch save
    # (same step) — overwrite rather than crash
    ckptr.save(f"{path}/step_{n}", jax.tree_util.tree_map(np.asarray, state),
               force=True)
    ckptr.wait_until_finished()
    tmp = f"{path}/last.tmp"
    with open(tmp, "w") as f:
        f.write(f"step_{n}")
    os.replace(tmp, f"{path}/last")


def latest_checkpoint(path):
    """Newest checkpoint dir under `path` (via the `last` pointer, falling
    back to the max step_N dir), or None if none exists."""
    import os

    if not os.path.isdir(path):
        return None
    pointer = os.path.join(path, "last")
    if os.path.isfile(pointer):
        name = open(pointer).read().strip()
        cand = os.path.join(path, name)
        if os.path.isdir(cand):
            return cand
    steps = []
    for name in os.listdir(path):
        if name.startswith("step_") and name[5:].isdigit():
            steps.append(int(name[5:]))
    if not steps:
        return None
    return os.path.join(path, f"step_{max(steps)}")


def restore_checkpoint(path, abstract_state):
    import os

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), abstract_state)


# ---------------------------------------------------------------------------
# torch -> flax conversion
# ---------------------------------------------------------------------------


def _t_conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))


def _t_conv3d(w):
    return np.transpose(w, (2, 3, 4, 1, 0))


def _t_deconv2d(w):  # torch (in, out, kh, kw) -> (kh, kw, out, in)
    return np.transpose(w, (2, 3, 1, 0))


def _t_deconv3d(w):  # torch (in, out, kd, kh, kw) -> (kd, kh, kw, out, in)
    return np.transpose(w, (2, 3, 4, 1, 0))


def _t_linear(w):
    return np.transpose(w, (1, 0))


def _set(tree, path, value, strict=True):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        if k not in node:
            if strict:
                raise KeyError(f"missing branch {path}")
            return False
        node = node[k]
    leaf = keys[-1]
    if leaf not in node:
        if strict:
            raise KeyError(f"missing leaf {path}")
        return False
    if node[leaf].shape != value.shape:
        raise ValueError(f"shape mismatch at {path}: {node[leaf].shape} vs {value.shape}")
    node[leaf] = value.astype(np.float32)
    return True


def _bn(out_params, out_stats, flax_prefix, sd, torch_prefix, strict=True):
    pairs = [
        ("weight", out_params, "scale"),
        ("bias", out_params, "bias"),
        ("running_mean", out_stats, "mean"),
        ("running_var", out_stats, "var"),
    ]
    for tname, tree, fname in pairs:
        key = f"{torch_prefix}.{tname}"
        if key in sd:
            _set(tree, f"{flax_prefix}/{fname}", np.asarray(sd[key]), strict)


def _linear(out_params, flax_prefix, sd, torch_prefix, strict=True):
    _set(out_params, f"{flax_prefix}/kernel", _t_linear(np.asarray(sd[f"{torch_prefix}.weight"])), strict)
    if f"{torch_prefix}.bias" in sd:
        _set(out_params, f"{flax_prefix}/bias", np.asarray(sd[f"{torch_prefix}.bias"]), strict)


def _conv(out_params, flax_prefix, sd, torch_prefix, ndim=2, transpose=False, strict=True):
    w = np.asarray(sd[f"{torch_prefix}.weight"])
    if transpose:
        w = _t_deconv3d(w) if ndim == 3 else _t_deconv2d(w)
    else:
        w = _t_conv3d(w) if ndim == 3 else _t_conv2d(w)
    _set(out_params, f"{flax_prefix}/kernel", w, strict)
    if f"{torch_prefix}.bias" in sd:
        _set(out_params, f"{flax_prefix}/bias", np.asarray(sd[f"{torch_prefix}.bias"]), strict)


def _convert_unet(params, stats, sd, tp, fp, used):
    """SimpleUnet2D: conv1..conv4 are ConvBnReLU2D; conv9/conv11 are
    Sequential(ConvTranspose2d, BN, ReLU)."""
    for i in (1, 2, 3, 4):
        _conv(params, f"{fp}/conv{i}/conv", sd, f"{tp}.conv{i}.conv")
        _bn(params, stats, f"{fp}/conv{i}/bn", sd, f"{tp}.conv{i}.bn")
        used.update({f"{tp}.conv{i}.conv.weight"})
    _conv(params, f"{fp}/deconv9", sd, f"{tp}.conv9.0", transpose=True)
    _bn(params, stats, f"{fp}/debn9", sd, f"{tp}.conv9.1")
    _conv(params, f"{fp}/deconv11", sd, f"{tp}.conv11.0", transpose=True)
    _bn(params, stats, f"{fp}/debn11", sd, f"{tp}.conv11.1")


class _TrackingDict(dict):
    """dict that records which keys were actually read (``in`` checks and
    ``.keys()`` iteration do not count as consumption)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.accessed: set = set()

    def __getitem__(self, key):
        self.accessed.add(key)
        return super().__getitem__(key)


def convert_torch_state_dict(state_dict: Mapping[str, Any], params, batch_stats,
                             n_levels=3, strict=True, unused_out: set | None = None):
    """Convert a reference SGCDet state dict into (params, batch_stats).

    state_dict keys use the reference naming; Lightning checkpoints should be
    pre-filtered with :func:`strip_lightning_prefix`. Returns new trees (the
    inputs are not mutated).  If ``unused_out`` is a set, it is filled with
    every state-dict key the conversion never consumed (minus BN
    ``num_batches_tracked`` counters, which have no flax equivalent) — a
    non-empty result means a reference weight silently dropped on the floor.
    """
    sd = _TrackingDict({k: np.asarray(v) for k, v in state_dict.items()})
    params = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
    stats = jax.tree_util.tree_map(np.asarray, jax.device_get(batch_stats))
    used: set = set()

    # ---- backbone (mmdet ResNet-50, torchvision naming) ----
    if "backbone.conv1.weight" in sd:
        _conv(params, "backbone/conv1", sd, "backbone.conv1")
        _bn(params, stats, "backbone/bn1", sd, "backbone.bn1")
        blocks = {1: 3, 2: 4, 3: 6, 4: 3}
        for s, nb in blocks.items():
            for b in range(nb):
                tp = f"backbone.layer{s}.{b}"
                fp = f"backbone/layer{s}_{b}"
                for i in (1, 2, 3):
                    _conv(params, f"{fp}/conv{i}", sd, f"{tp}.conv{i}")
                    _bn(params, stats, f"{fp}/bn{i}", sd, f"{tp}.bn{i}")
                if f"{tp}.downsample.0.weight" in sd:
                    _conv(params, f"{fp}/downsample_conv", sd, f"{tp}.downsample.0")
                    _bn(params, stats, f"{fp}/downsample_bn", sd, f"{tp}.downsample.1")

    # ---- FPN ----
    for i in range(4):
        if f"neck.lateral_convs.{i}.conv.weight" in sd:
            _conv(params, f"neck/lateral_{i}", sd, f"neck.lateral_convs.{i}.conv")
            _conv(params, f"neck/fpn_{i}", sd, f"neck.fpn_convs.{i}.conv")

    # ---- depth head ----
    if "depth_head.fnet_mvs.conv1.weight" in sd:
        dp = "depth_head/fnet_mvs"
        _conv(params, f"{dp}/conv1", sd, "depth_head.fnet_mvs.conv1")
        _bn(params, stats, f"{dp}/bn1", sd, "depth_head.fnet_mvs.bn1")
        for layer, blocks_ in (("layer1", 2), ("layer2", 2)):
            for b in range(blocks_):
                tp = f"depth_head.fnet_mvs.{layer}.{b}"
                fp = f"{dp}/{layer}_{b}"
                _conv(params, f"{fp}/conv1", sd, f"{tp}.conv1")
                _conv(params, f"{fp}/conv2", sd, f"{tp}.conv2")
                _bn(params, stats, f"{fp}/bn1", sd, f"{tp}.bn1")
                _bn(params, stats, f"{fp}/bn2", sd, f"{tp}.bn2")
                if f"{tp}.downsample.0.weight" in sd:
                    _conv(params, f"{fp}/downsample_conv", sd, f"{tp}.downsample.0")
                    _bn(params, stats, f"{fp}/bn3", sd, f"{tp}.bn3")
        if "depth_head.fnet_mvs.final_conv_3ddet.weight" in sd:
            _conv(params, f"{dp}/final_conv", sd, "depth_head.fnet_mvs.final_conv_3ddet")
    for unet in ("correlation_regulation", "mono_regulation", "fusion_regulation"):
        if f"depth_head.{unet}.conv1.conv.weight" in sd:
            _convert_unet(params, stats, sd, f"depth_head.{unet}",
                          f"depth_head/{unet}", used)
    if "depth_head.fnet_mono.conv.weight" in sd:
        _conv(params, "depth_head/fnet_mono/conv", sd, "depth_head.fnet_mono.conv")
        _bn(params, stats, "depth_head/fnet_mono/bn", sd, "depth_head.fnet_mono.bn")
    if "depth_head.depth_reg.weight" in sd:
        _conv(params, "depth_head/depth_reg", sd, "depth_head.depth_reg")

    # ---- voxel head: per-level transformers + occupancy heads ----
    for i in range(n_levels):
        tp = f"voxel_head.base_heads.{i}.cross_transformer.encoder.layers.0"
        fp = f"voxel_head/base_head{i}/layer0"
        if f"{tp}.attentions.0.output_proj.weight" not in sd:
            continue
        at = f"{tp}.attentions.0"
        af = f"{fp}/cross_attn"
        _linear(params, f"{af}/output_proj", sd, f"{at}.output_proj")
        # inner deformable attention
        da = f"{at}.deformable_attention"
        df = f"{af}/deformable_attention"
        _linear(params, f"{df}/sampling_offsets", sd, f"{da}.sampling_offsets")
        _linear(params, f"{df}/sampling_offsets_depth", sd, f"{da}.sampling_offsets_depth")
        _linear(params, f"{df}/attention_weights", sd, f"{da}.attention_weights")
        _linear(params, f"{df}/value_proj", sd, f"{da}.value_proj")
        # attention pooling (torch nn.MultiheadAttention)
        mp = f"{at}.attention_pooling"
        mf = f"{af}/attention_pooling"
        _set(params, f"{mf}/in_proj_kernel", _t_linear(np.asarray(sd[f"{mp}.in_proj_weight"])))
        _set(params, f"{mf}/in_proj_bias", np.asarray(sd[f"{mp}.in_proj_bias"]))
        _linear(params, f"{mf}/out_proj", sd, f"{mp}.out_proj")
        # FFN (mmcv: layers.0.0 and layers.1) + the two LayerNorms
        _linear(params, f"{fp}/ffn/fc1", sd, f"{tp}.ffns.0.layers.0.0")
        _linear(params, f"{fp}/ffn/fc2", sd, f"{tp}.ffns.0.layers.1")
        for ni in (0, 1):
            _set(params, f"{fp}/norm{ni + 1}/scale", np.asarray(sd[f"{tp}.norms.{ni}.weight"]))
            _set(params, f"{fp}/norm{ni + 1}/bias", np.asarray(sd[f"{tp}.norms.{ni}.bias"]))
    for i in range(n_levels - 1):
        tp = f"voxel_head.occ_pred_heads.{i}.0"
        if f"{tp}.weight" in sd:
            _linear(params, f"voxel_head/occ_pred_head{i}", sd, tp)

    # ---- 3D neck ----
    i = 0
    while f"neck_3d.down_layer_{i}.0.conv1.weight" in sd:
        b = 0
        while f"neck_3d.down_layer_{i}.{b}.conv1.weight" in sd:
            tp = f"neck_3d.down_layer_{i}.{b}"
            fp = f"neck_3d/down_{i}_{b}"
            _conv(params, f"{fp}/conv1", sd, f"{tp}.conv1", ndim=3)
            _bn(params, stats, f"{fp}/norm1", sd, f"{tp}.norm1")
            _conv(params, f"{fp}/conv2", sd, f"{tp}.conv2", ndim=3)
            _bn(params, stats, f"{fp}/norm2", sd, f"{tp}.norm2")
            if f"{tp}.downsample.0.weight" in sd:
                _conv(params, f"{fp}/down_conv", sd, f"{tp}.downsample.0", ndim=3)
                _bn(params, stats, f"{fp}/down_norm", sd, f"{tp}.downsample.1")
            b += 1
        if f"neck_3d.up_block_{i}.0.weight" in sd:
            tp = f"neck_3d.up_block_{i}"
            fp = f"neck_3d/up_{i}"
            _conv(params, f"{fp}/deconv", sd, f"{tp}.0", ndim=3, transpose=True)
            _bn(params, stats, f"{fp}/norm1", sd, f"{tp}.1")
            _conv(params, f"{fp}/conv", sd, f"{tp}.3", ndim=3)
            _bn(params, stats, f"{fp}/norm2", sd, f"{tp}.4")
        if f"neck_3d.out_block_{i}.0.weight" in sd:
            tp = f"neck_3d.out_block_{i}"
            fp = f"neck_3d/out_{i}"
            _conv(params, f"{fp}/conv", sd, f"{tp}.0", ndim=3)
            _bn(params, stats, f"{fp}/norm", sd, f"{tp}.1")
        i += 1

    # ---- bbox head ----
    if "bbox_head.centerness_conv.weight" in sd:
        _conv(params, "bbox_head/centerness_conv", sd, "bbox_head.centerness_conv", ndim=3)
        _conv(params, "bbox_head/reg_conv", sd, "bbox_head.reg_conv", ndim=3)
        _conv(params, "bbox_head/cls_conv", sd, "bbox_head.cls_conv", ndim=3)
        for i in range(8):
            key = f"bbox_head.scales.{i}.scale"
            if key in sd:
                _set(params, f"bbox_head/scale{i}", np.asarray(sd[key]).reshape(()))

    if unused_out is not None:
        # non-learned keys with no flax equivalent: BN step counters and the
        # DenseHead geometry buffers (vox_coords/ref_3d are derived from the
        # config; DenseHead.py:29-30 registers them into the state dict).
        # The matching extractor's downsample BN is registered twice in the
        # reference (as `bn3` AND as `downsample.1`, layer_matching.py:118-127
        # aliases the same module); the converter consumes the `bn3` alias,
        # so the `downsample.1` duplicates are expected leftovers.
        _skip = ("num_batches_tracked", ".vox_coords", ".ref_3d")
        unused_out.update(
            k for k in sd
            if k not in sd.accessed and not k.endswith(_skip)
            and not (k.startswith("depth_head.fnet_mvs.")
                     and ".downsample.1." in k)
        )
    return params, stats


def convert_torchvision_pretrained(params, batch_stats, backbone_sd=None,
                                   matching_sd=None):
    """ImageNet warm start from *plain torchvision* state dicts.

    Mirrors the reference's from-scratch initialization:
    * backbone: ``torchvision://resnet50`` (configs/SGCDet_ScanNet.py:76) —
      mmdet's ResNet uses torchvision naming, so keys are re-prefixed with
      ``backbone.`` and fed through the SGCDet converter.
    * matching extractor: torchvision resnet18 conv1+layer1+layer2
      (extractor_matching.py:56-66). The reference's custom BasicBlock
      registers the downsample BN both as ``bn3`` and ``downsample.1``
      (layer_matching.py:120-127), so the torchvision ``downsample.1`` keys
      are aliased to ``bn3`` here. ``final_conv_3ddet`` stays random-init,
      as in the reference.

    Either dict may be None to convert only one side. Returns new
    (params, batch_stats) trees.
    """
    sd = {}
    if backbone_sd is not None:
        sd.update({
            f"backbone.{k}": v for k, v in backbone_sd.items()
            if not k.startswith("fc.")
        })
    if matching_sd is not None:
        for k, v in matching_sd.items():
            if not k.startswith(("conv1.", "bn1.", "layer1.", "layer2.")):
                continue
            sd[f"depth_head.fnet_mvs.{k}"] = v
            if ".downsample.1." in k:
                alias = k.replace(".downsample.1.", ".bn3.")
                sd[f"depth_head.fnet_mvs.{alias}"] = v
    return convert_torch_state_dict(sd, params, batch_stats)


def load_torchvision_pretrained(params, batch_stats, backbone_path=None,
                                matching_path=None):
    """Load torchvision resnet50/resnet18 .pth files and warm-start."""
    import torch

    def _load(path):
        if path is None:
            return None
        sd = torch.load(path, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
        return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                for k, v in sd.items()}

    return convert_torchvision_pretrained(
        params, batch_stats,
        backbone_sd=_load(backbone_path),
        matching_sd=_load(matching_path),
    )


def strip_lightning_prefix(state_dict):
    """Keep 'model.'-prefixed keys and strip the prefix (pl_model.py:29-36)."""
    out = {}
    for k, v in state_dict.items():
        if "model" in k:
            out[k.replace("model.", "")] = v
    return out


def load_torch_checkpoint(path, params, batch_stats, n_levels=3):
    """Load a released .ckpt / .pth file and convert (requires torch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    if any(k.startswith("model.") for k in sd):
        sd = strip_lightning_prefix(sd)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return convert_torch_state_dict(sd, params, batch_stats, n_levels=n_levels)
