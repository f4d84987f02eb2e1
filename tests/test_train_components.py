"""Optimizer/schedule/converter/data-pipeline unit tests."""
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgcdet_tpu.configs import scannet
from sgcdet_tpu.train.optim import onecycle_schedule, param_label, zero_nans


def test_onecycle_matches_torch():
    torch = pytest.importorskip("torch")
    max_lr, total = 2e-4, 1000
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=max_lr)
    sch = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=max_lr, total_steps=total, pct_start=0.05,
        cycle_momentum=False, anneal_strategy="cos", final_div_factor=1e4,
    )
    ours = onecycle_schedule(max_lr, total, 0.05, 25.0, 1e4)
    ref_lrs, our_lrs = [], []
    for step in range(0, total, 97):
        ref_lrs.append(opt.param_groups[0]["lr"])
        our_lrs.append(float(ours(step)))
        for _ in range(97):
            if sch.last_epoch < total - 1:
                sch.step()
    np.testing.assert_allclose(our_lrs, ref_lrs, rtol=2e-2)


def test_param_labels():
    assert param_label(_path("backbone/conv1/kernel")) == "frozen"
    assert param_label(_path("backbone/layer1_0/conv2/kernel")) == "frozen"
    assert param_label(_path("backbone/layer2_0/conv2/kernel")) == "backbone"
    assert param_label(_path("backbone/layer3_2/bn2/scale")) == "frozen"
    assert param_label(_path("backbone/layer4_0/downsample_bn/scale")) == "frozen"
    assert param_label(_path("neck/lateral_0/kernel")) == "other"
    assert param_label(_path("voxel_head/base_head0/layer0/ffn/fc1/kernel")) == "other"


class _Key:
    def __init__(self, k):
        self.key = k


def _path(s):
    return tuple(_Key(k) for k in s.split("/"))


def test_zero_nans():
    tx = zero_nans()
    g = {"a": jnp.array([1.0, jnp.nan, jnp.inf])}
    out, _ = tx.update(g, tx.init(g))
    np.testing.assert_allclose(np.asarray(out["a"]), [1.0, 0.0, 0.0])


def test_converter_covers_bbox_head_and_neck3d():
    """Fabricated torch-named state dict converts into the flax tree with
    correct transposes."""
    from sgcdet_tpu.train.checkpoint import convert_torch_state_dict

    rng = np.random.RandomState(0)
    params = {
        "bbox_head": {
            "centerness_conv": {"kernel": np.zeros((3, 3, 3, 8, 1), np.float32)},
            "reg_conv": {"kernel": np.zeros((3, 3, 3, 8, 6), np.float32)},
            "cls_conv": {"kernel": np.zeros((3, 3, 3, 8, 5), np.float32),
                         "bias": np.zeros((5,), np.float32)},
            "scale0": np.zeros((), np.float32),
            "scale1": np.zeros((), np.float32),
            "scale2": np.zeros((), np.float32),
        },
    }
    sd = {
        "bbox_head.centerness_conv.weight": rng.randn(1, 8, 3, 3, 3).astype(np.float32),
        "bbox_head.reg_conv.weight": rng.randn(6, 8, 3, 3, 3).astype(np.float32),
        "bbox_head.cls_conv.weight": rng.randn(5, 8, 3, 3, 3).astype(np.float32),
        "bbox_head.cls_conv.bias": rng.randn(5).astype(np.float32),
        "bbox_head.scales.0.scale": np.array([1.5], np.float32),
        "bbox_head.scales.1.scale": np.array([0.5], np.float32),
        "bbox_head.scales.2.scale": np.array([2.0], np.float32),
    }
    new_params, _ = convert_torch_state_dict(sd, params, {})
    w = sd["bbox_head.reg_conv.weight"]
    np.testing.assert_allclose(
        new_params["bbox_head"]["reg_conv"]["kernel"],
        w.transpose(2, 3, 4, 1, 0),
    )
    assert float(new_params["bbox_head"]["scale1"]) == 0.5


def test_scene_loader_with_synthetic_pkl(tmp_path):
    """Full data path: synthetic pkl + images -> fixed-shape batch."""
    import cv2
    import dataclasses
    from sgcdet_tpu.configs import scannet as scannet_cfg
    from sgcdet_tpu.data import MultiViewDataset, SceneLoader

    root = tmp_path
    (root / "imgs").mkdir()
    (root / "depths").mkdir()
    rng = np.random.RandomState(0)
    n_views_avail = 5
    infos = []
    for s in range(2):
        img_paths, depth_paths, extrinsics = [], [], []
        for v in range(n_views_avail):
            ip = f"imgs/s{s}_v{v}.jpg"
            dp = f"depths/s{s}_v{v}.png"
            cv2.imwrite(str(root / ip), rng.randint(0, 255, (968, 1296, 3), np.uint8))
            cv2.imwrite(str(root / dp), rng.randint(0, 5000, (480, 640), np.uint16().dtype.type))
            img_paths.append(ip)
            depth_paths.append(dp)
            e = np.eye(4, dtype=np.float32)
            e[:3, 3] = [0.1 * v, 0, 0.2]
            extrinsics.append(e)
        intr = np.eye(4, dtype=np.float32)
        intr[0, 0] = intr[1, 1] = 1000
        infos.append(dict(
            img_paths=img_paths,
            depth_paths=depth_paths,
            extrinsics=extrinsics,
            intrinsics=intr,
            annos=dict(
                axis_align_matrix=np.eye(4, dtype=np.float32),
                gt_num=2,
                gt_boxes_upright_depth=np.array(
                    [[0, 0, 0.5, 1, 1, 1], [1, 1, 0.7, 0.5, 0.5, 0.5]], np.float32
                ),
                **{"class": np.array([0, 3])},
            ),
        ))
    with open(root / "scannet_infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)

    cfg = scannet_cfg()
    dc = dataclasses.replace(
        cfg.data, data_root=str(root), n_images_train=4, max_boxes=8
    )
    ds = MultiViewDataset(dc, train=True, load_depth=True)
    assert len(ds) == 2
    loader = SceneLoader(ds, batch_size=2, repeat_times=1, num_workers=1,
                         max_boxes=8)
    batches = list(iter(loader))
    assert len(batches) == 1
    b = batches[0]
    assert b["imgs"].shape == (2, 4, 3, 240, 320)
    assert b["proj_img"].shape == (2, 4, 3, 4)
    assert b["proj_feat4"].shape == (2, 4, 4, 4)
    assert b["gt_boxes"].shape == (2, 8, 7)
    assert b["gt_mask"].sum() == 4
    assert b["gt_depth"].shape == (2, 4, 240, 320)
    # gravity-center conversion: z = z_in (origin 0.5 passthrough for z too)
    np.testing.assert_allclose(b["gt_boxes"][0, 0, :3], [0, 0, 0.5], atol=1e-6)
    # image normalization applied (zero-mean-ish)
    assert abs(b["imgs"].mean()) < 1.0
