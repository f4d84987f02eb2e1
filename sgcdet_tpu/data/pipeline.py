"""Per-view preprocessing: view sampling, resize/normalize/pad, depth loading.

Mirrors the reference pipeline (configs/SGCDet_ScanNet.py:135-164 and
/root/reference/mmdet3d_plugin/datasets/pipelines/multi_view.py:7-65,
loading.py:7-42): keep-ratio resize to img_scale, ImageNet normalization,
bottom/right zero-pad to pad_size; uint16 depth / depth_shift.

Everything here is host-side NumPy feeding fixed-shape device batches.
"""
from __future__ import annotations

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None
from PIL import Image


def sample_view_ids(n_total, n_images, method, rng=None):
    """View index sampling (multi_view.py:32-49).

    'random': with replacement iff n_images > n_total; 'linear': linspace;
    'uniform_random': linspace + jitter on the interior ids, sorted.
    """
    rng = rng or np.random
    ids = np.arange(n_total)
    if method == "random":
        replace = n_images > n_total
        ids = rng.choice(ids, n_images, replace=replace)
    elif method == "uniform_random":
        base = np.linspace(0, n_total - 1, n_images, dtype=int)
        offsets = np.zeros_like(base)
        if n_images > 2:
            offsets[1:-1] = rng.randint(-2, 3, size=n_images - 2)
        ids = np.sort(np.clip(base + offsets, 0, n_total - 1))
    elif method == "linear":
        ids = np.linspace(0, n_total - 1, n_images, dtype=int)
    else:
        raise ValueError(f"unknown sample method {method}")
    return np.sort(ids)


def rescale_size(ori_w, ori_h, scale_wh):
    """mmcv-style keep-ratio target size: scale = min(max_l/l, max_s/s), then
    int(dim * scale + 0.5)."""
    max_long, max_short = max(scale_wh), min(scale_wh)
    long_side, short_side = max(ori_w, ori_h), min(ori_w, ori_h)
    f = min(max_long / long_side, max_short / short_side)
    return int(ori_w * f + 0.5), int(ori_h * f + 0.5)


def load_and_preprocess_image(path, img_scale, pad_size, mean, std, to_rgb=True):
    """-> (3, Hp, Wp) float32 normalized, plus the resized (pre-pad) shape."""
    if cv2 is not None:
        img = cv2.imread(str(path), cv2.IMREAD_COLOR)  # BGR
        h, w = img.shape[:2]
        new_w, new_h = rescale_size(w, h, img_scale)
        img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
        if to_rgb:
            img = img[:, :, ::-1]
    else:  # pragma: no cover
        pil = Image.open(str(path)).convert("RGB")
        w, h = pil.size
        new_w, new_h = rescale_size(w, h, img_scale)
        img = np.asarray(pil.resize((new_w, new_h), Image.BILINEAR))
    img = (img.astype(np.float32) - np.asarray(mean, np.float32)) / np.asarray(
        std, np.float32
    )
    out = np.zeros((pad_size[0], pad_size[1], 3), np.float32)
    out[: img.shape[0], : img.shape[1]] = img
    return out.transpose(2, 0, 1), (img.shape[0], img.shape[1])


def load_depth_map(path, depth_shift, pad_size=None):
    """uint16 depth png -> meters (0 = invalid) (loading.py:12-42)."""
    depth = np.asarray(imread_any(path)).astype(np.float32) / depth_shift
    if pad_size is not None and depth.shape != tuple(pad_size):
        if cv2 is not None:
            depth = cv2.resize(
                depth, (pad_size[1], pad_size[0]), interpolation=cv2.INTER_NEAREST
            )
        else:  # pragma: no cover
            depth = np.asarray(
                Image.fromarray(depth).resize((pad_size[1], pad_size[0]), Image.NEAREST)
            )
    return depth


def imread_any(path):
    if cv2 is not None:
        img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
        if img is not None:
            return img
    return np.asarray(Image.open(str(path)))


def build_projection_matrices(intrinsic, extrinsics, ori_h, img_h):
    """(proj_img (N, 3, 4) at image res, proj_feat4 (N, 4, 4) at stride 4)."""
    intrinsic = np.asarray(intrinsic, np.float32)
    extrinsics = np.asarray(extrinsics, np.float32)
    if intrinsic.ndim == 2:
        intr44 = np.eye(4, dtype=np.float32)
        intr44[:3, :3] = intrinsic[:3, :3]
        intr44_b = np.broadcast_to(intr44, (len(extrinsics), 4, 4)).copy()
    else:
        intr44_b = np.zeros((len(extrinsics), 4, 4), np.float32)
        intr44_b[:] = np.eye(4)
        intr44_b[:, :3, :3] = intrinsic[:, :3, :3]

    ratio1 = ori_h / img_h
    k1 = intr44_b.copy()
    k1[:, :2] /= ratio1
    proj_img = np.einsum("nij,njk->nik", k1[:, :3, :3], extrinsics[:, :3, :])

    ratio4 = ori_h / (img_h / 4)
    k4 = intr44_b.copy()
    k4[:, :2] /= ratio4
    proj_feat4 = np.einsum("nij,njk->nik", k4, extrinsics)
    return proj_img.astype(np.float32), proj_feat4.astype(np.float32)


def scene_poses(info, data_cfg, train, rng=None):
    """Projections + origin for one scene WITHOUT touching any image files.

    Same view sampling / extrinsics / origin conventions as prepare_scene
    (deterministic "linear" sampling when not train); used for cheap
    whole-dataset geometry statistics (visibility-budget and sweep-band
    sizing).  Returns (origin (3,), proj_img (N, 3, 4), proj_feat4
    (N, 4, 4)) at the configured img_shape.
    """
    rng = rng or np.random
    n_images = data_cfg.n_images_train if train else data_cfg.n_images_test
    method = data_cfg.sample_method_train if train else "linear"
    ids = sample_view_ids(len(info["img_paths"]), n_images, method, rng)

    if "extrinsics" in info:
        aam = info["annos"]["axis_align_matrix"].astype(np.float32)
        ext_all = [
            np.linalg.inv(aam @ np.asarray(info["extrinsics"][i], np.float32))
            for i in ids
        ]
    else:
        ext_all = [np.linalg.inv(np.asarray(info["poses"][i], np.float32)) for i in ids]
    extrinsics = np.stack(ext_all)

    if data_cfg.origin == "fixed":
        origin = np.array([0.0, 0.0, 0.5], np.float32)
    else:
        poses = np.stack([np.asarray(p, np.float32) for p in info["poses"]])
        origin = poses[:, :3, 3].mean(axis=0).astype(np.float32)
    if train:
        origin = origin + rng.normal(0.0, data_cfg.shift_origin_std, 3).astype(np.float32)

    intrinsic = info.get("intrinsics", info.get("intrinsic"))
    proj_img, proj_feat4 = build_projection_matrices(
        intrinsic, extrinsics, data_cfg.ori_shape[0], data_cfg.img_shape[0]
    )
    return origin.astype(np.float32), proj_img, proj_feat4


def prepare_scene(info, data_cfg, train, rng=None, load_depth=False):
    """Load one scene into fixed-shape arrays.

    info: one entry of the infos pkl. Returns dict with imgs (N,3,Hp,Wp),
    proj_img, proj_feat4, origin, and (train) gt boxes/labels/mask (+ depth).
    """
    rng = rng or np.random
    n_images = data_cfg.n_images_train if train else data_cfg.n_images_test
    method = data_cfg.sample_method_train if train else "linear"

    img_paths = info["img_paths"]
    ids = sample_view_ids(len(img_paths), n_images, method, rng)

    # extrinsics (world -> camera)
    if "extrinsics" in info:  # ScanNet: axis-aligned world
        aam = info["annos"]["axis_align_matrix"].astype(np.float32)
        ext_all = [
            np.linalg.inv(aam @ np.asarray(info["extrinsics"][i], np.float32))
            for i in ids
        ]
    else:  # ARKit
        ext_all = [np.linalg.inv(np.asarray(info["poses"][i], np.float32)) for i in ids]
    extrinsics = np.stack(ext_all)

    if data_cfg.origin == "fixed":
        origin = np.array([0.0, 0.0, 0.5], np.float32)
    else:
        poses = np.stack([np.asarray(p, np.float32) for p in info["poses"]])
        origin = poses[:, :3, 3].mean(axis=0).astype(np.float32)
    if train:
        origin = origin + rng.normal(0.0, data_cfg.shift_origin_std, 3).astype(np.float32)

    import os.path as osp

    imgs = []
    img_shape = data_cfg.img_shape
    for i in ids:
        img, shape = load_and_preprocess_image(
            osp.join(data_cfg.data_root, img_paths[i]),
            data_cfg.img_scale,
            data_cfg.pad_size,
            data_cfg.mean,
            data_cfg.std,
        )
        imgs.append(img)
        img_shape = shape
    imgs = np.stack(imgs)

    intrinsic = info.get("intrinsics", info.get("intrinsic"))
    proj_img, proj_feat4 = build_projection_matrices(
        intrinsic, extrinsics, data_cfg.ori_shape[0], img_shape[0]
    )

    out = dict(
        imgs=imgs,
        proj_img=proj_img,
        proj_feat4=proj_feat4,
        origin=origin.astype(np.float32),
        img_shape=img_shape,
    )
    if load_depth:
        depths = np.stack(
            [
                load_depth_map(
                    osp.join(data_cfg.data_root, info["depth_paths"][i]),
                    data_cfg.depth_shift,
                    data_cfg.pad_size,
                )
                for i in ids
            ]
        )
        out["gt_depth"] = depths
    return out
