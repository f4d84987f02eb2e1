"""End-to-end CLI exercise from argv on an on-disk synthetic dataset.

The last untested seam before real data (round-4 verdict item 7): write a
synthetic ScanNet-format dataset (pkl infos + JPEG images + uint16 depth
PNGs) to disk, then drive ``sgcdet_tpu.cli.main`` exactly as a user would —
``--mode train`` for a couple of steps (shard_map over the 8 virtual CPU
devices), then ``--mode eval`` and ``--mode show`` against the produced
checkpoint — asserting the artifacts the reference CLI produces
(/root/reference/main.py:16-97): metrics.jsonl, the config dump, per-epoch
orbax checkpoints with a ``last`` pointer, an mAP dict, and per-scene .npy /
wireframe outputs.
"""
import json
import pickle
from pathlib import Path

import numpy as np
import pytest

# tiny-model overrides: everything that sets trace shapes shrinks so the
# whole CLI path compiles in seconds on the CPU mesh
TINY_OVERRIDES = [
    "model.n_voxels_list=((2,2,1),(4,4,2),(8,8,4))",
    "model.voxel_size_list=((1.28,1.28,1.6),(0.64,0.64,0.8),(0.32,0.32,0.4))",
    # top-k == full voxel counts: selection machinery still runs but any
    # voxel can host a positive
    "model.topk_list=(32,256)",
    "model.embed_dims=16",
    "model.num_heads=2",
    "model.dbound=(0.2,5.0,0.8)",
    "model.limit=4",
    "model.centerness_topk=4",
    "model.test_cfg.nms_pre=64",
    # 968x1296 keep-ratio to (80,60) resizes to exactly (60,80); pad height
    # 64 keeps every backbone/FPN stride divisible
    "data.img_scale=(80,60)",
    "data.pad_size=(64,80)",
    "data.img_shape=(60,80)",
    "data.n_images_train=4",
    "data.n_images_test=4",
    "data.max_boxes=8",
    "data.repeat_times=1",
]


def _write_synthetic_scannet(root: Path, n_train=8, n_val=2, n_views=5):
    cv2 = pytest.importorskip("cv2")
    (root / "imgs").mkdir(parents=True, exist_ok=True)
    (root / "depths").mkdir(exist_ok=True)
    rng = np.random.RandomState(0)

    def scene_info(tag, s):
        img_paths, depth_paths, extrinsics = [], [], []
        for v in range(n_views):
            ip = f"imgs/{tag}{s}_v{v}.jpg"
            dp = f"depths/{tag}{s}_v{v}.png"
            cv2.imwrite(str(root / ip),
                        rng.randint(0, 255, (968, 1296, 3), np.uint8))
            cv2.imwrite(str(root / dp),
                        rng.randint(0, 5000, (480, 640)).astype(np.uint16))
            img_paths.append(ip)
            depth_paths.append(dp)
            # camera slightly inside the volume looking around
            ang = 2 * np.pi * v / n_views
            c, si = np.cos(ang), np.sin(ang)
            e = np.eye(4, dtype=np.float32)
            e[:3, :3] = np.array([[c, -si, 0], [0, 0, -1], [si, c, 0]],
                                 np.float32)
            e[:3, 3] = -e[:3, :3] @ np.array([0.5, 0.5, 1.0], np.float32)
            extrinsics.append(e)
        intr = np.eye(4, dtype=np.float32)
        intr[0, 0] = intr[1, 1] = 1000.0
        intr[0, 2], intr[1, 2] = 648.0, 484.0
        return dict(
            img_paths=img_paths,
            depth_paths=depth_paths,
            extrinsics=extrinsics,
            intrinsics=intr,
            annos=dict(
                axis_align_matrix=np.eye(4, dtype=np.float32),
                gt_num=2,
                gt_boxes_upright_depth=np.array(
                    [[0.3, 0.2, 0.6, 0.8, 0.8, 0.6],
                     [-0.5, -0.4, 0.8, 0.6, 0.6, 0.5]], np.float32),
                **{"class": np.array([2, 7])},
            ),
        )

    for split, n in (("train", n_train), ("val", n_val)):
        infos = [scene_info(split[0], s) for s in range(n)]
        with open(root / f"scannet_infos_{split}.pkl", "wb") as f:
            pickle.dump(infos, f)


@pytest.mark.slow
def test_cli_train_eval_show_end_to_end(tmp_path, monkeypatch):
    from sgcdet_tpu.cli import main

    _write_synthetic_scannet(tmp_path / "data")
    monkeypatch.chdir(tmp_path)  # cli writes ./logs/<folder>

    common = ["--config", "scannet", "--data_root", str(tmp_path / "data"),
              "--num_workers", "1", "--query_chunk", "0"]
    for ov in TINY_OVERRIDES:
        common += ["--override", ov]

    # ---- train: 2 steps over the 8-device CPU mesh, ckpt + per-epoch eval
    main(common + ["--mode", "train", "--log_folder", "e2e",
                   "--max_steps", "2", "--eval_every_epochs", "1"])

    log_dir = Path("logs/e2e")
    assert (log_dir / "config.json").exists()
    cfg_dump = json.loads((log_dir / "config.json").read_text())
    assert cfg_dump["model"]["embed_dims"] == 16  # overrides reached the dump
    lines = [json.loads(l) for l in
             (log_dir / "metrics.jsonl").read_text().splitlines()]
    assert any("val/mAP_0.25" in l for l in lines)  # per-epoch eval ran
    last = (log_dir / "ckpt" / "last")
    assert last.exists()

    # ---- eval: restore the produced checkpoint explicitly via --ckpt_path
    ckpt = (log_dir / "ckpt" / last.read_text().strip())
    assert ckpt.exists()
    ret = main(common + ["--mode", "eval", "--log_folder", "e2e_eval",
                         "--ckpt_path", str(ckpt)])
    assert set(ret) >= {"mAP_0.25", "mAR_0.25", "mAP_0.50", "mAR_0.50"}
    assert np.isfinite(ret["mAP_0.25"])

    # ---- show: same path + per-scene .npy dumps and wireframe renders
    main(common + ["--mode", "show", "--log_folder", "e2e_show",
                   "--ckpt_path", str(ckpt)])
    show = Path("logs/e2e_show/show")
    npys = list(show.glob("*.npy")) + list(show.glob("**/*.npy"))
    assert npys, f"no .npy dumps in {show}"

    # ---- resume: a third step continues from the checkpoint's step counter
    main(common + ["--mode", "train", "--log_folder", "e2e",
                   "--max_steps", "3", "--resume",
                   "--eval_every_epochs", "0"])
    assert (log_dir / "ckpt" / "last").read_text().strip() == "step_3"
