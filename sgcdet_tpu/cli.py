"""Command-line entry: train / eval / show for the four released configs.

The TPU-native equivalent of the reference CLI (main.py:16-97 + the Lightning
Trainer wiring): `python -m sgcdet_tpu.cli --config scannet --mode train`.

Subsystems mirrored: per-run log folder with dumped config (main.py:36-45),
scalar logging (TensorBoard if available, JSONL always), step profiler
(jax.profiler), per-epoch orbax checkpoints (main.py:55-61), warm-start
--load_from with released-PyTorch conversion (pl_model.py:29-36), periodic
val mAP as the integration signal (pl_model.py:59-74).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="sgcdet_tpu")
    p.add_argument("--config", required=True,
                   help="scannet | arkit | scannet200_large | arkit_large")
    p.add_argument("--mode", default="train", choices=["train", "eval", "show"])
    p.add_argument("--data_root", default=None)
    p.add_argument("--log_folder", default="default")
    p.add_argument("--ckpt_path", default=None, help="orbax checkpoint to eval")
    p.add_argument("--load_from", default=None,
                   help="warm start: orbax dir or released torch .ckpt/.pth")
    p.add_argument("--resume", action="store_true",
                   help="resume params+opt_state+step from the newest "
                        "checkpoint in this run's log folder")
    p.add_argument("--pretrained_backbone", default=None,
                   help="torchvision resnet50 .pth for ImageNet backbone init "
                        "(configs/SGCDet_ScanNet.py:76)")
    p.add_argument("--pretrained_matching", default=None,
                   help="torchvision resnet18 .pth for the matching extractor "
                        "(extractor_matching.py:56-66)")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--eval_every_epochs", type=int, default=1)
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace for N steps")
    p.add_argument("--query_chunk", type=int, default=100)
    p.add_argument("--n_views_test", type=int, default=None,
                   help="override eval view count (memory/speed knob)")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--visibility_budget", default=None,
                   help="per-camera lifting compaction: a float fraction of "
                        "queries kept per camera, or 'auto' to derive a "
                        "provably-exact bound from the dataset's geometry "
                        "(see utils/visibility.py)")
    p.add_argument("--visibility_scan_scenes", type=int, default=200,
                   help="scenes sampled for --visibility_budget auto")
    p.add_argument("--override", action="append", default=[],
                   help="config override 'section.key=value' (repeatable; "
                        "values parsed as Python literals) — the analog of "
                        "the reference CLI's config merge (main.py:28-30)")
    p.add_argument("--sweep_band", default=None,
                   help="banded-Gram plane-sweep source-row band: an int, or "
                        "'auto' to derive the exact band from the dataset's "
                        "rigs (used only when <= 28 rows — taller bands stop "
                        "paying and the always-exact gather kernel runs; "
                        "see ops/sweep_band.py)")
    return p.parse_args(argv)


class MetricLogger:
    """JSONL always; TensorBoard when torch.utils.tensorboard is importable."""

    def __init__(self, log_dir):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.jsonl = open(self.log_dir / "metrics.jsonl", "a")
        self.tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(str(self.log_dir / "tensorboard"))
        except Exception:
            pass

    def log(self, step, scalars, prefix=""):
        rec = {"step": int(step), **{prefix + k: float(v) for k, v in scalars.items()}}
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(prefix + k, float(v), int(step))


def build_dataset_and_loader(config, train, batch_size, num_workers, seed,
                             host_id=0, num_hosts=1):
    from .data import MultiViewDataset, SceneLoader

    ds = MultiViewDataset(
        config.data, train=train,
        load_depth=config.model.depth_loss or config.model.use_gt_dpt,
        seed=seed,
    )
    loader = SceneLoader(
        ds,
        batch_size=batch_size,
        shuffle=train,
        repeat_times=config.data.repeat_times if train else 1,
        num_workers=num_workers,
        max_boxes=config.data.max_boxes,
        host_id=host_id,
        num_hosts=num_hosts,
        seed=seed,
        drop_last=train,
    )
    return ds, loader


def run_eval(config, model, params, batch_stats, dataset, logger=None, step=0,
             show_dir=None, num_workers=4, host_id=0, num_hosts=1,
             gather_dir=None, gather_timeout=3600):
    """Full-dataset inference + indoor mAP (pl_model.py:76-90).

    Multi-host: each host evaluates the `host_id::num_hosts` slice of the val
    set and writes its detections to `gather_dir`; host 0 waits for every
    shard, merges in scene order, and computes the metric (the reference
    evaluates the full val set on rank 0 only, pl_model.py:59-74 — here the
    device compute is sharded and only the cheap host-side matching is
    centralized). Hosts != 0 return None.
    """
    import jax
    from .eval import indoor_eval
    from .geometry import DepthBoxes3D
    from .models.det_head import decode_bboxes
    from .train.loop import make_eval_step

    if num_hosts > 1 and gather_dir is None:
        raise ValueError("multi-host eval needs a shared gather_dir")
    indices = list(range(host_id, len(dataset), num_hosts))
    eval_fn = make_eval_step(model, config)
    dt_annos, gt_annos = [], []

    # prefetch scene decode (JPEG-bound on host) behind device compute
    import concurrent.futures as cf

    # num_workers<=0 is a supported SceneLoader value; here it means "no
    # prefetch parallelism" — keep one worker so the pool stays valid.
    pool = cf.ThreadPoolExecutor(max_workers=max(1, num_workers))
    window = max(1, 2 * num_workers)
    futures = {p: pool.submit(dataset.__getitem__, indices[p])
               for p in range(min(window, len(indices)))}

    def finish(p, scene, out):
        """Host side of one scene: fetch, decode, NMS, show. Runs while the
        NEXT scene's forward is in flight on the device."""
        head_outs = jax.tree_util.tree_map(np.asarray, out["head_outs"])
        valid = np.asarray(out["valid"])
        boxes, scores, labels = decode_bboxes(
            head_outs, valid, scene["origin"], config.model.voxel_size, config.model
        )
        yawed = config.model.head_type == "sunrgbd"
        det = DepthBoxes3D(
            boxes, box_dim=boxes.shape[-1] if len(boxes) else (7 if yawed else 6),
            with_yaw=yawed, origin=(0.5, 0.5, 0.5),
        )
        dt_annos.append(dict(boxes_3d=det, scores_3d=scores, labels_3d=labels))
        gt_annos.append(dataset.gt_anno(scene["index"]))
        i = indices[p]
        if show_dir is not None:
            from .utils import dump_show_results
            from .geometry import DepthBoxes3D as _DB

            gt = dataset.gt_anno(scene["index"])
            gt_boxes = _DB(
                gt["gt_boxes_upright_depth"],
                box_dim=gt["gt_boxes_upright_depth"].shape[-1]
                if gt["gt_num"] else 7,
                with_yaw=gt["gt_boxes_upright_depth"].shape[-1] == 7,
                origin=(0.5, 0.5, 0.5),
            ) if gt["gt_num"] else None
            dump_show_results(show_dir, f"{i:05d}", det, scores, labels, gt_boxes)
            # per-view wireframe renders (the reference's show_2d,
            # dataset_wrappers.py:144-167)
            from .utils.visualize import denormalize_images, draw_scene_2d

            imgs_u8 = denormalize_images(
                scene["imgs"], config.data.mean, config.data.std
            )
            draw_scene_2d(str(show_dir), f"{i:05d}", imgs_u8,
                          np.asarray(scene["proj_img"]), det, labels, gt_boxes)

    # one-deep device/host pipeline: jax dispatch is async, so scene p's
    # decode+NMS on the host overlaps scene p+1's forward on the device
    pending = None
    for p in range(len(indices)):
        scene = futures.pop(p).result()
        nxt = p + window
        if nxt < len(indices) and nxt not in futures:
            futures[nxt] = pool.submit(dataset.__getitem__, indices[nxt])
        scene_dev = {
            k: scene[k] for k in ("imgs", "proj_img", "proj_feat4", "origin")
        }
        out = eval_fn(params, batch_stats, scene_dev)
        if pending is not None:
            finish(*pending)
        pending = (p, scene, out)
    if pending is not None:
        finish(*pending)
    pool.shutdown(wait=False)
    if num_hosts > 1:
        from .eval.gather import gather_detections

        merged = gather_detections(
            gather_dir, host_id, num_hosts, indices, dt_annos,
            timeout=gather_timeout,
        )
        if merged is None:  # host != 0: detections shipped, metric on host 0
            return None
        dt_annos = merged
        gt_annos = [dataset.gt_anno(i) for i in range(len(dataset))]
    label2cat = dict(enumerate(config.data.classes))
    ret = indoor_eval(gt_annos, dt_annos, [0.25, 0.5], label2cat)
    if logger is not None:
        logger.log(step, {k: v for k, v in ret.items() if k.startswith("mA")},
                   prefix="val/")
    return ret


def main(argv=None):
    args = parse_args(argv)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

    import jax
    from .configs import get_config
    from .parallel import make_mesh, batch_sharding, replicated_sharding
    from .train.checkpoint import load_torch_checkpoint, save_checkpoint
    from .train.loop import init_train_state, make_train_step

    from .configs import apply_overrides

    config = get_config(args.config)
    config = apply_overrides(config, args.override)
    if args.data_root:
        config = dataclasses.replace(
            config, data=dataclasses.replace(config.data, data_root=args.data_root)
        )
    if args.n_views_test:
        config = dataclasses.replace(
            config,
            data=dataclasses.replace(config.data, n_images_test=args.n_views_test),
        )
    log_dir = Path("logs") / args.log_folder
    log_dir.mkdir(parents=True, exist_ok=True)
    (log_dir / "config.json").write_text(
        json.dumps(dataclasses.asdict(config), indent=2, default=str)
    )
    logger = MetricLogger(log_dir)

    n_devices = jax.local_device_count()
    train_ds, train_loader = (None, None)
    if args.mode == "train":
        train_ds, train_loader = build_dataset_and_loader(
            config, True, n_devices, args.num_workers, args.seed
        )
        example = train_ds[0]
    else:
        val_ds, _ = build_dataset_and_loader(config, False, 1, 0, args.seed)
        example = val_ds[0]

    if args.visibility_budget is not None:
        if args.visibility_budget == "auto":
            from .utils.visibility import derive_visibility_budgets

            ds = train_ds if train_ds is not None else val_ds
            n_scan = min(len(ds), args.visibility_scan_scenes)
            scan_ids = np.linspace(0, len(ds) - 1, n_scan).astype(int)
            budget = derive_visibility_budgets(
                (ds.scene_poses(int(i)) for i in scan_ids),
                config.data.img_shape, config.model,
            )
            print(f"auto per-level visibility budgets (exact bound over "
                  f"{n_scan} scenes): "
                  f"{[round(b, 3) for b in budget]}", flush=True)
            if all(b >= 1.0 for b in budget):
                budget = None
        else:
            budget = float(args.visibility_budget)
            if budget >= 1.0:
                budget = None
        config = dataclasses.replace(
            config, model=dataclasses.replace(
                config.model, visibility_budget=budget
            )
        )

    if args.sweep_band is not None:
        if args.sweep_band == "auto":
            from .utils.visibility import required_sweep_band

            ds = train_ds if train_ds is not None else val_ds
            n_scan = min(len(ds), args.visibility_scan_scenes)
            scan_ids = np.linspace(0, len(ds) - 1, n_scan).astype(int)
            h4 = config.data.img_shape[0] // 4
            w4 = config.data.img_shape[1] // 4
            band = 1
            for i in scan_ids:
                _, _, proj4 = ds.scene_poses(int(i))
                band = max(band, required_sweep_band(
                    proj4, proj4.shape[0], config.model, (h4, w4)))
            # banded pays below ~20 rows (re-measured 2026-08-21 after the
            # gather kernel's transposed-window fix; was 28)
            print(f"auto sweep band (exact over {n_scan} scenes): {band}"
                  f"{' — too tall, keeping gather kernels' if band > 20 else ''}",
                  flush=True)
            band = band if band <= 20 else None
        else:
            band = int(args.sweep_band)
        config = dataclasses.replace(
            config, model=dataclasses.replace(config.model, sweep_band=band)
        )

    example_scene = {
        k: example[k] for k in ("imgs", "proj_img", "proj_feat4", "origin")
    }
    model, state, tx = init_train_state(
        config, jax.random.PRNGKey(args.seed), example_scene,
        query_chunk=args.query_chunk,
    )

    if args.pretrained_backbone or args.pretrained_matching:
        from .train.checkpoint import load_torchvision_pretrained

        params, stats = load_torchvision_pretrained(
            state.params, state.batch_stats,
            backbone_path=args.pretrained_backbone,
            matching_path=args.pretrained_matching,
        )
        state = state.replace(params=params, batch_stats=stats)

    if args.load_from:
        if args.load_from.endswith((".ckpt", ".pth")):
            params, stats = load_torch_checkpoint(
                args.load_from, state.params, state.batch_stats,
                n_levels=len(config.model.n_voxels_list),
            )
            state = state.replace(params=params, batch_stats=stats)
        else:
            from .train.checkpoint import restore_checkpoint

            state = restore_checkpoint(args.load_from, state)

    if args.resume:
        from .train.checkpoint import latest_checkpoint, restore_checkpoint

        last = latest_checkpoint(str(log_dir / "ckpt"))
        if last is not None:
            state = restore_checkpoint(last, state)
            print(f"resumed from {last} (step {int(state.step)})", flush=True)

    if args.mode in ("eval", "show"):
        if args.ckpt_path:
            # the reference's eval restore (trainer.test(ckpt_path=...),
            # main.py:97)
            from .train.checkpoint import restore_checkpoint

            state = restore_checkpoint(args.ckpt_path, state)
        val_ds, _ = build_dataset_and_loader(config, False, 1, 0, args.seed)
        show_dir = None
        if args.mode == "show":
            show_dir = log_dir / "show"
            show_dir.mkdir(exist_ok=True)
        ret = run_eval(config, model, state.params, state.batch_stats, val_ds,
                       logger, 0, show_dir,
                       host_id=jax.process_index(), num_hosts=jax.process_count(),
                       gather_dir=str(log_dir / "eval_gather" / "step_0"))
        if ret is not None:  # hosts != 0 ship detections and return None
            print(json.dumps(
                {k: v for k, v in ret.items() if k.startswith("mA")}))
        return ret

    # ---- train ----
    mesh = make_mesh(jax.devices(), ("data",)) if n_devices > 1 else None
    step_fn = make_train_step(model, config, tx, mesh=mesh)
    if mesh is not None:
        state = jax.device_put(state, replicated_sharding(mesh))
        bsh = batch_sharding(mesh)

    total_steps = args.max_steps or config.train.training_steps
    rng = jax.random.PRNGKey(args.seed)
    step = int(jax.device_get(state.step))
    steps_per_epoch = max(1, len(train_loader))
    epoch = step // steps_per_epoch
    train_loader.epoch = epoch  # keep the shuffle order on the resumed epoch
    rng = jax.random.fold_in(rng, step)
    t_last = time.time()
    profiled = False
    val_ds_cache = None
    while step < total_steps:
        for batch in train_loader:
            if step >= total_steps:
                break
            device_batch = {
                k: v for k, v in batch.items() if k != "index"
            }
            if mesh is not None:
                device_batch = {
                    k: jax.device_put(v, bsh) for k, v in device_batch.items()
                }
            rng, step_rng = jax.random.split(rng)
            if args.profile_steps and not profiled and step == 5:
                jax.profiler.start_trace(str(log_dir / "profile"))
            state, metrics = step_fn(state, device_batch, step_rng)
            if args.profile_steps and not profiled and step == 5 + args.profile_steps:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                profiled = True
            step += 1
            if step % 10 == 0:
                metrics = jax.tree_util.tree_map(float, jax.device_get(metrics))
                dt = time.time() - t_last
                t_last = time.time()
                metrics["steps_per_sec"] = 10 / dt
                logger.log(step, metrics, prefix="train/")
                print(f"step {step}: loss={metrics['loss']:.4f} "
                      f"({metrics['steps_per_sec']:.2f} it/s)", flush=True)
        epoch += 1
        save_checkpoint(str(log_dir / "ckpt"), jax.device_get(state), step)
        if args.eval_every_epochs and epoch % args.eval_every_epochs == 0:
            if val_ds_cache is None:
                val_ds_cache, _ = build_dataset_and_loader(
                    config, False, 1, 0, args.seed)
            run_eval(config, model, state.params, state.batch_stats,
                     val_ds_cache, logger, step, num_workers=args.num_workers,
                     host_id=jax.process_index(), num_hosts=jax.process_count(),
                     gather_dir=str(log_dir / "eval_gather" / f"step_{step}"))
    save_checkpoint(str(log_dir / "ckpt"), jax.device_get(state), step)


if __name__ == "__main__":
    main()
