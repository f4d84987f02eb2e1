"""Optimizer / LR schedule: AdamW with a 0.1x-lr backbone group + frozen
stem/stage-1/backbone-BN, OneCycle cosine schedule, global-norm clip 35.

Reference: LightningTools/pl_model.py:92-143 (two param groups),
main.py:71-72 (gradient_clip_val=35), configs/*:optimizer/lr_scheduler.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import optax


def onecycle_schedule(max_lr, total_steps, pct_start=0.05, div_factor=25.0,
                      final_div_factor=1e4):
    """torch OneCycleLR(anneal_strategy='cos', cycle_momentum=False) values.

    initial_lr = max_lr/div_factor; min_lr = initial_lr/final_div_factor;
    cos ramp up over pct_start*total, cos anneal down over the rest.
    """
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    # torch phase boundaries: up ends at pct_start*total - 1, down at total - 1
    up_end = float(pct_start * total_steps) - 1.0
    down_end = float(total_steps) - 1.0

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        up_pct = jnp.clip(step / jnp.maximum(up_end, 1.0), 0.0, 1.0)
        lr_up = max_lr + (initial_lr - max_lr) / 2.0 * (1 + jnp.cos(jnp.pi * up_pct))
        down_pct = jnp.clip(
            (step - up_end) / jnp.maximum(down_end - up_end, 1.0), 0.0, 1.0
        )
        lr_down = min_lr + (max_lr - min_lr) / 2.0 * (1 + jnp.cos(jnp.pi * down_pct))
        return jnp.where(step <= up_end, lr_up, lr_down)

    return schedule


def _path_str(path):
    return "/".join(
        p.key if hasattr(p, "key") else str(p) for p in path
    )


def param_label(path, _leaf=None):
    """'frozen' | 'backbone' | 'other' for a flax param path.

    frozen = backbone stem + stage-1 convs + every backbone BN affine
    (frozen_stages=1, norm_eval + requires_grad=False in
    configs/SGCDet_ScanNet.py:80-82) — they are excluded from the optimizer in
    the reference (requires_grad=False params never reach torch AdamW).
    """
    s = _path_str(path)
    if s.startswith("backbone/"):
        parts = s.split("/")
        module_names = parts[1:-1] or parts[1:]
        # any BN inside the backbone
        if any(m.startswith("bn") or m.endswith("_bn") or m == "downsample_bn" for m in module_names):
            return "frozen"
        if parts[1] in ("conv1", "bn1") or parts[1].startswith("layer1_"):
            return "frozen"
        return "backbone"
    return "other"


def zero_nans():
    """Gradient transform that zeroes NaN/Inf gradient entries — the defensive
    equivalent of the reference's (unused) GradClip autograd guard
    (depth_utils/layer_matching.py:13-28)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        updates = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), updates
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(params, train_cfg):
    """optax chain: clip 35 -> {frozen: zero, backbone: adamw 0.1x, other: adamw}."""
    labels = jax.tree_util.tree_map_with_path(lambda p, x: param_label(p), params)
    sched_backbone = onecycle_schedule(
        train_cfg.lr * train_cfg.backbone_lr_mult,
        train_cfg.training_steps,
        train_cfg.pct_start,
        train_cfg.div_factor,
        train_cfg.final_div_factor,
    )
    sched_other = onecycle_schedule(
        train_cfg.lr,
        train_cfg.training_steps,
        train_cfg.pct_start,
        train_cfg.div_factor,
        train_cfg.final_div_factor,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(train_cfg.grad_clip),
        optax.multi_transform(
            {
                "frozen": optax.set_to_zero(),
                "backbone": optax.adamw(
                    sched_backbone, weight_decay=train_cfg.weight_decay
                ),
                "other": optax.adamw(sched_other, weight_decay=train_cfg.weight_decay),
            },
            labels,
        ),
    )
    return tx, labels
