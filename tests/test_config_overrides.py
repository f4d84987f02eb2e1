"""Unit tests for the CLI config-override merge (configs.apply_overrides —
the analog of the reference's cfg.update(vars(args)), main.py:28-30)."""
import pytest

from sgcdet_tpu.configs import apply_overrides, get_config


def test_scalar_and_nested_paths():
    cfg = get_config("scannet")
    out = apply_overrides(cfg, [
        "model.embed_dims=32",
        "model.test_cfg.nms_pre=64",
        "data.n_images_train=4",
        "train.lr=0.001",
    ])
    assert out.model.embed_dims == 32
    assert out.model.test_cfg.nms_pre == 64
    assert out.data.n_images_train == 4
    assert out.train.lr == 0.001
    # untouched fields and the original config are preserved
    assert out.model.n_classes == cfg.model.n_classes
    assert cfg.model.embed_dims == 256


def test_tuple_and_string_values():
    cfg = get_config("scannet")
    out = apply_overrides(cfg, [
        "model.n_voxels_list=((2,2,1),(4,4,2),(8,8,4))",
        "model.compute_dtype=float32",
        "data.ann_train=custom.pkl",
    ])
    assert out.model.n_voxels_list == ((2, 2, 1), (4, 4, 2), (8, 8, 4))
    assert out.model.compute_dtype == "float32"  # non-literal -> raw string
    assert out.data.ann_train == "custom.pkl"


def test_bool_and_none():
    cfg = get_config("scannet")
    out = apply_overrides(cfg, [
        "model.depth_loss=True",
        "model.visibility_budget=None",
    ])
    assert out.model.depth_loss is True
    assert out.model.visibility_budget is None


def test_errors():
    cfg = get_config("scannet")
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["model.nope=1"])
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["model.embed_dims"])
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["bogus.embed_dims=1"])


def test_empty_is_identity():
    cfg = get_config("arkit")
    assert apply_overrides(cfg, []) == cfg
    assert apply_overrides(cfg, None) == cfg
