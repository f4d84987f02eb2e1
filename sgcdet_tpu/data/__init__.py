from .datasets import MultiViewDataset, load_infos
from .pipeline import (
    sample_view_ids,
    load_and_preprocess_image,
    load_depth_map,
    prepare_scene,
)
from .loader import SceneLoader, pad_gt

__all__ = [
    "MultiViewDataset",
    "load_infos",
    "sample_view_ids",
    "load_and_preprocess_image",
    "load_depth_map",
    "prepare_scene",
    "SceneLoader",
    "pad_gt",
]
