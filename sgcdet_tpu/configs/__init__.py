from .config import (
    SGCDetConfig,
    ModelConfig,
    DataConfig,
    TrainConfig,
    TestConfig,
    scannet,
    arkit,
    scannet200_large,
    arkit_large,
    get_config,
    apply_overrides,
)

__all__ = [
    "SGCDetConfig",
    "ModelConfig",
    "DataConfig",
    "TrainConfig",
    "TestConfig",
    "scannet",
    "arkit",
    "scannet200_large",
    "arkit_large",
    "get_config",
    "apply_overrides",
]
