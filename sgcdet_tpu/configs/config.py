"""Declarative configuration: dataclass equivalents of the reference's four
released configs (/root/reference/configs/SGCDet_ScanNet.py, SGCDet_ARKit.py,
SGCDet_large_ScanNet200.py, SGCDet_large_ARKit.py).

Everything shape-relevant is static here so the whole model jits once per
config. ``get_config(name)`` is the public entry used by the CLI.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Tuple

SCANNET_CLASSES = (
    "cabinet", "bed", "chair", "sofa", "table", "door", "window", "bookshelf",
    "picture", "counter", "desk", "curtain", "refrigerator", "showercurtrain",
    "toilet", "sink", "bathtub", "garbagebin",
)

ARKIT_CLASSES = (
    "cabinet", "refrigerator", "shelf", "stove", "bed", "sink", "washer",
    "toilet", "bathtub", "oven", "dishwasher", "fireplace", "stool", "chair",
    "table", "tv_monitor", "sofa",
)

SCANNET200_CLASSES = tuple(
    [
        'wall', 'chair', 'floor', 'table', 'door', 'couch', 'cabinet', 'shelf', 'desk',
        'office chair', 'bed', 'pillow', 'sink', 'picture', 'window', 'toilet', 'bookshelf',
        'monitor', 'curtain', 'book', 'armchair', 'coffee table', 'box', 'refrigerator', 'lamp',
        'kitchen cabinet', 'towel', 'clothes', 'tv', 'nightstand', 'counter', 'dresser', 'stool',
        'cushion', 'plant', 'ceiling', 'bathtub', 'end table', 'dining table', 'keyboard', 'bag',
        'backpack', 'toilet paper', 'printer', 'tv stand', 'whiteboard', 'blanket', 'shower curtain',
        'trash can', 'closet', 'stairs', 'microwave', 'stove', 'shoe', 'computer tower', 'bottle',
        'bin', 'ottoman', 'bench', 'board', 'washing machine', 'mirror', 'copier', 'basket',
        'sofa chair', 'file cabinet', 'fan', 'laptop', 'shower', 'paper', 'person',
        'paper towel dispenser', 'oven', 'blinds', 'rack', 'plate', 'blackboard', 'piano',
        'suitcase', 'rail', 'radiator', 'recycling bin', 'container', 'wardrobe', 'soap dispenser',
        'telephone', 'bucket', 'clock', 'stand', 'light', 'laundry basket', 'pipe', 'clothes dryer',
        'guitar', 'toilet paper holder', 'seat', 'speaker', 'column', 'ladder', 'bathroom stall',
        'shower wall', 'cup', 'jacket', 'storage bin', 'coffee maker', 'dishwasher',
        'paper towel roll', 'machine', 'mat', 'windowsill', 'bar', 'toaster', 'bulletin board',
        'ironing board', 'fireplace', 'soap dish', 'kitchen counter', 'doorframe',
        'toilet paper dispenser', 'mini fridge', 'fire extinguisher', 'ball', 'hat',
        'shower curtain rod', 'water cooler', 'paper cutter', 'tray', 'shower door', 'pillar',
        'ledge', 'toaster oven', 'mouse', 'toilet seat cover dispenser', 'furniture', 'cart',
        'scale', 'tissue box', 'light switch', 'crate', 'power outlet', 'decoration', 'sign',
        'projector', 'closet door', 'vacuum cleaner', 'plunger', 'stuffed animal', 'headphones',
        'dish rack', 'broom', 'range hood', 'dustpan', 'hair dryer', 'water bottle', 'handicap bar',
        'vent', 'shower floor', 'water pitcher', 'mailbox', 'bowl', 'paper bag', 'projector screen',
        'divider', 'laundry detergent', 'bathroom counter', 'object', 'bathroom vanity',
        'closet wall', 'laundry hamper', 'bathroom stall door', 'ceiling light', 'trash bin',
        'dumbbell', 'stair rail', 'tube', 'bathroom cabinet', 'closet rod', 'coffee kettle',
        'shower head', 'keyboard piano', 'case of water bottles', 'coat rack', 'folded chair',
        'fire alarm', 'power strip', 'calendar', 'poster', 'potted plant', 'mattress',
    ]
)


@dataclass(frozen=True)
class TestConfig:
    nms_pre: int = 1000
    score_thr: float = 0.01
    iou_thr: float = 0.25        # aligned NMS threshold (ScanNet head)
    nms_thr: float = 0.15        # rotated BEV NMS threshold (ARKit head)
    use_rotate_nms: bool = False


@dataclass(frozen=True)
class ModelConfig:
    embed_dims: int = 256
    n_classes: int = 18
    n_reg_outs: int = 6
    head_type: str = "scannet"  # 'scannet' (aligned boxes) | 'sunrgbd' (yawed)
    # adaptive sparse volume (coarse -> fine)
    voxel_size_list: Tuple[Tuple[float, float, float], ...] = (
        (0.64, 0.64, 0.8),
        (0.32, 0.32, 0.4),
        (0.16, 0.16, 0.2),
    )
    n_voxels_list: Tuple[Tuple[int, int, int], ...] = (
        (10, 10, 4),
        (20, 20, 8),
        (40, 40, 16),
    )
    topk_list: Tuple[int, ...] = (800, 6400)
    # depth head
    dbound: Tuple[float, float, float] = (0.2, 5.0, 0.4)
    neighbor_img_num: int = 2
    # plane-sweep banded-Gram path (ops/sweep_band.py): source-row band per
    # output scanline; the channel contraction runs on the MXU before any
    # interpolation.  Exact whenever every in-image source row an output row
    # needs fits the band (plane_sweep_band_violations == 0).  None (default)
    # = the per-sample gather kernels, exact for every geometry.  Set a
    # width derived from the actual rigs (utils.visibility.
    # required_sweep_band — rigs with large inter-neighbor rotation can need
    # the full image height, at which point banding stops paying; ~2.7x
    # faster than the gather kernel when a band of ~12-16 covers).
    sweep_band: int | None = None
    downsample_factor: int = 8
    depth_loss_weight: float = 0.5
    depth_max_tol: int = 0
    # rematerialize the depth net in the backward.  The original motivation
    # (plane-sweep warps ~1 GB/neighbor) is gone — the fused sweep kernels
    # never materialize the warp volume and their VJP regathers rows
    # internally — so at base scale this only re-runs the whole depth
    # forward (~60 ms) inside the backward.  Kept available for the -L
    # configs / 100-view training where activation memory binds.
    depth_remat: bool = False
    # attention
    num_heads: int = 8
    num_points: int = 4
    num_levels: int = 1
    ffn_dropout: float = 0.1
    attn_dropout: float = 0.0
    # per-camera visible-query compaction budget: fraction of K (all levels),
    # or a per-pyramid-level tuple of fractions (1.0 disables a level), or
    # None = off.  Exact vs the dense path when ceil(frac*K) >= max visible
    # voxels per camera at that level (see
    # DeformCrossAttention.visibility_budget and
    # utils.visibility.derive_visibility_budgets).
    visibility_budget: float | Tuple[float, ...] | None = None
    # order compacted per-camera queries by projected image row (an exact
    # permutation) so the DFA3D kernels' gathers are chunk-coherent; off by
    # default — only the experimental windowed kernels benefit
    sort_queries: bool = False
    # 3D neck
    neck3d_out_channels: int = 128
    neck3d_n_blocks: Tuple[int, ...] = (1, 1, 1)
    # detection head
    n_scales: int = 3
    limit: int = 27
    centerness_topk: int = 18
    # losses
    occ_loss: bool = True
    depth_loss: bool = False
    use_gt_dpt: bool = False
    # 'bfloat16' (default; MXU-native — comparable precision class to the
    # TF32 convs the PyTorch reference effectively runs on GPU, and immune to
    # the fp16 underflow its force_fp32 guards exist for; BN statistics,
    # sampling coordinates and losses stay f32) or 'float32' (strict parity)
    compute_dtype: str = "bfloat16"
    test_cfg: TestConfig = field(default_factory=TestConfig)

    @property
    def depth_channels(self) -> int:
        return round((self.dbound[1] - self.dbound[0]) / self.dbound[2])

    @property
    def n_voxels(self):
        return self.n_voxels_list[-1]

    @property
    def voxel_size(self):
        return self.voxel_size_list[-1]


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "scannet"  # scannet | scannet200 | arkit
    data_root: str = "data/scannet/"
    ann_train: str = "scannet_infos_train.pkl"
    ann_val: str = "scannet_infos_val.pkl"
    classes: Tuple[str, ...] = SCANNET_CLASSES
    n_images_train: int = 40
    n_images_test: int = 100
    sample_method_train: str = "random"  # random | uniform_random | linear
    # resize target (w, h) keep-ratio, then pad to pad_size (h, w)
    img_scale: Tuple[int, int] = (320, 240)
    pad_size: Tuple[int, int] = (240, 320)
    # static resized (pre-pad) shape for the dataset's native resolution;
    # ScanNet 968x1296 -> (239, 320)
    img_shape: Tuple[int, int] = (239, 320)
    ori_shape: Tuple[int, int] = (968, 1296)
    mean: Tuple[float, float, float] = (123.675, 116.28, 103.53)
    std: Tuple[float, float, float] = (58.395, 57.12, 57.375)
    depth_shift: float = 1000.0
    origin: str = "fixed"  # fixed [0,0,.5] | pose_center (ARKit)
    shift_origin_std: Tuple[float, float, float] = (0.7, 0.7, 0.0)
    repeat_times: int = 6
    filter_empty_gt: bool = True
    max_boxes: int = 128  # static GT padding for jit


@dataclass(frozen=True)
class TrainConfig:
    lr: float = 2e-4
    weight_decay: float = 1e-4
    training_steps: int = 1201 * 36
    pct_start: float = 0.05
    final_div_factor: float = 1e4
    div_factor: float = 25.0  # torch OneCycleLR default initial_lr = max_lr/25
    grad_clip: float = 35.0
    backbone_lr_mult: float = 0.1
    batch_size_per_device: int = 1


@dataclass(frozen=True)
class SGCDetConfig:
    name: str = "sgcdet_scannet"
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)


def scannet() -> SGCDetConfig:
    """configs/SGCDet_ScanNet.py"""
    return SGCDetConfig(name="sgcdet_scannet")


def arkit() -> SGCDetConfig:
    """configs/SGCDet_ARKit.py"""
    return SGCDetConfig(
        name="sgcdet_arkit",
        model=ModelConfig(
            n_classes=17,
            n_reg_outs=7,
            head_type="sunrgbd",
            downsample_factor=4,
            test_cfg=TestConfig(score_thr=0.0, nms_thr=0.15, use_rotate_nms=True),
        ),
        data=DataConfig(
            dataset="arkit",
            data_root="data/arkit/",
            ann_train="arkit_infos_train.pkl",
            ann_val="arkit_infos_val.pkl",
            classes=ARKIT_CLASSES,
            sample_method_train="uniform_random",
            img_shape=(240, 320),
            ori_shape=(1440, 1920),
            origin="pose_center",
            repeat_times=3,
        ),
        train=TrainConfig(training_steps=4498 * 18),
    )


_LARGE_SPARSE = dict(
    voxel_size_list=((0.32, 0.32, 0.4), (0.16, 0.16, 0.2), (0.08, 0.08, 0.1)),
    n_voxels_list=((20, 20, 8), (40, 40, 16), (80, 80, 32)),
    topk_list=(6400, 51200),
    embed_dims=128,
)


def scannet200_large() -> SGCDetConfig:
    """configs/SGCDet_large_ScanNet200.py"""
    return SGCDetConfig(
        name="sgcdet_large_scannet200",
        model=ModelConfig(n_classes=189, **_LARGE_SPARSE),
        data=DataConfig(
            dataset="scannet200",
            ann_train="scannet200_infos_train.pkl",
            ann_val="scannet200_infos_val.pkl",
            classes=SCANNET200_CLASSES,
            repeat_times=3,
        ),
        train=TrainConfig(training_steps=1201 * 45),
    )


def arkit_large() -> SGCDetConfig:
    """configs/SGCDet_large_ARKit.py"""
    base = arkit()
    return dataclasses.replace(
        base,
        name="sgcdet_large_arkit",
        model=dataclasses.replace(base.model, **_LARGE_SPARSE),
    )


_REGISTRY = {
    "scannet": scannet,
    "arkit": arkit,
    "scannet200_large": scannet200_large,
    "arkit_large": arkit_large,
}


def get_config(name: str) -> SGCDetConfig:
    if name not in _REGISTRY:
        raise KeyError(f"unknown config '{name}'; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name]()


def apply_overrides(config: SGCDetConfig, overrides) -> SGCDetConfig:
    """Apply ``section.key=value`` strings onto a (frozen) config.

    The TPU-native analog of the reference CLI's config merge
    (/root/reference/main.py:28-30, ``cfg.update(vars(args))``): values are
    parsed with ast.literal_eval (falling back to the raw string), and dotted
    paths descend nested dataclasses, e.g.
    ``model.embed_dims=32`` or ``model.test_cfg.nms_pre=100``.
    """
    import ast

    def set_path(obj, path, value):
        key = path[0]
        if not hasattr(obj, key):
            raise KeyError(
                f"config has no field '{key}' at {type(obj).__name__}"
            )
        if len(path) == 1:
            return dataclasses.replace(obj, **{key: value})
        return dataclasses.replace(
            obj, **{key: set_path(getattr(obj, key), path[1:], value)}
        )

    for item in overrides or ():
        path_s, _, value_s = item.partition("=")
        if not _:
            raise ValueError(f"override '{item}' is not of the form key=value")
        try:
            value = ast.literal_eval(value_s)
        except (ValueError, SyntaxError):
            value = value_s
        config = set_path(config, path_s.strip().split("."), value)
    return config
