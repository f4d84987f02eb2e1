from .resnet import ResNet, ResNetFPNMatching
from .fpn import FPN
from .depth_net import DepthNetFusion
from .neck3d import FastIndoorImVoxelNeck
from .det_head import ImVoxelHead
from .view_transformer import ViewTransformer
from .sparse_head import AdaptiveSparseVolume
from .detector import SGCDet

__all__ = [
    "ResNet",
    "ResNetFPNMatching",
    "FPN",
    "DepthNetFusion",
    "FastIndoorImVoxelNeck",
    "ImVoxelHead",
    "ViewTransformer",
    "AdaptiveSparseVolume",
    "SGCDet",
]
