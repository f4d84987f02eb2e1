from .nms import aligned_3d_nms, nms_bev, nms_normal_bev, box3d_multiclass_nms
from .msda import (
    msda_2d,
    dfa3d_attention,
    sample_depth_scores,
)
from .dfa3d_fast import msda_2d_fast

__all__ = [
    "aligned_3d_nms",
    "nms_bev",
    "nms_normal_bev",
    "box3d_multiclass_nms",
    "msda_2d",
    "msda_2d_fast",
    "dfa3d_attention",
    "sample_depth_scores",
]
