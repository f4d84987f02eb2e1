"""Feature Pyramid Network matching mmdet's FPN as configured by SGCDet
(configs/SGCDet_ScanNet.py:84-88: in_channels [256,512,1024,2048],
out_channels 256, num_outs=4, no extra convs, nearest top-down upsample)."""
from __future__ import annotations

from typing import Sequence

from flax import linen as nn

from .layers import Conv, interpolate_nearest_size, xavier_uniform_init


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 4

    @nn.compact
    def __call__(self, inputs: Sequence):
        n = len(inputs)
        laterals = [
            Conv(
                self.out_channels,
                1,
                kernel_init=xavier_uniform_init,
                name=f"lateral_{i}",
            )(inputs[i])
            for i in range(n)
        ]
        for i in range(n - 1, 0, -1):
            # mmdet upsamples with size= (nearest) so odd shapes (15x20 from
            # 8x10) line up exactly
            up = interpolate_nearest_size(laterals[i], laterals[i - 1].shape[2:])
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            Conv(
                self.out_channels,
                3,
                padding=1,
                kernel_init=xavier_uniform_init,
                name=f"fpn_{i}",
            )(laterals[i])
            for i in range(min(n, self.num_outs))
        ]
        return outs
