"""3D convolutional neck over the voxel volume.

FastIndoorImVoxelNeck (/root/reference/mmdet3d_plugin/models/necks/
imvoxelnet.py:8-67): 3-scale residual encoder-decoder, outputs
[(C_out, X, Y, Z), (C_out, X/2, ...), (C_out, X/4, ...)] finest-first.
3D convs map straight onto XLA's conv lowering (MXU)."""
from __future__ import annotations

from typing import Sequence

from flax import linen as nn

from .layers import BatchNorm, Conv, ConvTranspose


class BasicBlock3dV2(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        out = Conv(self.features, 3, self.stride, 1, use_bias=False, ndim=3, name="conv1")(x)
        out = BatchNorm(name="norm1")(out, train)
        out = nn.relu(out)
        out = Conv(self.features, 3, 1, 1, use_bias=False, ndim=3, name="conv2")(out)
        out = BatchNorm(name="norm2")(out, train)
        if self.stride != 1:
            identity = Conv(self.features, 1, self.stride, use_bias=False, ndim=3, name="down_conv")(x)
            identity = BatchNorm(name="down_norm")(identity, train)
        return nn.relu(out + identity)


class _OutBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train=False):
        x = Conv(self.features, 3, 1, 1, use_bias=False, ndim=3, name="conv")(x)
        x = BatchNorm(name="norm")(x, train)
        return nn.relu(x)


class _UpBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train=False):
        x = ConvTranspose(self.features, 2, 2, use_bias=False, ndim=3, name="deconv")(x)
        x = BatchNorm(name="norm1")(x, train)
        x = nn.relu(x)
        x = Conv(self.features, 3, 1, 1, use_bias=False, ndim=3, name="conv")(x)
        x = BatchNorm(name="norm2")(x, train)
        return nn.relu(x)


class FastIndoorImVoxelNeck(nn.Module):
    out_channels: int = 128
    n_blocks: Sequence[int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x, train=False):
        """x: (B, C, X, Y, Z) -> list of 3 scales, finest first."""
        n_scales = len(self.n_blocks)
        n_channels = x.shape[1]
        down_outs = []
        for i in range(n_scales):
            stride = 1 if i == 0 else 2
            for b in range(self.n_blocks[i]):
                if b == 0 and stride != 1:
                    n_channels *= 2
                    x = BasicBlock3dV2(n_channels, stride, name=f"down_{i}_{b}")(x, train)
                else:
                    x = BasicBlock3dV2(n_channels, 1, name=f"down_{i}_{b}")(x, train)
            down_outs.append(x)
        outs = []
        for i in range(n_scales - 1, -1, -1):
            if i < n_scales - 1:
                x = _UpBlock(x.shape[1] // 2, name=f"up_{i + 1}")(x, train)
                x = down_outs[i] + x
            outs.append(_OutBlock(self.out_channels, name=f"out_{i}")(x, train))
        return outs[::-1]
