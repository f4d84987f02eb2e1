"""Backbone networks.

* :class:`ResNet` — torchvision/mmdet-compatible ResNet-50 'pytorch'-style
  bottleneck backbone with frozen stem/stage-1 and eval-mode BN everywhere
  (configs/SGCDet_ScanNet.py:74-83: frozen_stages=1, norm_eval=True,
  norm requires_grad=False). BN is therefore always running-stats here; the
  optimizer masks the stem/stage-1 convs and all BN affines (train/optim.py).
* :class:`ResNetFPNMatching` — the truncated ResNet-18 stereo-matching
  extractor of the depth head (depth_utils/extractor_matching.py:7-88), output
  stride 4, 128 channels. Its BN layers train normally.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, Conv


def max_pool_nchw(x, window, stride, padding):
    """torch MaxPool2d on NCHW with symmetric padding."""
    return jnp.transpose(
        nn.max_pool(
            jnp.transpose(x, (0, 2, 3, 1)),
            (window, window),
            (stride, stride),
            [(padding, padding), (padding, padding)],
        ),
        (0, 3, 1, 2),
    )


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = Conv(self.planes, 1, use_bias=False, name="conv1")(x)
        out = BatchNorm(frozen=True, name="bn1")(out, train)
        out = nn.relu(out)
        # 'pytorch' style: stride on the 3x3 conv
        out = Conv(self.planes, 3, self.stride, 1, use_bias=False, name="conv2")(out)
        out = BatchNorm(frozen=True, name="bn2")(out, train)
        out = nn.relu(out)
        out = Conv(self.planes * self.expansion, 1, use_bias=False, name="conv3")(out)
        out = BatchNorm(frozen=True, name="bn3")(out, train)
        if self.downsample:
            identity = Conv(
                self.planes * self.expansion,
                1,
                self.stride,
                use_bias=False,
                name="downsample_conv",
            )(x)
            identity = BatchNorm(frozen=True, name="downsample_bn")(identity, train)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """ResNet-50 (default) returning the four stage outputs, NCHW."""

    depth: int = 50
    out_indices: Sequence[int] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        blocks_per_stage = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[self.depth]
        x = Conv(64, 7, 2, 3, use_bias=False, name="conv1")(x)
        x = BatchNorm(frozen=True, name="bn1")(x, train)
        x = nn.relu(x)
        x = max_pool_nchw(x, 3, 2, 1)

        outs = []
        planes = 64
        for stage, n_blocks in enumerate(blocks_per_stage):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                x = Bottleneck(
                    planes,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0),
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return outs


class MatchingBasicBlock(nn.Module):
    """BasicBlock of the matching extractor (layer_matching.py:110-135).

    Note: convs have bias, relu applied after bn2 *before* the residual add,
    and a bn'd 1x1 downsample whenever stride != 1 or channels change.
    """

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[1]
        y = Conv(self.planes, 3, self.stride, 1, name="conv1")(x)
        y = BatchNorm(name="bn1")(y, train)
        y = nn.relu(y)
        y = Conv(self.planes, 3, 1, 1, name="conv2")(y)
        y = BatchNorm(name="bn2")(y, train)
        y = nn.relu(y)
        if self.stride != 1 or in_planes != self.planes:
            x = Conv(self.planes, 1, self.stride, name="downsample_conv")(x)
            x = BatchNorm(name="bn3")(x, train)
        return nn.relu(x + y)


class ResNetFPNMatching(nn.Module):
    """Truncated ResNet-18 matching feature extractor, output stride 4."""

    output_dim: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(64, 7, 2, 3, name="conv1")(x)
        x = BatchNorm(name="bn1")(x, train)
        x = nn.relu(x)
        x = MatchingBasicBlock(64, 1, name="layer1_0")(x, train)
        x = MatchingBasicBlock(64, 1, name="layer1_1")(x, train)
        x = MatchingBasicBlock(128, 2, name="layer2_0")(x, train)
        x = MatchingBasicBlock(128, 1, name="layer2_1")(x, train)
        return Conv(self.output_dim, 1, name="final_conv")(x)
