"""ResNet-50/101 backbone, output-stride 16, stage-5 dropped.

Reference: aot_plus/networks/encoders/resnet.py:10-213. NHWC, frozen BN.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn

from rmem_ocu_tpu.ops.layers import make_bn, max_pool_3x3_s2
from rmem_ocu_tpu.ops.s2d import S2DConv


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    frozen_bn: bool = True

    @nn.compact
    def __call__(self, x):
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name='conv1')(x)
        out = make_bn(self.planes, self.frozen_bn, 'bn1')(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=self.stride,
                      kernel_dilation=self.dilation, padding=self.dilation,
                      use_bias=False, name='conv2')(out)
        out = make_bn(self.planes, self.frozen_bn, 'bn2')(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      name='conv3')(out)
        out = make_bn(self.planes * 4, self.frozen_bn, 'bn3')(out)
        if self.has_downsample:
            residual = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                               use_bias=False, name='downsample_conv')(x)
            residual = make_bn(self.planes * 4, self.frozen_bn,
                               'downsample_bn')(residual)
        return nn.relu(out + residual)


class ResNetEncoder(nn.Module):
    layers: Tuple[int, int, int] = (3, 4, 6)   # r50; r101 = (3, 4, 23)
    output_stride: int = 16
    frozen_bn: bool = True

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] -> [4x(256), 8x(512), 16x(1024), 16x(1024)]."""
        strides = (1, 2, 2)
        dilations = (1, 1, 1) if self.output_stride == 16 else (1, 2, 4)

        # space-to-depth stem: a strided 3-channel 7x7 runs at ~3.8 TF/s
        # on the MXU; the s2d-equivalent unstrided conv is ~10x faster
        # (same params/math, see ops/s2d.py)
        x = S2DConv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name='conv1')(x)
        x = make_bn(64, self.frozen_bn, 'bn1')(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        xs = []
        inplanes = 64
        for stage_idx, (planes, blocks) in enumerate(
                zip((64, 128, 256), self.layers)):
            stride = strides[stage_idx]
            dilation = dilations[stage_idx]
            for block_idx in range(blocks):
                first = block_idx == 0
                x = Bottleneck(
                    planes,
                    stride=stride if first else 1,
                    dilation=max(dilation // 2, 1) if first else dilation,
                    has_downsample=first and (
                        stride != 1 or inplanes != planes * 4),
                    frozen_bn=self.frozen_bn,
                    name=f'layer{stage_idx + 1}_{block_idx}')(x)
                inplanes = planes * 4
            xs.append(x)
        xs.append(xs[-1])  # stage 5 dropped, 16x duplicated
        return xs
