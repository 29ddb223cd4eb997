"""MobileNetV2 backbone, output-stride 16 (dilated last stage).

Reference: aot_plus/networks/encoders/mobilenetv2.py:63-247. NHWC, frozen BN.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from rmem_ocu_tpu.ops.layers import make_bn


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class ConvBNReLU(nn.Module):
    out: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    frozen_bn: bool = True

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2 * self.dilation
        x = nn.Conv(self.out, (self.kernel, self.kernel), strides=self.stride,
                    padding=pad, kernel_dilation=self.dilation,
                    feature_group_count=self.groups, use_bias=False,
                    name='conv')(x)
        x = make_bn(self.out, self.frozen_bn, 'bn')(x)
        return jnp.clip(x, 0.0, 6.0)  # ReLU6


class InvertedResidual(nn.Module):
    inp: int
    oup: int
    stride: int
    dilation: int
    expand_ratio: int
    frozen_bn: bool = True

    @nn.compact
    def __call__(self, x):
        hidden = int(round(self.inp * self.expand_ratio))
        use_res = self.stride == 1 and self.inp == self.oup
        out = x
        i = 0
        if self.expand_ratio != 1:
            out = ConvBNReLU(hidden, kernel=1, frozen_bn=self.frozen_bn,
                             name=f'conv_{i}')(out)
            i += 1
        out = ConvBNReLU(hidden, stride=self.stride, dilation=self.dilation,
                         groups=hidden, frozen_bn=self.frozen_bn,
                         name=f'conv_{i}')(out)
        out = nn.Conv(self.oup, (1, 1), use_bias=False,
                      name=f'conv_{i + 1}')(out)
        out = make_bn(self.oup, self.frozen_bn, f'bn_{i + 1}')(out)
        return x + out if use_res else out


# t (expand), c (channels), n (repeats), s (stride)
_SETTING = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


class MobileNetV2Encoder(nn.Module):
    output_stride: int = 16
    width_mult: float = 1.0
    frozen_bn: bool = True

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] -> [4x(24), 8x(32), 16x(96), 16x(1280)]."""
        input_channel = _make_divisible(32 * self.width_mult)
        last_channel = _make_divisible(1280 * max(1.0, self.width_mult))

        feats = []
        x = ConvBNReLU(input_channel, stride=2, frozen_bn=self.frozen_bn,
                       name='feat_0')(x)
        feats.append(x)
        current_stride, rate = 2, 1
        idx = 1
        for t, c, n, s in _SETTING:
            if current_stride == self.output_stride:
                stride, dilation = 1, rate
                rate *= s
            else:
                stride, dilation = s, 1
                current_stride *= s
            out_ch = _make_divisible(c * self.width_mult)
            for i in range(n):
                x = InvertedResidual(
                    input_channel, out_ch,
                    stride if i == 0 else 1,
                    dilation if i == 0 else rate,
                    t, frozen_bn=self.frozen_bn, name=f'feat_{idx}')(x)
                input_channel = out_ch
                feats.append(x)
                idx += 1
        x = ConvBNReLU(last_channel, kernel=1, frozen_bn=self.frozen_bn,
                       name=f'feat_{idx}')(x)
        feats.append(x)

        # stage split mirrors reference mobilenetv2.py:210-215:
        # features[0:4] -> 4x, [4:7] -> 8x, [7:14] -> 16x, [14:] -> "32x"
        return [feats[3], feats[6], feats[13], feats[-1]]
