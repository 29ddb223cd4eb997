"""MobileNetV3-Large backbone, output-stride 16.

Reference: aot_plus/networks/encoders/mobilenetv3.py:1-239. NHWC, frozen BN.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from rmem_ocu_tpu.ops.layers import make_bn
from rmem_ocu_tpu.ops.s2d import S2DConv


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def h_sigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def h_swish(x):
    return x * h_sigmoid(x)


class SELayer(nn.Module):
    channel: int
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(_make_divisible(self.channel // self.reduction),
                     name='fc1')(y)
        y = nn.relu(y)
        y = nn.Dense(self.channel, name='fc2')(y)
        y = h_sigmoid(y)
        return x * y[:, None, None, :]


class MBV3Block(nn.Module):
    inp: int
    hidden: int
    oup: int
    kernel: int
    stride: int
    dilation: int
    use_se: bool
    use_hs: bool
    frozen_bn: bool = True

    @nn.compact
    def __call__(self, x):
        act = h_swish if self.use_hs else nn.relu
        identity = self.stride == 1 and self.inp == self.oup
        out = x
        if self.inp != self.hidden:
            out = nn.Conv(self.hidden, (1, 1), use_bias=False,
                          name='pw')(out)
            out = make_bn(self.hidden, self.frozen_bn, 'pw_bn')(out)
            out = act(out)
        pad = (self.kernel - 1) // 2 * self.dilation
        out = nn.Conv(self.hidden, (self.kernel, self.kernel),
                      strides=self.stride, padding=pad,
                      kernel_dilation=self.dilation,
                      feature_group_count=self.hidden, use_bias=False,
                      name='dw')(out)
        out = make_bn(self.hidden, self.frozen_bn, 'dw_bn')(out)
        if self.use_se:
            out = SELayer(self.hidden, name='se')(out)
        out = act(out)
        out = nn.Conv(self.oup, (1, 1), use_bias=False, name='pw_linear')(out)
        out = make_bn(self.oup, self.frozen_bn, 'pw_linear_bn')(out)
        return x + out if identity else out


# k, t (expansion), c, SE, HS, s  (MobileNetV3-Large)
_CFGS = [
    (3, 1, 16, 0, 0, 1),
    (3, 4, 24, 0, 0, 2),
    (3, 3, 24, 0, 0, 1),
    (5, 3, 40, 1, 0, 2),
    (5, 3, 40, 1, 0, 1),
    (5, 3, 40, 1, 0, 1),
    (3, 6, 80, 0, 1, 2),
    (3, 2.5, 80, 0, 1, 1),
    (3, 2.3, 80, 0, 1, 1),
    (3, 2.3, 80, 0, 1, 1),
    (3, 6, 112, 1, 1, 1),
    (3, 6, 112, 1, 1, 1),
    (5, 6, 160, 1, 1, 2),
    (5, 6, 160, 1, 1, 1),
    (5, 6, 160, 1, 1, 1),
]


class MobileNetV3Encoder(nn.Module):
    output_stride: int = 16
    width_mult: float = 1.0
    frozen_bn: bool = True

    @nn.compact
    def __call__(self, x):
        input_channel = _make_divisible(16 * self.width_mult)
        x = S2DConv(input_channel, (3, 3), strides=2, padding=1,
                    use_bias=False, name='stem')(x)
        x = make_bn(input_channel, self.frozen_bn, 'stem_bn')(x)
        x = h_swish(x)

        feats = []
        current_stride, rate = 2, 1
        for idx, (k, t, c, use_se, use_hs, s) in enumerate(_CFGS):
            if current_stride == self.output_stride:
                stride, dilation = 1, rate
                rate *= s
            else:
                stride, dilation = s, 1
                current_stride *= s
            out_ch = _make_divisible(c * self.width_mult)
            hidden = _make_divisible(input_channel * t)
            x = MBV3Block(input_channel, hidden, out_ch, k, stride, dilation,
                          bool(use_se), bool(use_hs),
                          frozen_bn=self.frozen_bn, name=f'block_{idx}')(x)
            input_channel = out_ch
            feats.append(x)

        last = nn.Conv(_make_divisible(input_channel * 6), (1, 1),
                       use_bias=False, name='last_conv')(x)
        last = make_bn(last.shape[-1], self.frozen_bn, 'last_bn')(last)
        last = h_swish(last)
        # 4x after block 2, 8x after block 5, 16x after block 11, final
        return [feats[2], feats[5], feats[11], last]
