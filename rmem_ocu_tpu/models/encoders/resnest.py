"""ResNeSt-50/101 backbone (split-attention), output-stride 16.

Reference: aot_plus/networks/encoders/resnest/{resnest,resnet,splat}.py —
deep stem, avg-down downsampling, radix-2 split attention (SplAtConv2d),
avd 3x3 average pooling in strided blocks; layer4 dropped and the
stride-16 config is `dilation=2` (encoders/__init__.py:26-33).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rmem_ocu_tpu.ops.layers import make_bn, max_pool_3x3_s2
from rmem_ocu_tpu.ops.s2d import S2DConv


class SplAtConv2d(nn.Module):
    """Split-attention conv (reference splat.py:15-132)."""
    channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    radix: int = 2
    reduction_factor: int = 4
    frozen_bn: bool = True

    @nn.compact
    def __call__(self, x):
        r, g = self.radix, self.groups
        inter = max(self.channels * r // self.reduction_factor, 32)
        pad = self.dilation * (self.kernel_size - 1) // 2
        x = nn.Conv(self.channels * r,
                    (self.kernel_size, self.kernel_size),
                    strides=self.stride, padding=pad,
                    kernel_dilation=self.dilation,
                    feature_group_count=g * r, use_bias=False,
                    name='conv')(x)
        x = make_bn(self.channels * r, self.frozen_bn, 'bn0')(x)
        x = nn.relu(x)

        b = x.shape[0]
        splited = jnp.split(x, r, axis=-1)
        gap = sum(splited)
        gap = jnp.mean(gap, axis=(1, 2), keepdims=True)
        gap = nn.Conv(inter, (1, 1), feature_group_count=g,
                      name='fc1')(gap)
        gap = make_bn(inter, self.frozen_bn, 'bn1')(gap)
        gap = nn.relu(gap)
        atten = nn.Conv(self.channels * r, (1, 1), feature_group_count=g,
                        name='fc2')(gap)
        # rSoftMax (reference splat.py:117-132): softmax over radix per
        # cardinal group
        a = atten.reshape(b, 1, 1, g, r, self.channels // g)
        a = jax.nn.softmax(a, axis=4)
        a = a.reshape(b, 1, 1, r * self.channels)
        attens = jnp.split(a, r, axis=-1)
        return sum(at * sp for at, sp in zip(attens, splited))


def _avg_pool_ceil(x, k: int):
    """AvgPool2d(k, k, ceil_mode=True, count_include_pad=False): sum-pool
    with right/bottom padding, divided by the per-window valid count."""
    h, w = x.shape[1], x.shape[2]
    ph, pw = (-h) % k, (-w) % k
    pad = ((0, 0), (0, ph), (0, pw), (0, 0))
    win, strides = (1, k, k, 1), (1, k, k, 1)
    s = jax.lax.reduce_window(x, jnp.zeros((), x.dtype), jax.lax.add,
                              win, strides, pad)
    ones = jnp.ones((1, h, w, 1), x.dtype)
    cnt = jax.lax.reduce_window(ones, jnp.zeros((), x.dtype), jax.lax.add,
                                win, strides, pad)
    return s / cnt


class ResNeStBottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    radix: int = 2
    avd: bool = False
    has_downsample: bool = False
    avg_down: bool = True
    frozen_bn: bool = True

    @nn.compact
    def __call__(self, x):
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name='conv1')(x)
        out = make_bn(self.planes, self.frozen_bn, 'bn1')(out)
        out = nn.relu(out)

        conv2_stride = 1 if self.avd else self.stride
        out = SplAtConv2d(self.planes, 3, conv2_stride, self.dilation,
                          radix=self.radix, frozen_bn=self.frozen_bn,
                          name='conv2')(out)
        if self.avd:
            out = nn.avg_pool(out, (3, 3), strides=(self.stride,) * 2,
                              padding=((1, 1), (1, 1)))

        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      name='conv3')(out)
        out = make_bn(self.planes * 4, self.frozen_bn, 'bn3')(out)

        if self.has_downsample:
            res = x
            if self.avg_down and self.stride > 1:
                # reference uses AvgPool2d(stride, stride, ceil_mode=True,
                # count_include_pad=False) (resnest/resnet.py:332-336):
                # odd inputs gain a partial tail window averaged over its
                # valid elements only
                res = _avg_pool_ceil(res, self.stride)
            res = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                          name='downsample_conv')(res)
            residual = make_bn(self.planes * 4, self.frozen_bn,
                               'downsample_bn')(res)
        return nn.relu(out + residual)


class ResNeStEncoder(nn.Module):
    layers: Tuple[int, int, int] = (3, 4, 6)    # resnest50; 101 = (3,4,23)
    stem_width: int = 32                         # 64 for resnest101
    frozen_bn: bool = True

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] -> [4x(256), 8x(512), 16x(1024), 16x(1024)]."""
        sw = self.stem_width if self.layers[2] == 6 else 64
        # deep stem (reference resnet.py:232-252)
        x = S2DConv(sw, (3, 3), strides=2, padding=1, use_bias=False,
                    name='stem_conv1')(x)
        x = make_bn(sw, self.frozen_bn, 'stem_bn1')(x)
        x = nn.relu(x)
        x = nn.Conv(sw, (3, 3), padding=1, use_bias=False,
                    name='stem_conv2')(x)
        x = make_bn(sw, self.frozen_bn, 'stem_bn2')(x)
        x = nn.relu(x)
        x = nn.Conv(sw * 2, (3, 3), padding=1, use_bias=False,
                    name='stem_conv3')(x)
        x = make_bn(sw * 2, self.frozen_bn, 'stem_bn3')(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        xs = []
        inplanes = sw * 2
        strides = (1, 2, 2)
        for stage_idx, (planes, blocks) in enumerate(
                zip((64, 128, 256), self.layers)):
            stride = strides[stage_idx]
            is_first = stage_idx > 0
            for block_idx in range(blocks):
                first = block_idx == 0
                x = ResNeStBottleneck(
                    planes,
                    stride=stride if first else 1,
                    avd=first and (stride > 1 or is_first),
                    has_downsample=first and (
                        stride != 1 or inplanes != planes * 4),
                    frozen_bn=self.frozen_bn,
                    name=f'layer{stage_idx + 1}_{block_idx}')(x)
                inplanes = planes * 4
            xs.append(x)
        xs.append(xs[-1])
        return xs
