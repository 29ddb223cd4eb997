"""ResNet-50 TopDown: two-pass encoder with transposed-conv feedback.

Reference: aot_plus/networks/encoders/resnet.py:216-356 (experimental
`r50_topdown_aotl` config). First pass computes features, a prompt-similarity
mask modulates the 16x feature, feedback decoders produce per-stage top-down
signals, and a second pass re-encodes with them. The per-stage reconstruction
MSE ("var loss", :345-356) is emitted through flax's `sow` into the 'losses'
collection; the trainer adds it scaled by var_loss_weight
(reference engines/aot_engine.py:115-118).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rmem_ocu_tpu.models.encoders.resnet import Bottleneck
from rmem_ocu_tpu.ops.layers import make_bn, max_pool_3x3_s2
from rmem_ocu_tpu.ops.s2d import S2DConv
from rmem_ocu_tpu.ops.resize import interpolate_bilinear


class DecodeBlock(nn.Module):
    """ConvTranspose + 1x1 conv (reference resnet.py:216-238)."""
    out_chans: int
    kernel_size: int
    stride: int
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        # torch ConvTranspose2d(k, s, p): out = (in-1)*s - 2p + k
        k, s, p = self.kernel_size, self.stride, self.padding
        # symmetric (k-1-p) padding reproduces torch ConvTranspose2d
        # shapes and values exactly (verified vs torch)
        x = nn.ConvTranspose(self.out_chans, (k, k), strides=(s, s),
                             padding=[(k - 1 - p, k - 1 - p)] * 2,
                             transpose_kernel=True, use_bias=False,
                             name='linear')(x)
        out = nn.Conv(self.out_chans, (1, 1), use_bias=False,
                      name='linear2')(x)
        return x, out


class ResNetTopDownEncoder(nn.Module):
    layers: Tuple[int, int, int] = (3, 4, 6)
    use_mask: bool = False
    frozen_bn: bool = True

    def setup(self):
        self.stem_conv = S2DConv(64, (7, 7), strides=2, padding=3,
                                 use_bias=False, name='conv1')
        self.stem_bn = make_bn(64, self.frozen_bn, 'bn1')
        blocks = []
        strides = (1, 2, 2)
        inplanes = 64
        for stage_idx, (planes, n) in enumerate(zip((64, 128, 256),
                                                    self.layers)):
            stage = []
            for i in range(n):
                first = i == 0
                stride = strides[stage_idx] if first else 1
                stage.append(Bottleneck(
                    planes, stride=stride, dilation=1,
                    has_downsample=first and (stride != 1
                                              or inplanes != planes * 4),
                    frozen_bn=self.frozen_bn,
                    name=f'layer{stage_idx + 1}_{i}'))
                inplanes = planes * 4
            blocks.append(stage)
        self.stages = blocks

        # feedback decoders (reference :271-284)
        self.dec0_up = nn.ConvTranspose(64, (3, 3), strides=(2, 2),
                                        padding=[(1, 1)] * 2,
                                        transpose_kernel=True,
                                        name='dec0_up')          # maxpool^-1
        self.dec0 = DecodeBlock(3, kernel_size=7, stride=2, padding=3,
                                name='dec0')
        self.dec1 = DecodeBlock(64, kernel_size=3, stride=1, padding=1,
                                name='dec1')
        self.dec2 = DecodeBlock(256, kernel_size=3, stride=2, padding=1,
                                name='dec2')
        self.dec3 = DecodeBlock(512, kernel_size=3, stride=2, padding=1,
                                name='dec3')
        self.prompt = self.param('prompt', nn.initializers.normal(1.0),
                                 (1024,))
        self.top_down_transform = self.param(
            'top_down_transform', lambda k, s: jnp.eye(s[0]), (1024, 1024))

    def _stem(self, x):
        x = nn.relu(self.stem_bn(self.stem_conv(x)))
        return max_pool_3x3_s2(x)

    def _forward_features(self, x, td=None):
        in_var, out_var = [], []
        stages = [self._stem] + [
            (lambda s: lambda y: self._run_stage(s, y))(s)
            for s in self.stages]
        for i, stage in enumerate(stages):
            in_var.append(x)
            if td is not None:
                ti = td[i]
                if ti.shape[1:3] != x.shape[1:3]:
                    ti = interpolate_bilinear(ti, x.shape[1:3], False)
                x = x + ti
            x = stage(x)
            out_var.append(x)
        return x, in_var, out_var

    @staticmethod
    def _run_stage(stage, x):
        for block in stage:
            x = block(x)
        return x

    def _decode(self, depth, x):
        if depth == 0:
            y = self.dec0_up(x)
            return self.dec0(y)
        return [self.dec1, self.dec2, self.dec3][depth - 1](x)

    def _feedback(self, x):
        td = []
        for depth in (3, 2, 1, 0):
            x, out = self._decode(depth, x)
            td = [out] + td
        return td

    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        inp = x
        x, _, out_var = self._forward_features(inp)

        if self.use_mask and mask is not None:
            m = jax.lax.stop_gradient(mask).astype(x.dtype)
            m = interpolate_bilinear(m, x.shape[1:3], False)
        else:
            xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
            pn = self.prompt / (jnp.linalg.norm(self.prompt) + 1e-12)
            m = jnp.clip(jnp.einsum('bhwc,c->bhw', xn, pn)[..., None], 0, 1)
        x = x * m
        x = jnp.einsum('bhwc,cd->bhwd', x, self.top_down_transform)
        td = self._feedback(x)

        x, in_var, out_var = self._forward_features(inp, td)

        # reconstruction var-loss (reference :345-356)
        recon_loss = 0.0
        for depth in (3, 2, 1, 0):
            recon, _ = self._decode(depth,
                                    jax.lax.stop_gradient(out_var[depth]))
            target = jax.lax.stop_gradient(in_var[depth])
            if recon.shape != target.shape:
                recon = recon[:, :target.shape[1], :target.shape[2]]
            recon_loss = recon_loss + jnp.mean(
                (recon - target.astype(recon.dtype)) ** 2)
        # overwrite (not append): model.init leaves a stale init-time value
        # in the 'losses' collection that callers pass back through apply
        self.sow('losses', 'var_loss', recon_loss,
                 reduce_fn=lambda prev, new: new)

        return out_var[1:] + [out_var[-1]]
