"""Primitive layers (norms, conv blocks, drop-path).

Token layout is [B, HW, C] (batch-major for TPU) and images are NHWC, unlike
the reference's [L, B, C] / NCHW (aot_plus/networks/layers/basic.py).
All norm epsilons are pinned to torch's 1e-5 for fp32 parity.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

EPS = 1e-5


def tokens_to_2d(x, size_2d: Tuple[int, int]):
    """[B, HW, C] -> [B, H, W, C]."""
    b, hw, c = x.shape
    h, w = size_2d
    return x.reshape(b, h, w, c)


def tokens_from_2d(x):
    """[B, H, W, C] -> [B, HW, C]."""
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)


class GroupNorm1D(nn.Module):
    """GroupNorm over token channels (reference: basic.py:6-12)."""
    dim: int
    groups: int = 8

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=self.groups, epsilon=EPS,
                            name='gn')(x)


class ConvGN(nn.Module):
    """Conv2d + GroupNorm(8) (reference: basic.py:60-70). NHWC."""
    out_dim: int
    kernel_size: int
    gn_groups: int = 8

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_dim, (self.kernel_size, self.kernel_size),
                    padding=self.kernel_size // 2, name='conv')(x)
        return nn.GroupNorm(num_groups=self.gn_groups, epsilon=EPS,
                            name='gn')(x)


class GNActDWConv2d(nn.Module):
    """GroupNorm(32) -> GELU -> depthwise 5x5 conv, on tokens.

    Reference: basic.py:15-35. The FFN activation of LSTT blocks.
    """
    dim: int
    gn_groups: int = 32

    @nn.compact
    def __call__(self, x, size_2d):
        x2d = tokens_to_2d(x, size_2d)
        x2d = nn.GroupNorm(num_groups=self.gn_groups, epsilon=EPS,
                           name='gn')(x2d)
        # exact erf-GELU (reference nn.GELU) on f32 for bit-parity;
        # tanh-GELU on bf16 — approximation error ~1e-3 relative, an
        # order of magnitude under bf16 rounding, while XLA expands the
        # exact erf into the largest elementwise graphs of the frame
        # (round-5 SwinB census: +13% fps from this swap alone)
        x2d = jax.nn.gelu(x2d, approximate=(x2d.dtype == jnp.bfloat16))
        x2d = nn.Conv(self.dim, (5, 5), padding=2,
                      feature_group_count=self.dim, use_bias=False,
                      name='conv')(x2d)
        return tokens_from_2d(x2d)


class DWConv2d(nn.Module):
    """Depthwise 5x5 conv on tokens + dropout (reference: basic.py:38-57)."""
    dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, size_2d, deterministic: bool = True):
        x2d = tokens_to_2d(x, size_2d)
        x2d = nn.Conv(self.dim, (5, 5), padding=2,
                      feature_group_count=self.dim, use_bias=False,
                      name='conv')(x2d)
        x = tokens_from_2d(x2d)
        if self.dropout > 0.0 and not deterministic:
            # torch Dropout2d drops whole channels
            keep = 1.0 - self.dropout
            rng = self.make_rng('dropout')
            mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, x.shape[2]))
            x = x * mask / keep
        return x


def max_pool_3x3_s2(x):
    """3x3 / stride-2 / pad-1 max pool (NHWC) as separable slice-max.

    `nn.max_pool` lowers to one reduce-window kernel that runs ~25x off
    HBM bandwidth on v5e (~80 us for the R50 stem's [89,157,64] grid);
    three shifted strided slices + two maximums per axis express the
    identical max as elementwise ops that fuse with their neighbours.
    Bit-identical to the reference's nn.MaxPool2d(3, 2, 1): same window
    extents, -inf padding."""
    h, w = x.shape[1], x.shape[2]
    ho, wo = (h - 1) // 2 + 1, (w - 1) // 2 + 1

    def axis_max(a, axis: int, out: int):
        sl = lambda k: jax.lax.slice_in_dim(a, k, k + 2 * (out - 1) + 1,
                                            stride=2, axis=axis)
        return jnp.maximum(jnp.maximum(sl(0), sl(1)), sl(2))

    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)),
                 constant_values=-jnp.inf)
    x = axis_max(xp, 1, ho)
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)),
                 constant_values=-jnp.inf)
    return axis_max(xp, 2, wo)


def drop_path(x, rate: float, deterministic: bool, rng=None):
    """Stochastic depth over the batch axis (reference: basic.py:98-117,
    batch_dim=1 there because of [L,B,C]; batch is axis 0 here)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return x * mask / keep


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        return drop_path(x, self.rate, False, self.make_rng('droppath'))


def frozen_bn_scale_bias(weight, bias, running_mean, running_var,
                         epsilon: float = EPS):
    """Fold frozen-BN stats into (scale, bias) (reference:
    networks/layers/normalization.py:6-28)."""
    scale = weight * jax.lax.rsqrt(running_var + epsilon)
    return scale, bias - running_mean * scale


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics and affine params.

    Parameters live in the 'params' collection (so the torch converter can
    fill them) but are excluded from weight decay / treated as constants by
    the trainer's param filter.
    """
    dim: int
    epsilon: float = EPS

    @nn.compact
    def __call__(self, x):
        weight = self.param('weight', nn.initializers.ones, (self.dim,))
        bias = self.param('bias', nn.initializers.zeros, (self.dim,))
        mean = self.param('running_mean', nn.initializers.zeros, (self.dim,))
        # reference initializes running_var to 1 - eps (normalization.py:14)
        var = self.param('running_var',
                         lambda k, s: jnp.full(s, 1.0 - self.epsilon),
                         (self.dim,))
        scale, offset = frozen_bn_scale_bias(
            jax.lax.stop_gradient(weight), jax.lax.stop_gradient(bias),
            jax.lax.stop_gradient(mean), jax.lax.stop_gradient(var),
            self.epsilon)
        return x * scale.astype(x.dtype) + offset.astype(x.dtype)


class BatchNorm(nn.Module):
    """Trainable BatchNorm, torch-faithful (used when freeze_bn=False).

    Semantics match torch.nn.BatchNorm2d exactly: in training the batch is
    normalized with its own *biased* variance while the running variance is
    updated with the *unbiased* one at momentum 0.1; in eval the running
    stats are used. Training mode is detected from the apply call — pass
    mutable=['batch_stats'] to train. Leaf names mirror FrozenBatchNorm
    (weight/bias + running_mean/running_var) so the torch converter and the
    optimizer's buffer-freeze rule apply unchanged; the running stats live
    in the 'batch_stats' collection. Under a sharded batch the mean/var
    reductions are global (GSPMD inserts the collectives), which is the
    reference's SyncBatchNorm (trainer.py:104-105) for free.
    """
    dim: int
    epsilon: float = EPS
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x):
        weight = self.param('weight', nn.initializers.ones, (self.dim,))
        bias = self.param('bias', nn.initializers.zeros, (self.dim,))
        ra_mean = self.variable('batch_stats', 'running_mean',
                                lambda: jnp.zeros((self.dim,)))
        ra_var = self.variable('batch_stats', 'running_var',
                               lambda: jnp.ones((self.dim,)))
        # is_mutable_collection is also true during Module.init (flax makes
        # every collection mutable there); without the is_initializing
        # guard a from-scratch init would contaminate the fresh (0, 1)
        # buffers with the init batch's statistics
        training = (self.is_mutable_collection('batch_stats')
                    and not self.is_initializing())
        if training:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf - mean), axes)
            n = x.size / self.dim
            m = self.momentum
            ra_mean.value = (1 - m) * ra_mean.value + m * mean
            ra_var.value = ((1 - m) * ra_var.value
                            + m * var * n / jnp.maximum(n - 1, 1))
        else:
            mean, var = ra_mean.value, ra_var.value
        scale = weight * jax.lax.rsqrt(var + self.epsilon)
        offset = bias - mean * scale
        return x * scale.astype(x.dtype) + offset.astype(x.dtype)


def make_bn(dim: int, frozen: bool, name: str):
    """Encoder BN factory (reference build_encoder picks FrozenBatchNorm2d
    vs BatchNorm2d, encoders/__init__.py:10-37)."""
    return (FrozenBatchNorm(dim, name=name) if frozen
            else BatchNorm(dim, name=name))
