"""Swin Transformer (Swin-B) backbone, windows of 7, out strides 4/8/16.

Reference: aot_plus/networks/encoders/swin/swin_transformer.py:1-716 and
swin/build.py:11-27 (embed 128, depths [2,2,18,2], heads [4,8,16,32]).
Only stages 0-2 are instantiated — the reference computes stage 3 but its
output is discarded (out_indices=(0,1,2), swin_transformer.py:688-700), so
we skip that compute entirely.
"""
from __future__ import annotations

import functools
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rmem_ocu_tpu.ops.layers import EPS
from rmem_ocu_tpu.ops.s2d import S2DConv


@functools.lru_cache(maxsize=32)
def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing='ij'))       # [2, ws, ws]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]            # [2, N, N]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1).astype(np.int32)                 # [N, N]


@functools.lru_cache(maxsize=64)
def _shifted_window_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """[nW, N, N] additive mask for shifted-window attention
    (reference swin_transformer.py:262-283)."""
    img = np.zeros((hp, wp))
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[h, w] = cnt
            cnt += 1
    win = img.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        """x: [B_, N, C]; mask: [nW, N, N] or None."""
        from rmem_ocu_tpu.ops.attention import (_maybe_compact_logits,
                                                _qk_out_dtype)
        b, n, c = x.shape
        ws = self.window_size
        head_dim = self.dim // self.num_heads
        # packed qkv Dense (weights match the reference's single qkv
        # Linear), but split along features and keep tokens in the minor
        # layout: the torch-style [B_, N, 3, H, D] reshape + per-tensor
        # transpose cost 0.13 ms/block of pure layout copies at stage-0
        # eval shapes (round-4 census); head-split einsums let XLA fold
        # the head axis into the dots instead.
        qkv = nn.Dense(self.dim * 3, name='qkv')(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, self.num_heads, head_dim)
        k = k.reshape(b, n, self.num_heads, head_dim)
        v = v.reshape(b, n, self.num_heads, head_dim)
        logits = jnp.einsum('bqhd,bkhd->bhqk', q * head_dim ** -0.5, k,
                            preferred_element_type=_qk_out_dtype(x.dtype))
        rpb_table = self.param(
            'relative_position_bias_table',
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads))
        idx = jnp.asarray(_relative_position_index(ws))
        bias = rpb_table[idx.reshape(-1)].reshape(n, n, self.num_heads)
        extra = bias.transpose(2, 0, 1)[None]
        if mask is not None:
            n_w = mask.shape[0]
            # [nW, N, N] window mask + [1, H, N, N] bias -> [nW, H, N, N]
            extra = extra + mask[:, None]
        logits = (logits.reshape(b // extra.shape[0], extra.shape[0],
                                 self.num_heads, n, n)
                  + extra[None].astype(logits.dtype)).reshape(
                      b, self.num_heads, n, n)
        logits = _maybe_compact_logits(logits, x.dtype)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        probs = _maybe_compact_logits(probs, x.dtype)
        out = jnp.einsum('bhqk,bkhd->bqhd', probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        return nn.Dense(self.dim, name='proj')(out.reshape(b, n, c))


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, h: int, w: int):
        """x: [B, H*W, C]."""
        ws = self.window_size
        b, _, c = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=EPS, name='norm1')(x)
        x = x.reshape(b, h, w, c)
        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        shift = self.shift_size
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shifted_window_mask(hp, wp, ws, shift))
        else:
            mask = None

        # window partition
        x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
        x = WindowAttention(self.dim, ws, self.num_heads, name='attn')(
            x, mask)
        # window reverse
        x = x.reshape(b, hp // ws, wp // ws, ws, ws, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :h, :w].reshape(b, h * w, c)

        x = shortcut + x
        y = nn.LayerNorm(epsilon=EPS, name='norm2')(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name='mlp_fc1')(y)
        # exact erf-GELU (reference nn.GELU) on f32; tanh-GELU on the bf16
        # eval path — its ~1e-3 relative error is an order of magnitude
        # below bf16 rounding, and the round-5 census shows the encoder's
        # MLP dot fusions (with the transcendental fused in) are the
        # largest SwinB frame terms (stage2 mlp 0.72 ms/frame)
        y = jax.nn.gelu(y, approximate=(y.dtype == jnp.bfloat16))
        y = nn.Dense(self.dim, name='mlp_fc2')(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, h: int, w: int):
        b, _, c = x.shape
        x = x.reshape(b, h, w, c)
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = x.reshape(b, -1, 4 * c)
        x = nn.LayerNorm(epsilon=EPS, name='norm')(x)
        return nn.Dense(2 * self.dim, use_bias=False, name='reduction')(x)


class SwinEncoder(nn.Module):
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18)
    num_heads: Tuple[int, ...] = (4, 8, 16)
    window_size: int = 7
    patch_size: int = 4

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] -> [4x(128), 8x(256), 16x(512), 16x(512)]."""
        b = x.shape[0]
        p = self.patch_size
        pad_b = (p - x.shape[1] % p) % p
        pad_r = (p - x.shape[2] % p) % p
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x = S2DConv(self.embed_dim, (p, p), strides=p,
                    name='patch_embed')(x)
        h, w = x.shape[1], x.shape[2]
        x = x.reshape(b, h * w, self.embed_dim)
        x = nn.LayerNorm(epsilon=EPS, name='patch_norm')(x)

        outs = []
        for stage, (depth, heads) in enumerate(zip(self.depths,
                                                   self.num_heads)):
            dim = self.embed_dim * (2 ** stage)
            for i in range(depth):
                x = SwinBlock(dim, heads, self.window_size,
                              shift_size=0 if i % 2 == 0
                              else self.window_size // 2,
                              name=f'stage{stage}_block{i}')(x, h, w)
            out = nn.LayerNorm(epsilon=EPS, name=f'out_norm{stage}')(x)
            outs.append(out.reshape(b, h, w, dim))
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim, name=f'downsample{stage}')(x, h, w)
                h, w = (h + 1) // 2, (w + 1) // 2
        outs.append(outs[-1])
        return outs
