"""Positional encodings.

- 2D sine position embedding (reference: networks/layers/position.py:35-77).
- RMem's learnable temporal PE over memory slots, interpolated to the live
  memory length (reference: networks/layers/transformer.py:594-629). The
  reference interpolates with torch F.interpolate (linear align_corners=True
  up to 4 slots, then a flip/nearest/flip upsample). Because interpolation is
  linear in the embedding, we precompute one [T_cap+1, T_cap, S] constant
  weight bank indexed by the *live* length — a single gather + tiny matmul at
  runtime, so the whole thing stays static-shape and jit-friendly.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from rmem_ocu_tpu.ops.resize import _linear_matrix, _nearest_matrix


def sine_position_embedding(h: int, w: int, num_pos_feats: int,
                            temperature: float = 10000.0,
                            normalize: bool = True,
                            scale: float = 2 * math.pi) -> jnp.ndarray:
    """Returns [1, H, W, 2*num_pos_feats] (y features then x features)."""
    grid_y, grid_x = np.meshgrid(np.arange(h, dtype=np.float32),
                                 np.arange(w, dtype=np.float32),
                                 indexing='ij')
    y_embed = grid_y[None]
    x_embed = grid_x[None]
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * np.trunc(dim_t / 2) / num_pos_feats)

    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = np.stack((np.sin(pos_x[..., 0::2]), np.cos(pos_x[..., 1::2])),
                     axis=4).reshape(1, h, w, -1)
    pos_y = np.stack((np.sin(pos_y[..., 0::2]), np.cos(pos_y[..., 1::2])),
                     axis=4).reshape(1, h, w, -1)
    pos = np.concatenate((pos_y, pos_x), axis=3)
    return jnp.asarray(pos)


@functools.lru_cache(maxsize=64)
def _temporal_pe_weight_bank(capacity: int, num_slots: int) -> np.ndarray:
    """W[T] is the [capacity, num_slots] matrix such that
    (W[T] @ mem_pos_emb)[:T] equals the reference's interpolated memory PE for
    live length T and rows >= T are zero. Index 0 = empty memory.

    Reference semantics (transformer.py:596-623), max_T = 4:
      T == 1          -> mem_pos_emb[0]
      1 < T <= slots  -> mem_pos_emb[:T]                    (identity)
      slots < T <= 4  -> linear interp slots -> T (align_corners=True)
      T > 4           -> linear interp slots -> 4, then flip, nearest -> T,
                         flip back.
    """
    max_t = 4
    bank = np.zeros((capacity + 1, capacity, num_slots), dtype=np.float32)
    flip = lambda m: m[::-1].copy()
    for t in range(1, capacity + 1):
        if t == 1:
            w = np.zeros((1, num_slots), np.float32)
            w[0, 0] = 1.0
        elif t <= num_slots:
            w = np.eye(num_slots, dtype=np.float32)[:t]
        elif t <= max_t:
            w = _linear_matrix(num_slots, t, True)
        else:
            w = _linear_matrix(num_slots, max_t, True)
            w = flip(_nearest_matrix(max_t, t) @ flip(w))
        bank[t, :t] = w
    return bank


def interpolated_memory_pe(mem_pos_emb: jnp.ndarray, live_len,
                           capacity: int) -> jnp.ndarray:
    """mem_pos_emb: [S, C]; live_len: traced int scalar in [0, capacity].
    Returns [capacity, C] with rows >= live_len zero."""
    bank = jnp.asarray(_temporal_pe_weight_bank(capacity,
                                                mem_pos_emb.shape[0]))
    w = bank[live_len]                       # [capacity, S]
    return jnp.einsum('ts,sc->tc', w, mem_pos_emb.astype(jnp.float32),
                      precision=jax.lax.Precision.HIGHEST
                      ).astype(mem_pos_emb.dtype)


def sinusoidal_temporal_encoding(max_sequence_len: int, channels: int,
                                 is_normalize: bool = False,
                                 scale: float = 2 * math.pi) -> jnp.ndarray:
    """TIME_ENCODE variant (reference: position.py:96-158).
    Returns [max_sequence_len, 1, 1, channels]."""
    position = np.arange(max_sequence_len, dtype=np.float32)
    if is_normalize:
        position = position / position[-1] * scale
    position = position[:, None]
    div_term = 1.0 / (10000.0 ** (
        np.arange(0, channels, 2, dtype=np.float32) / channels))
    ang = position * div_term
    enc = np.zeros((max_sequence_len, 1, 1, channels), dtype=np.float32)
    enc[:, 0, 0, 0::2] = np.sin(ang)
    enc[:, 0, 0, 1::2] = np.cos(ang)
    return jnp.asarray(enc)
