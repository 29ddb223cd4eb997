"""ConvGRU memory compression (optional RMem `GRU_MEMORY` path).

Reference: aot_plus/networks/layers/transformer.py:35-118. The evicted memory
slot is folded into slot 1 through a small convolutional GRU; the hidden state
is part of the engine state pytree.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rmem_ocu_tpu.ops.layers import tokens_from_2d, tokens_to_2d


class ConvGRUCell(nn.Module):
    hidden_dim: int
    kernel_size: Tuple[int, int] = (2, 2)

    @nn.compact
    def __call__(self, x2d, h2d):
        """x2d, h2d: [B, H, W, C] -> next hidden [B, H, W, C]."""
        combined = jnp.concatenate([x2d, h2d], axis=-1)
        gates = nn.Conv(2 * self.hidden_dim, self.kernel_size,
                        padding='SAME', name='conv_gates')(combined)
        gamma, beta = jnp.split(gates, 2, axis=-1)
        reset = jax.nn.sigmoid(gamma)
        update = jax.nn.sigmoid(beta)
        cand = nn.Conv(self.hidden_dim, self.kernel_size, padding='SAME',
                       name='conv_can')(
            jnp.concatenate([x2d, reset * h2d], axis=-1))
        cand = jnp.tanh(cand)
        return (1.0 - update) * h2d + update * cand


class ConvGRUCellOutput(nn.Module):
    dim: int
    kernel_size: Tuple[int, int] = (2, 2)

    @nn.compact
    def __call__(self, x_tokens, h_tokens, size_2d):
        """x, h: [B, HW, C] -> (next hidden tokens, output tokens)."""
        x2d = tokens_to_2d(x_tokens, size_2d)
        h2d = tokens_to_2d(h_tokens, size_2d)
        h_next = ConvGRUCell(self.dim, self.kernel_size,
                             name='conv_gru_cell')(x2d, h2d)
        out = nn.Conv(self.dim, (1, 1), name='output_conv')(h_next)
        return tokens_from_2d(h_next), tokens_from_2d(out)
