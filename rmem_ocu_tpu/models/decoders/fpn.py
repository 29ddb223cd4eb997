"""FPN segmentation head (reference: aot_plus/networks/decoders/fpn.py:7-73).

NHWC; bilinear upsampling matches torch's align_corners semantics exactly
(ops/resize.py).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from rmem_ocu_tpu.ops.layers import ConvGN
from rmem_ocu_tpu.ops.resize import interpolate_bilinear


class FPNSegmentationHead(nn.Module):
    out_dim: int
    hidden_dim: int = 256
    decode_intermediate_input: bool = True
    align_corners: bool = True

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray],
                 shortcuts: Sequence[jnp.ndarray]):
        """inputs: list of [B, H16, W16, C] decoder inputs (the 16x encoder
        feature + per-layer LSTT outputs); shortcuts: encoder features
        [4x, 8x, 16x, 16x]. Returns logits [B, H4, W4, out_dim]."""
        if self.decode_intermediate_input:
            x = jnp.concatenate(inputs, axis=-1)
        else:
            x = inputs[-1]

        x = nn.relu(ConvGN(self.hidden_dim, 1, name='conv_in')(x))
        s16 = nn.Conv(self.hidden_dim, (1, 1), name='adapter_16x')(
            shortcuts[-2])
        x = nn.relu(ConvGN(self.hidden_dim, 3, name='conv_16x')(s16 + x))

        x = interpolate_bilinear(x, shortcuts[-3].shape[1:3],
                                 self.align_corners)
        s8 = nn.Conv(self.hidden_dim, (1, 1), name='adapter_8x')(
            shortcuts[-3])
        x = nn.relu(ConvGN(self.hidden_dim // 2, 3, name='conv_8x')(s8 + x))

        x = interpolate_bilinear(x, shortcuts[-4].shape[1:3],
                                 self.align_corners)
        s4 = nn.Conv(self.hidden_dim // 2, (1, 1), name='adapter_4x')(
            shortcuts[-4])
        x = nn.relu(ConvGN(self.hidden_dim // 2, 3, name='conv_4x')(s4 + x))

        return nn.Conv(self.out_dim, (1, 1), name='conv_out')(x)
