"""Space-to-depth convolution for few-channel strided stems.

A stride-s conv on a 3- or 12-channel input (ResNet conv1 7x7/s2, the
patch-wise id bank 17x17/s16, MobileNet/ResNeSt 3x3/s2 stems, Swin's
4x4/s4 patch embed) maps terribly onto the MXU: the systolic array wants
>=8 input channels per tap and the strided window forces XLA into a
padded [H, B, blk, W', C] data-formatting layout (measured on v5e:
conv1 runs at 3.8 TF/s and its input copy alone costs ~100 us/frame —
~13% of the whole 480p frame step; the id-bank conv is another ~18%).

The fix is the standard TPU space-to-depth transform: fold each s x s
pixel block into channels, and run an equivalent UNstrided conv whose
kernel is the original weights scattered into [Kb, Kb, s*s*cin, cout].
The arithmetic is identical (same multiply-adds, re-indexed), so this is
a drop-in replacement: `S2DConv` exposes the exact `nn.Conv` parameter
pytree (kernel [kh, kw, cin, cout], optional bias), keeping checkpoints
and the torch weight converter unchanged.

Derivation of the index mapping (rows; columns are symmetric):

    y[oy] = sum_dy W[dy] . x[s*oy + dy - p]          dy in [0, kh)

With blocks X[by, i] = x[s*by + i] (i in [0, s)) the pixel row
s*oy + dy - p lands in block by = oy + t - pb, inner i, where
t = (dy + pb*s - p) // s in [0, Kb) and i = (dy + pb*s - p) % s, with
pb = ceil(p/s) and Kb = (kh - 1 - p)//s + pb + 1 block taps. So W
scattered at offset a = pb*s - p inside a [Kb*s, Kb*s] zero kernel,
regrouped to [Kb, Kb, (i, j, cin)], gives an exact stride-1 conv over
the block grid padded by pb (zero blocks = zero pixels, matching conv
zero padding).

Reference being replaced: plain torch Conv2d stems
(aot_plus/networks/encoders/resnet.py:77-79, aot_plus/networks/models/
aot.py:64-83); cuDNN handles those shapes natively, the MXU does not.
"""
from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

# s2d layout-shuffle strategy (see space_to_depth): 'slice' avoids the 6-D
# reshape+transpose that XLA materializes as two tiny-tile layout copies
# (~11 GB/s effective on v5e — profiled at ~20% of the 480p frame step);
# 'reshape' is the classic formulation, kept for A/B and as a fallback.
_S2D_VARIANT = os.environ.get('RMEM_S2D', 'slice')


def space_to_depth(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, ceil(H/b), ceil(W/b), b*b*C], zero-padded at the
    bottom/right edges; channel order (i, j, c) over the b x b block."""
    b = block
    B, H, W, C = x.shape
    hb, wb = -(-H // b), -(-W // b)
    if (hb * b, wb * b) != (H, W):
        x = jnp.pad(x, ((0, 0), (0, hb * b - H), (0, wb * b - W), (0, 0)))
    if _S2D_VARIANT == 'reshape':
        x = x.reshape(B, hb, b, wb, b, C)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(B, hb, wb, b * b * C)
    # 'slice': the W-axis block split is FREE in row-major layout ((W, C)
    # minor dims merge to (wb, b*C), channel order (j, c)); only the H axis
    # needs data movement, done as b sublane-strided decimation slices whose
    # channel concat lands exactly in (i, j, c) order: i*(b*C) + j*C + c.
    x = x.reshape(B, hb * b, wb, b * C)
    return jnp.concatenate([x[:, i::b] for i in range(b)], axis=-1)


def space_to_depth_label(label: jnp.ndarray, block: int, n_ch: int,
                         dtype=jnp.float32) -> jnp.ndarray:
    """space_to_depth(one_hot(label, n_ch), block) computed by shuffling the
    SMALL integer label map first and one-hot-encoding directly into block
    layout: [B, H, W] int -> [B, ceil(H/b), ceil(W/b), b*b*n_ch].

    Exact per construction: out[b, y, x, (i*blk + j)*n_ch + c]
    = (label[b, blk*y + i, blk*x + j] == c), with out-of-image padding an
    out-of-range label (all-zero channels, matching the zero padding of
    space_to_depth on a one-hot input). Moves ~b*b*n_ch/4 x less data than
    transposing the one-hot (profiled: the id-bank 16x shuffle drops from
    ~250 us to the cost of an int transpose at 480p)."""
    b = block
    if label.ndim == 4:
        label = label[..., 0]
    label = label.astype(jnp.int32)
    B, H, W = label.shape
    hb, wb = -(-H // b), -(-W // b)
    if (hb * b, wb * b) != (H, W):
        label = jnp.pad(label, ((0, 0), (0, hb * b - H), (0, wb * b - W)),
                        constant_values=-1)
    m = label.reshape(B, hb, b, wb, b)
    m = m.transpose(0, 1, 3, 2, 4).reshape(B, hb, wb, b * b)
    ids = jnp.arange(n_ch, dtype=jnp.int32)
    oh = (m[..., None] == ids).astype(dtype)
    return oh.reshape(B, hb, wb, b * b * n_ch)


def s2d_conv_kernel(kernel: jnp.ndarray, stride: int,
                    padding: int) -> Tuple[jnp.ndarray, int]:
    """Scatter a [kh, kw, cin, cout] conv kernel into its space-to-depth
    equivalent [Kb, Kb, s*s*cin, cout]. Returns (kernel', pb) where pb is
    the block-space padding. Traced (cheap: runs once per jit)."""
    kh, kw, cin, cout = kernel.shape
    s = stride
    pb = -(-padding // s)
    a = pb * s - padding
    kb_h = (kh - 1 - padding) // s + pb + 1
    kb_w = (kw - 1 - padding) // s + pb + 1
    w = jnp.pad(kernel, ((a, kb_h * s - kh - a), (a, kb_w * s - kw - a),
                         (0, 0), (0, 0)))
    w = w.reshape(kb_h, s, kb_w, s, cin, cout)
    w = w.transpose(0, 2, 1, 3, 4, 5)
    return w.reshape(kb_h, kb_w, s * s * cin, cout), pb


def s2d_conv(x: jnp.ndarray, kernel: jnp.ndarray, stride: int,
             padding: int,
             pre_s2d: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
    """Exact equivalent of lax.conv(x, kernel, stride, pad) (NHWC/HWIO)
    computed as an unstrided conv over the space-to-depth block grid.

    With pre_s2d=(H, W), x is ALREADY in block layout [B, ceil(H/s),
    ceil(W/s), s*s*cin] (e.g. from space_to_depth_label) and (H, W) are the
    ORIGINAL pixel dims (they set the conv output size exactly like the
    strided conv on the unpadded input would)."""
    kh, kw, cin, cout = kernel.shape
    s = stride
    if pre_s2d:
        B = x.shape[0]
        H, W = pre_s2d
        assert x.shape[1:3] == (-(-H // s), -(-W // s)), (
            f'pre_s2d block grid {x.shape[1:3]} does not match '
            f'ceil({(H, W)}/{s})')
    else:
        B, H, W, _ = x.shape
    out_h = (H + 2 * padding - kh) // s + 1
    out_w = (W + 2 * padding - kw) // s + 1
    # promote to the common dtype like nn.Conv(dtype=None): fp32 params with
    # bf16 activations must compute (and return) fp32, not downcast the
    # kernel to bf16
    dt = jnp.promote_types(x.dtype, kernel.dtype)
    xb = x.astype(dt) if pre_s2d is not None else space_to_depth(
        x.astype(dt), s)
    wb, pb = s2d_conv_kernel(kernel.astype(dt), s, padding)
    kb_h, kb_w = wb.shape[:2]
    # asymmetric (possibly negative) padding so block-conv output size
    # matches the strided conv exactly
    pad_h = (pb, out_h + kb_h - 1 - xb.shape[1] - pb)
    pad_w = (pb, out_w + kb_w - 1 - xb.shape[2] - pb)
    return lax.conv_general_dilated(
        xb, wb, window_strides=(1, 1), padding=(pad_h, pad_w),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class S2DConv(nn.Module):
    """Drop-in for `nn.Conv(features, (kh, kw), strides=s, padding=p)` on
    few-channel inputs, same parameter pytree ('kernel' [kh, kw, cin,
    features] and optional 'bias'), computed via space-to-depth."""
    features: int
    kernel_size: Union[int, Tuple[int, int]]
    strides: int = 1
    padding: int = 0
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x, pre_s2d: Optional[Tuple[int, int]] = None):
        """pre_s2d=(H, W): x is already the block-layout
        [B, ceil(H/s), ceil(W/s), s*s*cin] (see s2d_conv)."""
        k = self.kernel_size
        kh, kw = (k, k) if isinstance(k, int) else k
        assert self.strides > 1, 'S2DConv only pays off for strided stems'
        cin = (x.shape[-1] // self.strides ** 2 if pre_s2d is not None
               else x.shape[-1])
        kernel = self.param('kernel', self.kernel_init,
                            (kh, kw, cin, self.features))
        y = s2d_conv(x, kernel, self.strides, self.padding, pre_s2d=pre_s2d)
        if self.use_bias:
            bias = self.param('bias', self.bias_init, (self.features,))
            y = y + bias.astype(y.dtype)
        return y
