"""Bit-faithful (fp32) re-implementations of torch's F.interpolate modes.

The reference leans on `align_corners=True` bilinear resizes in the decoder
and logit upsampling (aot_plus/networks/decoders/fpn.py:49-60,
networks/engines/aot_engine.py:457-463) and on the odd flip/nearest trick for
temporal-PE interpolation (networks/layers/transformer.py:594-621).
`jax.image.resize` uses half-pixel conventions only, so we build explicit
separable interpolation matrices instead — these are tiny constant matmuls
that XLA maps straight onto the MXU, which on TPU is *faster* than a
gather-based resize for the sizes involved.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _linear_matrix(in_size: int, out_size: int, align_corners: bool):
    """[out_size, in_size] row-stochastic linear interpolation matrix."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros((1,), dtype=np.float64)
        else:
            src = dst * (in_size - 1) / (out_size - 1)
    else:
        src = np.clip((dst + 0.5) * in_size / out_size - 0.5, 0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = src - lo
    m[np.arange(out_size), lo] += (1.0 - w_hi).astype(np.float32)
    m[np.arange(out_size), hi] += w_hi.astype(np.float32)
    return m


@functools.lru_cache(maxsize=256)
def _nearest_matrix(in_size: int, out_size: int):
    """torch mode='nearest': src = floor(dst * in / out)."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    dst = np.arange(out_size, dtype=np.float64)
    src = np.minimum(np.floor(dst * in_size / out_size), in_size - 1)
    m[np.arange(out_size), src.astype(np.int64)] = 1.0
    return m


# interpolation must not be demoted to bf16 matmuls on TPU — these are tiny
# contractions, so HIGHEST precision is free and keeps torch parity.
_PREC = jax.lax.Precision.HIGHEST


def _apply_separable(x, mh, mw):
    # x: [..., H, W, C]; contract H then W with interp matrices.
    orig_dtype = x.dtype
    if orig_dtype == jnp.bfloat16:
        # bf16 inputs (opt-in bf16 inference): single-pass MXU matmuls on
        # bf16 operands with fp32 accumulation, instead of the multi-pass
        # HIGHEST fp32 path — the weights' bf16 rounding (~1e-3 relative)
        # is below bf16 input precision anyway. The matrices must be cast
        # explicitly: a bf16 x f32 einsum silently promotes to f32.
        x = jnp.einsum('oh,...hwc->...owc',
                       jnp.asarray(mh, jnp.bfloat16), x,
                       preferred_element_type=jnp.float32)
        x = jnp.einsum('ow,...hwc->...hoc',
                       jnp.asarray(mw, jnp.bfloat16),
                       x.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return x.astype(orig_dtype)
    x = x.astype(jnp.float32)
    x = jnp.einsum('oh,...hwc->...owc', jnp.asarray(mh), x, precision=_PREC)
    x = jnp.einsum('ow,...hwc->...hoc', jnp.asarray(mw), x, precision=_PREC)
    return x.astype(orig_dtype)


def interpolate_bilinear(x, size, align_corners: bool):
    """x: [..., H, W, C] -> [..., size[0], size[1], C]. Matches torch
    F.interpolate(mode='bilinear', align_corners=...) at fp32."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = int(size[0]), int(size[1])
    if (h, w) == (oh, ow):
        return x
    return _apply_separable(x, _linear_matrix(h, oh, align_corners),
                            _linear_matrix(w, ow, align_corners))


def interpolate_nearest(x, size):
    """x: [..., H, W, C] -> torch F.interpolate(mode='nearest')."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = int(size[0]), int(size[1])
    if (h, w) == (oh, ow):
        return x
    return _apply_separable(x, _nearest_matrix(h, oh), _nearest_matrix(w, ow))


def interpolate_linear_1d(x, out_size: int, align_corners: bool, axis: int = -1):
    """1-D linear interpolation along `axis` (torch mode='linear')."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    m = jnp.asarray(_linear_matrix(in_size, out_size, align_corners))
    x = jnp.moveaxis(x, axis, -1)
    y = jnp.einsum('oi,...i->...o', m, x.astype(jnp.float32),
                   precision=_PREC).astype(x.dtype)
    return jnp.moveaxis(y, -1, axis)


def interpolate_nearest_1d(x, out_size: int, axis: int = -1):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    m = jnp.asarray(_nearest_matrix(in_size, out_size))
    x = jnp.moveaxis(x, axis, -1)
    y = jnp.einsum('oi,...i->...o', m, x.astype(jnp.float32),
                   precision=_PREC).astype(x.dtype)
    return jnp.moveaxis(y, -1, axis)
