"""Mask utilities: one-hot encoding with ignore channel, palette PNG I/O,
identity-shuffle permutation matrices.

Reference: aot_plus/utils/image.py:69-105, aot_plus/utils/math.py:4-14.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# DAVIS/VOS palette (first 16 entries are the canonical VOS colors, the rest
# grayscale — identical layout to the reference palette so saved PNGs are
# byte-compatible with the scorer's expectations).
_BASE_COLORS = [
    (0, 0, 0), (128, 0, 0), (0, 128, 0), (128, 128, 0), (0, 0, 128),
    (128, 0, 128), (0, 128, 128), (128, 128, 128), (64, 0, 0), (191, 0, 0),
    (64, 128, 0), (191, 128, 0), (64, 0, 128), (191, 0, 128), (64, 128, 128),
    (191, 128, 128), (0, 64, 0), (128, 64, 0), (0, 191, 0), (128, 191, 0),
    (0, 64, 128), (128, 64, 128),
]
VOS_PALETTE = []
for _c in _BASE_COLORS:
    VOS_PALETTE.extend(_c)
for _g in range(22, 256):
    VOS_PALETTE.extend((_g, _g, _g))


def one_hot_mask(mask, cls_num: int):
    """mask: integer [B, H, W] or [B, H, W, 1] -> (one_hot [B,H,W,cls_num+1],
    ignore [B,H,W,1]). Label 255 marks ignored pixels.

    Reference: utils/image.py:69-74 (NCHW there; NHWC here).
    """
    if mask.ndim == 4:
        mask = mask[..., 0]
    mask = mask.astype(jnp.int32)
    ids = jnp.arange(cls_num + 1, dtype=jnp.int32)
    one_hot = (mask[..., None] == ids).astype(jnp.float32)
    ignore = (mask == 255).astype(jnp.float32)[..., None]
    return one_hot, ignore


def generate_permute_matrix(dim: int, batch: int, key) -> jnp.ndarray:
    """Per-batch random permutation over foreground ids (bg id 0 fixed).

    Returns [B, dim, dim] with matrix[b, i, j] = 1 if id i maps to slot j.
    Reference: utils/math.py:4-14 (index_select of identity columns).
    """
    eye = jnp.eye(dim, dtype=jnp.float32)

    def one(k):
        fg = jax.random.permutation(k, dim - 1) + 1
        order = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 fg.astype(jnp.int32)])
        return eye[order]  # row-permuted identity, as in the reference

    keys = jax.random.split(key, batch)
    return jax.vmap(one)(keys)


def shuffle_one_hot(one_hot, perm):
    """Apply identity shuffle: [B,H,W,O] x [B,O,T] -> [B,H,W,T].

    Reference: engines/aot_engine.py:219-222 einsum('bohw,bot->bthw')."""
    return jnp.einsum('bhwo,bot->bhwt', one_hot, perm)


def unshuffle_logits(logits, perm):
    """Reverse shuffle on logits: einsum('bohw,bto->bthw') in the reference
    (engines/aot_engine.py:445-448); NHWC here."""
    return jnp.einsum('bhwo,bto->bhwt', logits, perm)


def save_mask_png(mask: np.ndarray, path: str, squeeze_idx=None):
    """Save an id mask as a palette PNG (reference: utils/image.py:90-100)."""
    from PIL import Image
    mask = np.asarray(mask).astype(np.uint8)
    if squeeze_idx is not None:
        unsqueezed = np.zeros_like(mask)
        for idx in range(1, len(squeeze_idx)):
            unsqueezed[mask == idx] = squeeze_idx[idx]
        mask = unsqueezed
    im = Image.fromarray(mask).convert('P')
    im.putpalette(VOS_PALETTE)
    im.save(path)


def read_mask_png(path: str) -> np.ndarray:
    from PIL import Image
    return np.array(Image.open(path))


def label2colormap(label: np.ndarray) -> np.ndarray:
    """Id mask [H, W] -> RGB uint8 colormap (reference utils/image.py:58-66,
    the bit-shuffled VOC-style map used for train-time image logs)."""
    m = np.asarray(label).astype(np.uint8)
    cmap = np.zeros(m.shape + (3,), dtype=np.uint8)
    cmap[..., 0] = (m & 1) << 7 | (m & 8) << 3 | (m & 64) >> 1
    cmap[..., 1] = (m & 2) << 6 | (m & 16) << 2 | (m & 128) >> 2
    cmap[..., 2] = (m & 4) << 5 | (m & 32) << 1
    return cmap
