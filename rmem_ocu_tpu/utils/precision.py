"""Precision helpers (TPU-native; no reference equivalent — the reference
uses torch.cuda.amp autocast at train time, trainer.py:170-176, and fp32
eval)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast every floating leaf of a pytree to `dtype` (ints stay)."""
    def cast(x):
        if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, tree)


def compute_dtype_of(exp_cfg):
    return jnp.bfloat16 if exp_cfg.compute_dtype == 'bfloat16' else jnp.float32
