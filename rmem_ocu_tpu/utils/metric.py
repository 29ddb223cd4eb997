"""Train-time IoU metric.

Reference: aot_plus/utils/metric.py:4-36 (pytorch_iou) — per batch item,
mean IoU over object ids 1..obj_num; items with no objects are skipped; if
no item has objects the metric is 1.0. Vectorized over a static max object
count with masking instead of the reference's python loops.
"""
from __future__ import annotations

import jax.numpy as jnp


def batched_iou(pred, target, obj_nums, max_obj: int, epsilon: float = 1e-6):
    """pred/target: int [B, H, W]; obj_nums: [B]. Returns scalar f32."""
    ids = jnp.arange(1, max_obj + 1)                        # [O]
    p = pred[:, None] == ids[None, :, None, None]           # [B, O, H, W]
    t = target[:, None] == ids[None, :, None, None]
    inter = jnp.sum(p & t, axis=(2, 3)).astype(jnp.float32)
    union = jnp.sum(p | t, axis=(2, 3)).astype(jnp.float32)
    iou = (inter + epsilon) / (union + epsilon)             # [B, O]
    valid = ids[None] <= obj_nums[:, None]                  # [B, O]
    per_item = jnp.sum(jnp.where(valid, iou, 0.0), axis=1) / jnp.maximum(
        jnp.sum(valid, axis=1), 1)
    has_obj = obj_nums > 0
    n = jnp.sum(has_obj)
    mean = jnp.sum(jnp.where(has_obj, per_item, 0.0)) / jnp.maximum(n, 1)
    return jnp.where(n > 0, mean, 1.0)
