"""Training losses: top-k hard-mining cross-entropy + soft Jaccard.

Reference: aot_plus/networks/layers/loss.py:143-194 (CrossEntropyLoss with a
hard-mining ramp), :118-140 + :28-54 (SoftJaccordLoss = Tversky a=b=1).
The reference loops over batch elements with per-sample obj_num logit slicing;
here unused-id logits are already masked to -1e10 upstream (same as the
reference's decode_current_logits, engines/aot_engine.py:450-453) so the
softmax is identical, and reductions are batched with masks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def topk_cross_entropy(logits, labels, step, total_hard_mining_steps,
                       top_k_percent: float = 0.15):
    """logits: [B, H, W, C]; labels: int [B, H, W] (255 = ignore);
    step: traced scalar. Returns per-sample loss [B].

    k ramps from all pixels down to top_k_percent over
    total_hard_mining_steps (reference loss.py:176-187).
    """
    b, h, w, c = logits.shape
    num_pixels = h * w
    logits = logits.reshape(b, num_pixels, c).astype(jnp.float32)
    labels = labels.reshape(b, num_pixels)

    valid = labels != 255
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    # ignored pixels contribute 0, matching torch CE(ignore_index=255,
    # reduction='none'); they still occupy top-k slots.
    pixel_losses = jnp.where(valid, nll, 0.0)

    ratio = jnp.minimum(1.0, step / float(total_hard_mining_steps + 1e-5))
    k = (ratio * top_k_percent + (1.0 - ratio)) * num_pixels
    k = k.astype(jnp.int32)

    sorted_losses = jnp.sort(pixel_losses, axis=-1)[:, ::-1]
    in_topk = jnp.arange(num_pixels)[None, :] < k
    return jnp.sum(sorted_losses * in_topk, axis=-1) / jnp.maximum(k, 1)


def soft_jaccard_loss(logits, labels, obj_nums=None):
    """Soft-Jaccard (Tversky alpha=beta=1) over present classes.

    logits: [B, H, W, C]; labels: int [B, H, W]; obj_nums: [B] (class c is a
    candidate iff c <= obj_num). Returns per-sample loss [B].
    """
    b, h, w, c = logits.shape
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    probs = probs.reshape(b, h * w, c)
    labels = labels.reshape(b, h * w)
    valid = (labels != 255)[..., None].astype(jnp.float32)

    cls = jnp.arange(c)
    fg = (labels[..., None] == cls).astype(jnp.float32) * valid  # [B, P, C]
    p = probs * valid

    inter = jnp.sum(p * fg, axis=1)                              # [B, C]
    denom = jnp.sum(p, axis=1) + jnp.sum(fg, axis=1) - inter
    per_class = 1.0 - inter / (denom + 1e-6)

    present = jnp.sum(fg, axis=1) > 0
    if obj_nums is not None:
        present = present & (cls[None] <= obj_nums[:, None])
    present = present.astype(jnp.float32)
    return jnp.sum(per_class * present, axis=-1) / jnp.maximum(
        jnp.sum(present, axis=-1), 1.0)


def segmentation_loss(logits, labels, step, cfg_total_steps,
                      hard_mining_ratio: float = 0.5,
                      top_k_percent: float = 0.15, obj_nums=None):
    """0.5 * top-k CE + 0.5 * soft Jaccard (reference:
    engines/aot_engine.py:130-146). Returns per-sample loss [B]."""
    ce = topk_cross_entropy(logits, labels, step,
                            hard_mining_ratio * cfg_total_steps,
                            top_k_percent)
    jac = soft_jaccard_loss(logits, labels, obj_nums)
    return 0.5 * ce + 0.5 * jac
