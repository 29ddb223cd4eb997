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


def _topk_sum(x, k):
    """Sum of the k largest entries per row of x, sort-free.

    x: [B, P] non-negative float32; k: traced int32 scalar in [1, P].

    A full `jnp.sort` over P ~ 216k pixels is one of the slowest ops on
    TPU (multi-pass bitonic network), and its VJP is a permutation
    scatter (per-element stores). Instead: the IEEE-754 bit pattern of a
    non-negative float is order-preserving as uint32, so 32 fixed radix
    bisection steps (each one vectorized compare + row-sum) find the
    exact k-th largest value t; the top-k sum is then
    sum(x[x > t]) + (k - |{x > t}|) * t, which equals the sorted top-k
    sum as a multiset (ties at t contribute t each). The threshold
    selection is locally constant, so the VJP routes gradient straight
    to the selected pixels with no scatter: weight 1 above t, and the
    (k - m)/n_ties fair split across pixels equal to t — identical to
    autodiff-through-sort when values are distinct (n_ties = 1)."""
    bsz = x.shape[0]
    xs = jax.lax.stop_gradient(x)
    # -0.0 bitcasts to 0x80000000, which the unsigned ordering would treat
    # as the LARGEST value; perfectly-classified pixels produce
    # nll = -sum(0.0 * onehot) = -0.0, so without normalization every
    # confident pixel would occupy a top-k slot and the selected threshold
    # would collapse. abs() clears the sign bit (x is non-negative by
    # construction); the float comparisons below are IEEE (-0.0 == 0.0) so
    # only the bitcast needs it.
    u = jax.lax.bitcast_convert_type(jnp.abs(xs), jnp.uint32)

    def body(i, prefix):
        cand = prefix | (jnp.uint32(1) << (31 - i))
        cnt = jnp.sum(u >= cand[:, None], axis=1)
        return jnp.where(cnt >= k, cand, prefix)

    t_bits = jax.lax.fori_loop(0, 32, body,
                               jnp.zeros((bsz,), jnp.uint32))
    t = jax.lax.bitcast_convert_type(t_bits, jnp.float32)[:, None]
    above = xs > t
    at = xs == t
    m = jnp.sum(above.astype(jnp.float32), axis=1)
    n_ties = jnp.maximum(jnp.sum(at.astype(jnp.float32), axis=1), 1.0)
    frac = (k.astype(jnp.float32) - m) / n_ties
    return (jnp.sum(jnp.where(above, x, 0.0), axis=1)
            + frac * jnp.sum(jnp.where(at, x, 0.0), axis=1))


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
    # label pick as a dense one-hot contraction, NOT take_along_axis: a
    # per-pixel gather's VJP is a [B, P, C] element scatter, one of the
    # slowest op classes on TPU; the dense multiply fuses and its VJP is a
    # dense multiply too (C is tiny).
    one_hot = (safe_labels[..., None] == jnp.arange(c)[None, None]
               ).astype(logp.dtype)
    nll = -jnp.sum(logp * one_hot, axis=-1)
    # ignored pixels contribute 0, matching torch CE(ignore_index=255,
    # reduction='none'); they still occupy top-k slots.
    pixel_losses = jnp.where(valid, nll, 0.0)

    ratio = jnp.minimum(1.0, step / float(total_hard_mining_steps + 1e-5))
    k = (ratio * top_k_percent + (1.0 - ratio)) * num_pixels
    k = k.astype(jnp.int32)

    return _topk_sum(pixel_losses, k) / jnp.maximum(k, 1)


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
