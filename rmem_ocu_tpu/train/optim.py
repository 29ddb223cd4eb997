"""Optimizer, LR schedule, and parameter-group rules.

Reference: aot_plus/utils/learning.py:4-95 (poly/cosine LR with linear
warmup, encoder LR ratio, per-group weight-decay exemptions) and
trainer.py:144-178. Implemented as pure functions over the param pytree:
masks are trees of scalars derived from parameter paths, the AdamW update is
assembled from optax primitives so per-group LR (an *affine* function of the
scheduled LR, not a constant multiple) matches the reference exactly.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from rmem_ocu_tpu.config import ExpConfig

FROZEN_BN_LEAVES = ('running_mean', 'running_var')


def path_str(keypath) -> str:
    return '.'.join(str(getattr(k, 'key', getattr(k, 'idx', k)))
                    for k in keypath)


def schedule_lr(step, exp: ExpConfig):
    """Linear warmup -> poly(power) or cosine decay
    (reference utils/learning.py:22-34), optionally split into
    TRAIN_LR_RESTART identical cycles (learning.py:16-19: each cycle is
    ceil(total/restart) steps with warmup shrunk by 1/restart)."""
    base, mn = exp.train_lr, exp.train_lr_min
    max_itr = exp.train_total_steps
    warm = exp.train_lr_warm_up_ratio * max_itr
    step = jnp.asarray(step, jnp.float32)
    if exp.train_lr_restart > 1:
        each = float(math.ceil(max_itr / exp.train_lr_restart))
        warm = warm / exp.train_lr_restart
        max_itr = each
        step = jnp.mod(step, each)

    warm_lr = mn + (base - mn) * step / warm
    it = step - warm
    mx = max_itr - warm
    if exp.train_lr_cosine_decay:
        decay_lr = mn + (base - mn) * (jnp.cos(jnp.pi * it / (mx + 1)) + 1.0
                                       ) * 0.5
    else:
        decay_lr = mn + (base - mn) * (1.0 - it / (mx + 1)) ** exp.train_lr_power
    return jnp.where(step < warm, warm_lr, decay_lr)


def _encoder_stage_frozen(name: str, encoder: str, freeze_at: int) -> bool:
    """Stage-level encoder freezing (reference encoders/*/freeze(freeze_at),
    e.g. resnet.py:206-213: freeze_at >= 1 freezes the stem, stage idx
    counts from 2 = the 4x stage). Default TRAIN_ENCODER_FREEZE_AT = 2.

    `name` is the full param path; stage membership is read off the first
    module segment under 'encoder.'.
    """
    if freeze_at <= 0 or 'encoder.' not in name:
        return False
    mod = name.split('encoder.', 1)[1].split('.', 1)[0]
    if encoder.startswith(('resnet', 'resnest')):
        # stem = conv1/bn1 (resnet) or stem_* (resnest); layerN <-> stage N+1
        if mod in ('conv1', 'bn1') or mod.startswith('stem_'):
            return freeze_at >= 1
        if mod.startswith('layer'):
            return freeze_at >= int(mod[5]) + 1
        return False  # topdown decode blocks / prompt are never frozen
    if encoder == 'mobilenetv2':
        # features[j] <-> feat_j; stages = [0:4], [4:7], [7:14], [14:]
        # (reference mobilenetv2.py:210-215, freeze :240-247)
        j = int(mod.split('_')[1])
        bounds = (4, 7, 14)
        if j == 0 and freeze_at >= 1:
            return True
        stage = 2 + sum(j >= b for b in bounds)
        return freeze_at >= stage
    if encoder == 'mobilenetv3':
        # features = [stem] + blocks; stages = [0:4], [4:7], [7:13], [13:]
        # (reference mobilenetv3.py:200-206, freeze :233-240); the trailing
        # conv_1x1 (last_conv) is separate and never frozen
        if mod in ('stem', 'stem_bn'):
            return freeze_at >= 1
        if mod.startswith('block_'):
            j = int(mod.split('_')[1]) + 1          # features index
            stage = 2 + sum(j >= b for b in (4, 7, 13))
            return freeze_at >= stage
        return False
    if encoder.startswith('swin'):
        # frozen_stages = freeze_at (reference swin/build.py:21,
        # _freeze_stages :637-655): patch embed at >= 0 (only reached with
        # freeze_at >= 1 here since <= 0 means "off" for every family),
        # layers[i] (blocks + downsample) at >= i + 2; out-norms never.
        if mod in ('patch_embed', 'patch_norm'):
            return freeze_at >= 1
        if mod.startswith(('stage', 'downsample')):
            s = int(mod.removeprefix('stage').removeprefix('downsample')[0])
            return freeze_at >= s + 2
        return False
    return False


def make_masks(params, exp: ExpConfig,
               extra_frozen: Sequence[str] = ()):
    """Per-leaf (wd_coeff, is_encoder, is_frozen) trees.

    WD rules (reference utils/learning.py:70-83): 1-D tensors and biases get
    no decay; names containing an exemption key get none; frozen-BN buffers
    and explicitly frozen module prefixes train with lr 0.

    Freeze recipes (reference trainer.py:65-92 + encoder freeze_at): lr-0
    masks are exactly requires_grad=False for AdamW — the frozen leaves are
    bit-identical after a step.
    """
    exemptions = tuple(exp.train_weight_decay_exemption)
    mcfg = exp.model

    def classify(keypath, leaf):
        name = path_str(keypath)
        # BN running stats are buffers in both modes (trainable BN updates
        # them through the mutable 'batch_stats' collection, not the
        # optimizer)
        frozen = any(l in name for l in FROZEN_BN_LEAVES)
        # frozen-BN affine params are buffers in the reference (never
        # trained): freeze weight/bias living directly beside running
        # stats — but only under freeze_bn; trainable BN trains its affine
        if mcfg.freeze_bn and (
                name.endswith(('bn.weight', 'bn1.weight', 'bn2.weight',
                               'bn3.weight', 'downsample_bn.weight'))
                or name.endswith(('bn.bias', 'bn1.bias', 'bn2.bias',
                                  'bn3.bias', 'downsample_bn.bias'))):
            frozen = True
        for f in extra_frozen:
            if f in name:
                frozen = True
        is_enc = name.startswith('params.encoder.') or \
            '.encoder.' in name
        # freeze recipes (applied in the reference's order: the
        # freeze-all-except recipes override everything else,
        # trainer.py:72-92)
        if mcfg.freeze_except_temporal_pe:
            frozen = not ('cur_pos_emb' in name or 'mem_pos_emb' in name)
        elif mcfg.freeze_except_gru:
            frozen = 'memory_gru' not in name
        else:
            if mcfg.freeze_backbone and is_enc:
                frozen = True
            if is_enc and _encoder_stage_frozen(
                    name, mcfg.encoder, exp.train_encoder_freeze_at):
                frozen = True
        wd = exp.train_weight_decay
        if leaf.ndim <= 1:
            wd = 0.0
        for ex in exemptions:
            if ex in name:
                wd = 0.0
        return wd, is_enc, frozen

    wd_tree = jax.tree_util.tree_map_with_path(
        lambda kp, x: classify(kp, x)[0], params)
    enc_tree = jax.tree_util.tree_map_with_path(
        lambda kp, x: classify(kp, x)[1], params)
    frozen_tree = jax.tree_util.tree_map_with_path(
        lambda kp, x: classify(kp, x)[2], params)
    return wd_tree, enc_tree, frozen_tree


def make_optimizer(exp: ExpConfig, params=None):
    """Adam core by default; weight decay / per-group LR applied in
    apply_updates (decoupled, torch-AdamW style).

    TRAIN_OPT='sgd' (reference trainer.py:155-161) is torch SGD semantics:
    clip the raw grads, add L2 weight decay to the gradient *before* the
    momentum accumulation (not decoupled), Nesterov momentum
    TRAIN_SGD_MOMENTUM. Needs `params` for the per-leaf wd mask."""
    if exp.train_opt == 'sgd':
        assert params is not None, 'sgd optimizer needs params for wd masks'
        wd_tree, _, _ = make_masks(params, exp)
        wd_mask = jax.tree_util.tree_map(lambda w: w > 0.0, wd_tree)
        return optax.chain(
            optax.clip_by_global_norm(exp.train_clip_grad_norm),
            optax.add_decayed_weights(exp.train_weight_decay, mask=wd_mask),
            optax.trace(decay=exp.train_sgd_momentum, nesterov=True),
        )
    return optax.chain(
        optax.clip_by_global_norm(exp.train_clip_grad_norm),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
    )


def apply_updates(params, adam_updates, masks, now_lr, exp: ExpConfig):
    """p -= lr_group * (adam_update + wd * p), torch-AdamW style
    (decoupled decay; reference trainer.py:168-178 via torch.optim.AdamW).
    Under TRAIN_OPT='sgd' the wd already entered the gradient before the
    momentum (make_optimizer), so no decoupled term here."""
    wd_tree, enc_tree, frozen_tree = masks
    mn = exp.train_lr_min
    ratio = exp.train_lr_encoder_ratio
    decoupled_wd = exp.train_opt != 'sgd'

    def upd(p, u, wd, is_enc, frozen):
        lr = jnp.where(is_enc, (now_lr - mn) * ratio + mn, now_lr)
        lr = jnp.where(frozen, 0.0, lr)
        return p - lr * (u + (wd * p if decoupled_wd else 0.0))

    return jax.tree_util.tree_map(upd, params, adam_updates, wd_tree,
                                  enc_tree, frozen_tree)


def ema_update(ema_params, params, num_updates, decay: float):
    """Reference utils/ema.py:55-67: decay warmup min(decay, (1+n)/(10+n))."""
    d = jnp.minimum(decay, (1.0 + num_updates) / (10.0 + num_updates))
    return jax.tree_util.tree_map(
        lambda s, p: s - (1.0 - d) * (s - p), ema_params, params)
