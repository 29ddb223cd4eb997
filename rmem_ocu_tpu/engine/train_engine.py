"""Training episode as a jit/scan program.

Reference: aot_plus/networks/engines/aot_engine.py:40-128 (AOTEngine.forward)
— a python loop that encodes all frames offline, adds the reference frame,
then alternates propagate / loss / memory-update. Here the whole episode is
one pure function: the encoder runs once over [T*B] frames (one big MXU
batch), and frames 1..T-1 run under `lax.scan` with the memory bank as
carry; each scan step is `jax.checkpoint`-ed so the T=15 episode backprops
without storing every intermediate.
"""
from __future__ import annotations

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp

from rmem_ocu_tpu.config import ExpConfig
from rmem_ocu_tpu.memory import bank as membank
from rmem_ocu_tpu.models.vos_model import VOSModel
from rmem_ocu_tpu.ops.losses import segmentation_loss
from rmem_ocu_tpu.ops.masks import (generate_permute_matrix, one_hot_mask,
                                    shuffle_one_hot, unshuffle_logits)
from rmem_ocu_tpu.ops.position import interpolated_memory_pe
from rmem_ocu_tpu.ops.resize import interpolate_bilinear
from rmem_ocu_tpu.utils.metric import batched_iou

UNUSED_ID_LOGIT = -1e10


def _dots_min_contraction(min_k: int):
    """Remat policy: save `dot_general` outputs whose total contraction
    size K >= min_k (flops/byte of a matmul == K, so these are the most
    recompute-expensive values per byte of HBM spent saving them)."""
    def policy(prim, *args, **params):
        if str(prim) != 'dot_general':
            return False
        (lhs_contract, _), _ = params['dimension_numbers']
        lhs = args[0]
        k = 1
        for d in lhs_contract:
            k *= lhs.shape[d]
        return k >= min_k
    return policy


@flax.struct.dataclass
class EpisodeCarry:
    bank: membank.MemoryBank
    short: membank.ShortTermMemory
    last_mem_step: jnp.ndarray           # scalar int32
    # argmax mask of the latest frame's logits, for trainer logging only
    # (int32 [B, H, W]; a full-res softmax carry here would cost ~76 MB of
    # saved scan residuals PER STEP at the recipe shape)
    last_pred_mask: jnp.ndarray
    # REVERSE_INFER: the short-term memory captured right after frame 1
    # (reference aot_engine.py:371-375); None when the flag is off
    first_short: Optional[membank.ShortTermMemory] = None


class TrainEngine:
    """Binds (model, exp config) to the pure episode-loss function."""

    def __init__(self, model: VOSModel, exp: ExpConfig):
        self.model = model
        self.cfg = model.cfg
        self.exp = exp
        self.gap = exp.train_long_term_mem_gap
        self.skip = exp.train_short_term_mem_skip

    # -------------------------------------------------------------- #
    def _remat(self, fn):
        """Apply exp.train_remat_policy to the per-frame scan step (see
        ExpConfig.train_remat_policy)."""
        policy = getattr(self.exp, 'train_remat_policy', 'full')
        if policy == 'none':
            return fn
        if policy == 'dots':
            return jax.checkpoint(
                fn, policy=jax.checkpoint_policies
                .dots_with_no_batch_dims_saveable)
        if policy.startswith('dots_k'):
            # save only high-arithmetic-intensity dot outputs (contraction
            # dim K >= threshold). K is exactly the flops-per-output-byte of
            # a matmul, so this saves the dots that are most expensive to
            # recompute per byte stored (the attention PV products, K in
            # the thousands) while skipping the cheap wide projections that
            # made the plain 'dots' policy OOM at recipe scale.
            return jax.checkpoint(
                fn, policy=_dots_min_contraction(int(policy[6:])))
        return jax.checkpoint(fn)

    def _dims(self):
        cfg = self.cfg
        d = cfg.encoder_embedding_dim
        if cfg.vos == 'deaot':
            d_att = d // 2 if cfg.att_heads == 1 else d // cfg.att_heads
            return d_att * cfg.att_heads, int(d * 2.0), True
        return d, d, False

    def _id_emb(self, params, one_hot, ignore, shuffle, freeze_id, rngs):
        """Reference: engines/aot_engine.py:208-232."""
        cfg = self.cfg
        if cfg.ignore_token:
            non_ignored = (ignore == 0).astype(one_hot.dtype)
            one_hot = one_hot.at[..., 0:1].multiply(non_ignored)
        if shuffle is not None:
            one_hot = shuffle_one_hot(one_hot, shuffle)
        if cfg.ignore_token:
            one_hot = jnp.concatenate([one_hot, ignore], axis=-1)
        id_emb = self.model.apply(params, one_hot,
                                  method=VOSModel.get_id_emb,
                                  deterministic=False, rngs=rngs)
        if freeze_id:
            id_emb = jax.lax.stop_gradient(id_emb)
        return id_emb

    def _temporal_pe(self, params, length, cap=None, pos=None):
        if not self.cfg.use_temporal_pe:
            return None
        cur, mem = self.model.apply(params, method=VOSModel.temporal_pe)
        cap = self.cfg.mem_bank_capacity if cap is None else cap
        mem_i = jax.vmap(lambda l: interpolated_memory_pe(mem, l, cap))(
            length)
        if pos is not None:
            # logical-order interpolation -> the bank's physical slot order
            gathered = jax.vmap(lambda m, p: m[jnp.clip(p, 0)])(mem_i, pos)
            mem_i = jnp.where((pos >= 0)[..., None], gathered, 0.0)
        return cur[0], mem_i

    def _episode_capacity(self, t_total: int) -> int:
        """Tight static bank capacity for a T-frame episode.

        The write schedule inside the scan is deterministic (t = gap, 2*gap,
        ... <= T-1, reference aot_engine.py:344-369), so the live memory
        never exceeds 1 + floor((T-1)/gap) frames. When that stays within
        former+latter, eviction can never fire and the bank can be exactly
        that size — at the recipe shape (T=15, gap=4) this is 4 slots
        instead of 10, which cuts the per-scan-step saved carry (the
        dominant HBM term in backward) and the masked dead-slot attention
        keys by 2.5x. Falls back to the full ring (former+latter+1) when
        the schedule can overflow (e.g. NO_MEMORY_GAP's gap=1)."""
        cfg = self.cfg
        live_total = 1 + max(t_total - 1, 0) // max(self.gap, 1)
        if cfg.no_long_memory:
            live_total = 1
        if live_total <= cfg.former_mem_len + cfg.latter_mem_len:
            return max(live_total, 1)
        return cfg.mem_bank_capacity

    def _mask_unused(self, logits, obj_nums):
        c = logits.shape[-1]
        keep = jnp.arange(c)[None] <= obj_nums[:, None]
        return jnp.where(keep[:, None, None, :], logits, UNUSED_ID_LOGIT)

    def _frame_loss(self, logits_4x, gt_mask, obj_nums, step, input_size):
        """Per-frame loss at input resolution
        (reference aot_engine.py:485-508)."""
        logits = interpolate_bilinear(logits_4x, input_size,
                                      self.cfg.align_corners)
        return segmentation_loss(
            logits, gt_mask, step, self.exp.train_total_steps,
            self.exp.train_hard_mining_ratio,
            self.exp.train_top_k_percent_pixels, obj_nums)

    # -------------------------------------------------------------- #
    def episode_loss(self, params, frames, masks, obj_nums, step, rng,
                     use_prev_pred: bool = False, enable_id_shuffle: bool = True):
        """frames: [B, T, H, W, 3]; masks: int32 [B, T, H, W];
        obj_nums: [B]; step: scalar; rng: PRNGKey.
        Returns (scalar loss, aux dict with per-frame losses and last pred).
        """
        cfg, exp = self.cfg, self.exp
        b, t_total, h, w, _ = frames.shape
        input_size = (h, w)
        rng_shuffle, rng_drop = jax.random.split(rng)
        rngs = {'droppath': rng_drop, 'dropout': rng_drop}

        # --- mixed precision (reference --amp, trainer.py:170-176): cast
        # params + activations to bf16 INSIDE the loss function, so
        # value_and_grad still differentiates w.r.t. the float32 params (the
        # cast's VJP returns float32 grads) and the optimizer state stays
        # float32. Losses upcast to float32 internally (ops/losses.py).
        amp = getattr(exp, 'train_amp', False)
        if amp:
            from rmem_ocu_tpu.utils.precision import cast_floating
            params = cast_floating(params, jnp.bfloat16)
            frames = frames.astype(jnp.bfloat16)

        # --- offline encode all frames in one batch (aot_engine.py:174-196)
        flat = frames.reshape(b * t_total, h, w, 3)
        var_loss = None
        new_batch_stats = None
        # mutable collections: 'losses' for the TopDown reconstruction loss
        # (sown by the encoder, reference aot_engine.py:115-118), and
        # 'batch_stats' when freeze_bn=False so trainable BN updates its
        # running stats (reference trains BatchNorm2d/SyncBN when
        # MODEL_FREEZE_BN is off, trainer.py:104-105)
        mut = []
        if cfg.var_loss_weight is not None:
            mut.append('losses')
        if 'batch_stats' in params:
            mut.append('batch_stats')

        # ORACLE training: the offline encode consumes the GT labels too
        # (reference offline_encoder, aot_engine.py:178-183 under
        # USE_MASK+ORACLE encodes all frames with all masks)
        enc_mask = (masks.reshape(b * t_total, h, w)[..., None].astype(
            jnp.int32) if cfg.use_mask else None)

        def encode(p, imgs, enc_rngs, m=None):
            if mut:
                return self.model.apply(
                    p, imgs, m, method=VOSModel.encode_image, rngs=enc_rngs,
                    mutable=mut)
            return self.model.apply(p, imgs, m,
                                    method=VOSModel.encode_image,
                                    rngs=enc_rngs), {}

        # the offline pass holds all B*T frames' conv activations for
        # backward otherwise — at the reference recipe shape (batch 8 x
        # seq 15 @ 465²) that alone exceeds one chip's HBM; remat keeps
        # only the multi-scale outputs (which the scan consumes anyway)
        if getattr(exp, 'train_remat_policy', 'full') != 'none':
            encode = jax.checkpoint(encode)
        n_flat = b * t_total
        chunk = getattr(exp, 'train_encoder_chunk', 0)
        chunk_ok = (0 < chunk < n_flat and n_flat % chunk == 0
                    and not mut and enc_mask is None)
        if chunk and not chunk_ok:
            # an explicitly requested chunk that silently falls back to the
            # monolithic encode would reintroduce the OOM/spill the knob
            # exists to avoid, with nothing connecting the failure to it
            import warnings
            reason = ('B*T=%d %% chunk=%d != 0' % (n_flat, chunk)
                      if 0 < chunk < n_flat and n_flat % chunk else
                      'chunk outside (0, B*T)' if not 0 < chunk < n_flat
                      else 'trainable-BN / var-loss encoder'
                      if mut else 'use_mask (oracle) encoding')
            warnings.warn('train_encoder_chunk=%d ignored (%s); using the '
                          'monolithic offline encode' % (chunk, reason),
                          stacklevel=2)
        if chunk and chunk_ok:
            # chunked offline encode: backward recomputes one chunk's conv
            # activations at a time instead of all B*T at once (see
            # ExpConfig.train_encoder_chunk). Frozen-BN encoders are pure
            # per-image functions, so this is numerically equivalent to the
            # monolithic batch; droppath rngs are folded per chunk.
            def enc_body(_, inp):
                ci, imgs = inp
                ck = {k: jax.random.fold_in(v, ci) for k, v in rngs.items()}
                ys, _ = encode(params, imgs, ck)
                return None, ys
            _, xs = jax.lax.scan(
                enc_body, None,
                (jnp.arange(n_flat // chunk, dtype=jnp.int32),
                 flat.reshape(n_flat // chunk, chunk, h, w, 3)))
            xs = [x.reshape(n_flat, *x.shape[2:]) for x in xs]
            updated = {}
        else:
            xs, updated = encode(params, flat, rngs, enc_mask)
        sows = jax.tree.leaves(updated.get('losses', {}))
        if sows:
            var_loss = jnp.mean(jnp.stack(sows))
        new_batch_stats = updated.get('batch_stats')
        # -> per-frame lists [B, T, h16, w16, C]
        xs = [x.reshape(b, t_total, *x.shape[1:]) for x in xs]
        h16, w16 = xs[-1].shape[2], xs[-1].shape[3]
        size_2d = (h16, w16)
        hw = h16 * w16

        one_hot_all, ignore_all = one_hot_mask(
            masks.reshape(b * t_total, h, w), cfg.max_obj_num)
        if amp:
            # keep the id-embedding conv in bf16 (a float32 one-hot would
            # silently promote the whole id path back to float32)
            one_hot_all = one_hot_all.astype(jnp.bfloat16)
            ignore_all = ignore_all.astype(jnp.bfloat16)
        one_hot_all = one_hot_all.reshape(b, t_total, h, w, -1)
        ignore_all = ignore_all.reshape(b, t_total, h, w, 1)

        shuffle = (generate_permute_matrix(cfg.max_obj_num + 1, b,
                                           rng_shuffle)
                   if enable_id_shuffle else None)

        self_pos = self.model.apply(params, size_2d,
                                    method=VOSModel.get_pos_emb)
        ck, cv, with_id = self._dims()
        L = cfg.lstt_num
        cap = self._episode_capacity(t_total)

        def lstt_step(p, emb16, long_mem, short_mem, id_emb, tpe,
                      step_rngs=None):
            return self.model.apply(
                p, emb16, long_mem, short_mem, id_emb, self_pos, size_2d,
                temporal_pe=tpe, need_mass=False, deterministic=False,
                rngs=step_rngs or rngs, method=VOSModel.lstt_forward)

        def decode(p, inters, shortcuts, obj_nums):
            logits = self.model.apply(p, inters, shortcuts, rngs=rngs,
                                      method=VOSModel.decode_id_logits)
            if shuffle is not None:
                logits = unshuffle_logits(logits, shuffle)
            return self._mask_unused(logits, obj_nums)

        frame_xs = lambda t: [x[:, t] for x in xs]

        # --- reference frame (t = 0) ---
        id_emb0 = self._id_emb(params, one_hot_all[:, 0], ignore_all[:, 0],
                               shuffle, freeze_id=use_prev_pred, rngs=rngs)
        tpe_ref = self._temporal_pe(params, jnp.ones((b,), jnp.int32),
                                    cap=cap)
        if tpe_ref is not None:
            tpe_ref = (tpe_ref[0], tpe_ref[1][:, :1])
        inters0, mems0, _ = lstt_step(params, xs[-1][:, 0], None, None,
                                      id_emb0, tpe_ref)
        logits0 = decode(params, inters0, frame_xs(0), obj_nums)
        aux_loss = self._frame_loss(logits0, masks[:, 0], obj_nums, step,
                                    input_size)
        pred0 = jnp.argmax(interpolate_bilinear(logits0, input_size,
                                                cfg.align_corners),
                           axis=-1).astype(jnp.int32)
        iou0 = batched_iou(pred0, masks[:, 0], obj_nums, cfg.max_obj_num)

        stack = lambda ms, key: tuple(m[key] for m in ms)
        if cfg.vos == 'deaot':
            long_k0 = stack(mems0, 'curr_k')
            long_v0 = stack(mems0, 'curr_v')
            long_id0 = stack(mems0, 'global_id_v_fused')
            short0 = (long_k0, long_v0, long_id0)
        else:
            long_k0 = stack(mems0, 'curr_k')
            long_v0 = stack(mems0, 'global_v_fused')
            long_id0 = None
            short0 = (stack(mems0, 'local_k'), stack(mems0, 'local_v'), None)

        bank = membank.init_bank(L, b, cap, hw, ck, cv, with_id,
                                 frames.dtype)
        bank = membank.append_frame(bank, long_k0, long_v0, long_id0, 0)
        short = membank.init_short_term(L, b, self.skip, hw, ck, cv, with_id,
                                        frames.dtype)
        short = membank.push_short_term(short, *short0)

        carry = EpisodeCarry(
            bank=bank, short=short,
            last_mem_step=jnp.zeros((), jnp.int32),
            last_pred_mask=jax.lax.stop_gradient(pred0),
            first_short=(short if cfg.reverse_infer and cfg.vos == 'aot'
                         else None))

        # --- frames 1..T-1 under scan ---
        def step_fn(carry: EpisodeCarry, inputs):
            t_idx, emb16, shortcuts, oh, ig, gt = inputs
            # decorrelate stochastic-depth masks across frames
            step_key = jax.random.fold_in(rng_drop, t_idx)
            step_rngs = {'droppath': step_key, 'dropout': step_key}
            tpe = self._temporal_pe(params, carry.bank.length, cap=cap,
                                    pos=carry.bank.pos)
            if cfg.vos == 'deaot':
                long_mem = (carry.bank.k, carry.bank.v, carry.bank.id_v,
                            carry.bank.slot_valid)
                short_mem = carry.short.read()
            else:
                k0, v0, _ = carry.short.read()
                long_mem = (carry.bank.k, carry.bank.v,
                            carry.bank.slot_valid)
                short_mem = (k0, v0)
            inters, mems, _ = lstt_step(params, emb16, long_mem, short_mem,
                                        None, tpe, step_rngs=step_rngs)
            logits = decode(params, inters, shortcuts, obj_nums)
            loss = self._frame_loss(logits, gt, obj_nums, step, input_size)

            # per-frame train IoU (reference trainer.py:577-588 via
            # utils/metric.py pytorch_iou); XLA CSEs the upsample shared
            # with _frame_loss
            logits_full = interpolate_bilinear(logits, input_size,
                                               cfg.align_corners)
            pred_mask = jnp.argmax(logits_full, axis=-1).astype(jnp.int32)
            iou = batched_iou(pred_mask, gt, obj_nums, cfg.max_obj_num)

            # memory update with GT identity (or previous prediction when
            # use_prev_pred; reference aot_engine.py:91-99)
            if use_prev_pred:
                upd_oh, upd_ig = one_hot_mask(pred_mask, cfg.max_obj_num)
                # match the episode one-hots' dtype: under amp a float32
                # one-hot here would promote the id-emb + memory-fusion
                # path back to fp32 for the whole use_prev_pred phase
                upd_oh = upd_oh.astype(one_hot_all.dtype)
                upd_ig = upd_ig.astype(ignore_all.dtype)
            else:
                upd_oh, upd_ig = oh, ig
            # per-step rngs: the episode-level `rngs` is a scan-invariant
            # constant, which would repeat the same id-dropout mask every
            # frame instead of sampling fresh like the reference nn.Dropout
            id_emb = self._id_emb(params, upd_oh, upd_ig, shuffle,
                                  freeze_id=use_prev_pred, rngs=step_rngs)

            per_layer = []
            for idx in range(L):
                m = dict(curr_k=mems[idx]['curr_k'],
                         curr_v=mems[idx]['curr_v'])
                if cfg.vos == 'deaot':
                    m['curr_id_v'] = (None if idx == 0
                                      else mems[idx]['curr_id_v'])
                else:
                    m['local_k'] = mems[idx]['local_k']
                    m['local_v'] = mems[idx]['local_v']
                per_layer.append(m)
            fused = self.model.apply(params, per_layer, id_emb, rngs=rngs,
                                     method=VOSModel.fuse_memory_values)
            fstack = lambda key: tuple(f[key] for f in fused)
            new_short = membank.push_short_term(
                carry.short, fstack('short_k'), fstack('short_v'),
                fstack('short_id_v') if cfg.vos == 'deaot' else None)

            do_long = jnp.logical_and(
                t_idx - carry.last_mem_step >= self.gap,
                jnp.array(not cfg.no_long_memory))

            # slot-granular predication instead of lax.cond (the cond's
            # branch join copied the whole bank every scan step; with the
            # position-indirected bank, append is a one-slot write and
            # evict is index arithmetic)
            do_long_b = jnp.broadcast_to(do_long, carry.bank.length.shape)
            new_bank = membank.append_frame(
                carry.bank, fstack('long_k'), fstack('long_v'),
                fstack('long_id_v') if cfg.vos == 'deaot' else None,
                t_idx, enabled=do_long_b)
            over = do_long_b & (
                new_bank.length > (cfg.former_mem_len + cfg.latter_mem_len))
            drop = membank.default_drop_index(new_bank, cfg.former_mem_len,
                                              cfg.gru_memory)
            new_bank = membank.evict_frame(new_bank, drop, enabled=over)

            # REVERSE_INFER (reference aot_engine.py:371-396): after a long
            # write, re-segment the reference frame against the *latter*
            # memory (slot 0 dropped) + the frame-1 short memory, and add a
            # scaled backward-consistency loss.
            # (AOT only: the reference's DualBranchGPM ignores outer
            # memories, transformer.py:765-798, so DeAOT reverse-infer is
            # broken upstream and not reproduced)
            rev_loss = jnp.zeros_like(loss)
            first_short = carry.first_short
            if cfg.reverse_infer and cfg.vos == 'aot':
                # captured DETACHED, like the reference's
                # first_short_memories = [.detach().clone() ...]
                # (aot_engine.py:373-375, the "detach_short" in the model
                # name): the reverse loss must not backpropagate into the
                # frame-1 short-memory producers
                first_short = jax.tree.map(
                    lambda a, b_: jnp.where(
                        t_idx == 1, jax.lax.stop_gradient(b_), a),
                    carry.first_short, new_short)

                def reverse_loss(_):
                    # the *latter* memory = everything but logical slot 0,
                    # expressed as a validity mask over the full-capacity
                    # physical bank (one extra -1e9-masked slot instead of
                    # the ordered ring's [:, 1:] slice — softmax-identical);
                    # outer logical position j = original position j+1, so
                    # the PE permutation uses pos-1
                    outer_valid = (new_bank.slot_valid
                                   & (new_bank.pos != 0))
                    outer_len = jnp.maximum(new_bank.length - 1, 1)
                    k0, v0, _ = first_short.read()
                    tpe_r = self._temporal_pe(
                        params, outer_len, cap=cap,
                        pos=jnp.where(new_bank.pos >= 1,
                                      new_bank.pos - 1, -1))
                    inters_r, _, _ = lstt_step(
                        params, xs[-1][:, 0],
                        (new_bank.k, new_bank.v, outer_valid),
                        (k0, v0), None, tpe_r)
                    logits_r = decode(params, inters_r, frame_xs(0),
                                      obj_nums)
                    return cfg.reverse_loss * self._frame_loss(
                        logits_r, masks[:, 0], obj_nums, step, input_size)

                # fires on every long write while training, like the
                # reference (aot_engine.py:372-396 under self.training) —
                # except after the final frame: the reference's episode
                # loop calls update_short_term_memory only T-2 times
                # (aot_engine.py:91-101), so no memory write (and hence no
                # reverse pass) follows the last propagation
                rev_gate = jnp.logical_and(do_long, t_idx < t_total - 1)
                rev_loss = jax.lax.cond(
                    rev_gate, reverse_loss,
                    lambda _: jnp.zeros_like(loss), None)

            new_carry = EpisodeCarry(
                bank=new_bank, short=new_short,
                last_mem_step=jnp.where(do_long, t_idx,
                                        carry.last_mem_step),
                last_pred_mask=jax.lax.stop_gradient(pred_mask),
                first_short=first_short)
            rev_fired = (rev_gate.astype(jnp.float32)
                         if cfg.reverse_infer and cfg.vos == 'aot'
                         else jnp.zeros(()))
            return new_carry, (loss, rev_loss, rev_fired, iou)

        xs_scan = (
            jnp.arange(1, t_total, dtype=jnp.int32),
            jnp.moveaxis(xs[-1][:, 1:], 1, 0),
            [jnp.moveaxis(x[:, 1:], 1, 0) for x in xs],
            jnp.moveaxis(one_hot_all[:, 1:], 1, 0),
            jnp.moveaxis(ignore_all[:, 1:], 1, 0),
            jnp.moveaxis(masks[:, 1:], 1, 0),
        )
        carry, (frame_losses, rev_losses, rev_fired, frame_ious) = \
            jax.lax.scan(self._remat(step_fn), carry, xs_scan,
                         unroll=getattr(exp, 'train_scan_unroll', 1))

        # loss aggregation (reference aot_engine.py:108-113): aux weight
        # decays linearly to 0 over train_aux_loss_ratio of training.
        # REVERSE_INFER losses join curr_losses as extra entries in the
        # reference (update_short_term_memory's return appended at
        # aot_engine.py:95-101), so pred_loss is a mean whose denominator
        # grows by one per firing — not a separately-weighted term.
        aux_step = exp.train_total_steps * exp.train_aux_loss_ratio + 1e-5
        aux_w = exp.train_aux_loss_weight * jnp.maximum(
            aux_step - step, 0.0) / aux_step
        n_entries = frame_losses.size + jnp.sum(rev_fired) * b
        pred_loss = (jnp.sum(frame_losses) + jnp.sum(rev_losses)) / n_entries
        total = aux_w * jnp.mean(aux_loss) + pred_loss
        all_ious = jnp.concatenate([iou0[None], frame_ious])
        aux = {
            'aux_loss': jnp.mean(aux_loss),
            'pred_loss': pred_loss,
            'frame_losses': jnp.mean(frame_losses, axis=-1),
            # per-frame-position train IoU incl. the reference frame
            # (reference trainer.py:577-595 running_ious meters)
            'frame_ious': all_ious,
            'iou': jnp.mean(all_ious),
            'final_pred_mask': carry.last_pred_mask,
        }
        if var_loss is not None:
            total = total + cfg.var_loss_weight * var_loss
            aux['var_loss'] = var_loss
        if new_batch_stats is not None:
            # updated BN running stats; carried out through the grad's aux
            # (zero gradient flows to them) and merged into the new params
            # by the trainer
            aux['batch_stats'] = new_batch_stats
        return total, aux
