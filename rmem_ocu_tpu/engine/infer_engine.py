"""Pure-functional per-video inference engine.

Reference: aot_plus/networks/engines/aot_engine.py — AOTEngine holds mutable
per-video state on an nn.Module (frame_step, memory lists, pos_emb) and
AOTInferEngine spawns one engine per group of <= max_obj_num objects
(:675-700). Here the whole per-video state is one jittable pytree
(`EngineState`) and the object groups are folded into the batch axis, so N
objects cost one batched pass; the public API mirrors the reference loop:

    state  = engine.add_reference_frame(params, state0, img, mask, obj_nums)
    logits, state = engine.propagate(params, state, img)
    state  = engine.update_memory(params, state, pred_prob_or_mask)

All three are jit-compiled once per input resolution.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from rmem_ocu_tpu.config import ExpConfig, ModelConfig
from rmem_ocu_tpu.memory import bank as membank
from rmem_ocu_tpu.models.vos_model import VOSModel
from rmem_ocu_tpu.ops.position import interpolated_memory_pe
from rmem_ocu_tpu.ops.resize import interpolate_bilinear
from rmem_ocu_tpu.ops.s2d import space_to_depth_label

UNUSED_ID_LOGIT = -1e10


@flax.struct.dataclass
class EngineState:
    bank: membank.MemoryBank
    short: membank.ShortTermMemory
    # pending per-layer memories captured at the last propagation, a tuple
    # of L arrays [B, HW, C] — one buffer per layer, so no stack/slice
    # copies (reference keeps lstt_curr_memories / lstt_short_memories on
    # the module, transformer.py:261-265)
    pending_long_k: membank.LayerArrays
    pending_long_v: membank.LayerArrays
    pending_short_k: membank.LayerArrays
    pending_short_v: membank.LayerArrays
    pending_id_v: Optional[membank.LayerArrays]  # DeAOT curr_id_v (layer>0)
    pending_mass: Optional[jnp.ndarray]        # [B, HW, T_cap] eviction mass
    pred_logits_4x: jnp.ndarray                # [B, H4, W4, O+1]
    frame_step: jnp.ndarray                    # scalar int32
    last_mem_step: jnp.ndarray                 # scalar int32
    mem_gap: jnp.ndarray                       # scalar int32 (long-term
                                               # write interval; dynamic so
                                               # per-sequence adaptive gaps
                                               # share one compilation)
    obj_nums: jnp.ndarray                      # [B]
    # GRU-compression hidden states (AOT gru_memory), else None
    gru_hidden_k: Optional[membank.LayerArrays]
    gru_hidden_v: Optional[membank.LayerArrays]


def _mask_unused_ids(logits, obj_nums):
    """Set logits of ids > obj_num to -1e10
    (reference engines/aot_engine.py:450-453)."""
    c = logits.shape[-1]
    keep = jnp.arange(c)[None] <= obj_nums[:, None]      # [B, C]
    neg = jnp.asarray(UNUSED_ID_LOGIT, logits.dtype)
    return jnp.where(keep[:, None, None, :], logits, neg)


class InferEngine:
    """Thin stateless wrapper binding (model, cfg) to jitted pure fns."""

    def __init__(self, model: VOSModel, exp_cfg: ExpConfig,
                 long_term_mem_gap: Optional[int] = None,
                 short_term_mem_skip: Optional[int] = None,
                 training: bool = False):
        self.model = model
        self.cfg: ModelConfig = model.cfg
        self.exp = exp_cfg
        self.gap = (long_term_mem_gap if long_term_mem_gap is not None
                    else exp_cfg.test_long_term_mem_gap)
        self.skip = (short_term_mem_skip if short_term_mem_skip is not None
                     else exp_cfg.test_short_term_mem_skip)
        self.training = training
        # activation/memory dtype from exp.compute_dtype (TPU-native knob;
        # bf16 halves HBM traffic on the bank and runs the MXU at rate).
        # Inputs are cast at the engine boundary; pass cast_params(params)
        # for end-to-end bf16 (f32 params would re-promote every matmul).
        self.dtype = (jnp.bfloat16 if exp_cfg.compute_dtype == 'bfloat16'
                      else jnp.float32)
        # jit caches keyed by input shape. The state argument is donated:
        # the engine API is move-semantics (each call consumes the state and
        # returns the successor), and in-place bank updates avoid copying
        # the ring buffer every frame (+40% streaming throughput on v5e).
        # Donation is a no-op (with a warning) on CPU.
        self._jit_add_ref = jax.jit(self._add_reference_frame,
                                    donate_argnums=(1,))
        self._jit_propagate = jax.jit(self._propagate, donate_argnums=(1,))
        self._jit_update = jax.jit(self._update_memory, donate_argnums=(1,))

    # ------------------------------------------------------------------ #
    # dims
    def _dims(self):
        cfg = self.cfg
        d = cfg.encoder_embedding_dim
        if cfg.vos == 'deaot':
            d_att = d // 2 if cfg.att_heads == 1 else d // cfg.att_heads
            ck = d_att * cfg.att_heads
            cv = int(d * 2.0)  # expand_d_model
            with_id = True
        else:
            ck, cv, with_id = d, d, False
        return ck, cv, with_id

    def init_state(self, batch: int, size_2d: Tuple[int, int],
                   dtype=None, mem_gap: Optional[int] = None
                   ) -> EngineState:
        cfg = self.cfg
        if dtype is None:
            dtype = self.dtype
        hw = size_2d[0] * size_2d[1]
        ck, cv, with_id = self._dims()
        L = cfg.lstt_num
        cap = cfg.mem_bank_capacity
        zeros = lambda c: tuple(jnp.zeros((batch, hw, c), dtype)
                                for _ in range(L))
        h4 = 4 * size_2d[0] - 3 if cfg.align_corners else 4 * size_2d[0]
        w4 = 4 * size_2d[1] - 3 if cfg.align_corners else 4 * size_2d[1]
        gru = cfg.gru_memory and cfg.vos == 'aot'
        return EngineState(
            bank=membank.init_bank(L, batch, cap, hw, ck, cv, with_id, dtype),
            short=membank.init_short_term(L, batch, self.skip, hw, ck, cv,
                                          with_id, dtype),
            pending_long_k=zeros(ck), pending_long_v=zeros(cv),
            pending_short_k=zeros(ck), pending_short_v=zeros(cv),
            pending_id_v=zeros(cfg.encoder_embedding_dim) if with_id else None,
            pending_mass=jnp.zeros((batch, hw, cap), jnp.float32),
            pred_logits_4x=jnp.zeros((batch, h4, w4, cfg.max_obj_num + 1),
                                     dtype),
            frame_step=jnp.zeros((), jnp.int32),
            last_mem_step=-jnp.ones((), jnp.int32),
            mem_gap=jnp.asarray(mem_gap if mem_gap is not None else self.gap,
                                jnp.int32),
            obj_nums=jnp.ones((batch,), jnp.int32),
            gru_hidden_k=zeros(ck) if gru else None,
            gru_hidden_v=zeros(cv) if gru else None,
        )

    # ------------------------------------------------------------------ #
    def _apply(self, params, method, *args, **kw):
        return self.model.apply(params, *args, method=method, **kw)

    def _encode(self, params, img, mask=None):
        xs = self._apply(params, VOSModel.encode_image, img, mask)
        return xs

    def _id_emb(self, params, one_hot, ignore, dtype=None):
        """one-hot [B,H,W,O+1] + ignore [B,H,W,1] -> id tokens [B,HW,d].
        Reference: engines/aot_engine.py:208-232 (no id shuffle at eval)."""
        if self.cfg.ignore_token:
            non_ignored = (ignore == 0).astype(one_hot.dtype)
            one_hot = one_hot.at[..., 0:1].multiply(non_ignored)
            one_hot = jnp.concatenate([one_hot, ignore], axis=-1)
        if dtype is not None:
            one_hot = one_hot.astype(dtype)
        return self._apply(params, VOSModel.get_id_emb, one_hot)

    def _id_emb_from_label(self, params, label, dtype=None):
        """_id_emb for an INT label map, skipping the full-res one-hot: the
        one-hot (+ the ignore_token fold: ch0 *= (label != 255), appended
        ignore channel) equals one_hot(label', n_ch) with label' = n_ch - 1
        at ignored pixels, so it can be built directly in the id bank's 16x
        space-to-depth block layout (shuffles the int map, 16x*n_ch/4 less
        data than transposing the one-hot — profiled ~250 us/frame at 480p).
        """
        cfg = self.cfg
        if label.ndim == 4:
            label = label[..., 0]
        n_ids = cfg.max_obj_num + 1
        n_ch = n_ids + (1 if cfg.ignore_token else 0)
        lab = label.astype(jnp.int32)
        # out-of-range ids (incl. 255 without ignore_token) -> all-zero
        # channels, exactly like one_hot_mask
        lab = jnp.where(lab >= n_ids, n_ch, lab)
        if cfg.ignore_token:
            lab = jnp.where(label.astype(jnp.int32) == 255, n_ch - 1, lab)
        B, H, W = lab.shape
        xb = space_to_depth_label(lab, 16, n_ch,
                                  dtype=dtype if dtype is not None
                                  else jnp.float32)
        return self._apply(params, VOSModel.get_id_emb, xb, pre_s2d=(H, W))

    def _temporal_pe(self, params, length, pos=None):
        """(cur_pe [C], mem_pe [B, T_cap, C]) or None, interpolated to the
        live memory length (reference transformer.py:594-629).

        `pos` ([B, T_cap] logical position per physical slot) permutes the
        logically-ordered interpolation onto the bank's physical slot
        order; free slots (pos < 0) get zero PE (their keys are masked by
        bank_key_bias anyway)."""
        if not self.cfg.use_temporal_pe:
            return None
        cur, mem = self._apply(params, VOSModel.temporal_pe)
        cap = self.cfg.mem_bank_capacity
        mem_i = jax.vmap(lambda l: interpolated_memory_pe(mem, l, cap))(
            length)                                      # [B, T_cap, C]
        if pos is not None:
            gathered = jax.vmap(lambda m, p: m[jnp.clip(p, 0)])(mem_i, pos)
            mem_i = jnp.where((pos >= 0)[..., None], gathered, 0.0)
        return cur[0], mem_i

    # ------------------------------------------------------------------ #
    def _add_reference_frame(self, params, state: EngineState, img, mask,
                             obj_nums):
        """img: [B,H,W,3]; mask: int [B,H,W]; obj_nums: [B].
        Reference: engines/aot_engine.py:241-325.

        Re-adding a reference mid-sequence (YouTube-VOS mid-video labels)
        RESETS the memory: the reference's init_LSTT_memory
        (aot_engine.py:321-323, transformer.py:438-453) replaces long/short
        memory with just the new reference frame and clears the eviction
        EMA/UCB dicts and GRU hidden states.
        """
        cfg = self.cfg
        state = state.replace(
            bank=membank.reset_bank(state.bank),
            short=membank.reset_short_term(state.short),
            pending_mass=(None if state.pending_mass is None
                          else jnp.zeros_like(state.pending_mass)),
            gru_hidden_k=(None if state.gru_hidden_k is None
                          else membank._map(jnp.zeros_like,
                                            state.gru_hidden_k)),
            gru_hidden_v=(None if state.gru_hidden_v is None
                          else membank._map(jnp.zeros_like,
                                            state.gru_hidden_v)))
        img = img.astype(self.dtype)
        # USE_MASK models condition the reference-frame encoder on the GT
        # label too (reference add_reference_frame -> encode_one_img_mask
        # with the mask, aot_engine.py:157-160, 258-260)
        enc_mask = (mask[..., None].astype(jnp.int32)
                    if cfg.use_mask else None)
        xs = self._encode(params, img, enc_mask)
        b, h, w, _ = xs[-1].shape
        size_2d = (h, w)

        id_emb = self._id_emb_from_label(params, mask, dtype=img.dtype)
        self_pos = self._apply(params, VOSModel.get_pos_emb,
                               size_2d).astype(img.dtype)
        tpe = self._temporal_pe(params,
                                jnp.ones((b,), jnp.int32))  # ref: T = 1
        if tpe is not None:
            tpe = (tpe[0], tpe[1][:, :1])  # single virtual slot

        inters, mems, _ = self._apply(
            params, VOSModel.lstt_forward, xs[-1], None, None, id_emb,
            self_pos, size_2d, temporal_pe=tpe)
        logits = self._apply(params, VOSModel.decode_id_logits, inters, xs)
        logits = _mask_unused_ids(logits, obj_nums)

        # write reference frame into long + short memory
        # (reference: init_LSTT_memory, aot_engine.py:321-323)
        stack = lambda key: tuple(m[key] for m in mems)
        if cfg.vos == 'deaot':
            long_k = stack('curr_k')
            long_v = stack('curr_v')
            long_id_v = stack('global_id_v_fused')
            short_k, short_v, short_id_v = long_k, long_v, long_id_v
        else:
            long_k = stack('curr_k')
            long_v = stack('global_v_fused')
            long_id_v = None
            short_k, short_v, short_id_v = (stack('local_k'),
                                            stack('local_v'), None)
        bank = membank.append_frame(state.bank, long_k, long_v, long_id_v,
                                    state.frame_step)
        short = membank.push_short_term(state.short, short_k, short_v,
                                        short_id_v)
        return state.replace(
            bank=bank, short=short, pred_logits_4x=logits,
            last_mem_step=state.frame_step, obj_nums=obj_nums)

    def add_reference_frame(self, params, state, img, mask, obj_nums):
        return self._jit_add_ref(params, state, img, mask, obj_nums)

    # ------------------------------------------------------------------ #
    def _propagate(self, params, state: EngineState, img, mask=None):
        """One frame forward against the memory. `mask` is the optional
        oracle/USE_MASK label fed to the mask-conditioned encoder
        (reference aot_engine.py:404-417).
        Reference: engines/aot_engine.py:398-436."""
        cfg = self.cfg
        state = state.replace(frame_step=state.frame_step + 1)
        img = img.astype(self.dtype)
        xs = self._encode(params, img, mask)
        b, h, w, _ = xs[-1].shape
        size_2d = (h, w)
        self_pos = self._apply(params, VOSModel.get_pos_emb,
                               size_2d).astype(img.dtype)
        tpe = self._temporal_pe(params, state.bank.length, state.bank.pos)

        if cfg.vos == 'deaot':
            long_mem = (state.bank.k, state.bank.v, state.bank.id_v,
                        state.bank.slot_valid)
            short_mem = state.short.read()
        else:
            long_mem = (state.bank.k, state.bank.v, state.bank.slot_valid)
            k0, v0, _ = state.short.read()
            short_mem = (k0, v0)

        need_mass = not self.training
        inters, mems, mass = self._apply(
            params, VOSModel.lstt_forward, xs[-1], long_mem, short_mem,
            None, self_pos, size_2d, temporal_pe=tpe, need_mass=need_mass)
        logits = self._apply(params, VOSModel.decode_id_logits, inters, xs)
        logits = _mask_unused_ids(logits, state.obj_nums)

        stack = lambda key: tuple(m[key] for m in mems)
        pend = dict(
            pending_long_k=stack('curr_k'),
            pending_long_v=stack('curr_v'),
            pending_short_k=stack('curr_k' if cfg.vos == 'deaot'
                                  else 'local_k'),
            pending_short_v=stack('curr_v' if cfg.vos == 'deaot'
                                  else 'local_v'),
        )
        if cfg.vos == 'deaot':
            # layer-0 curr_id_v is None (id branch starts empty); store zeros
            # and let fuse_value_id's layer-0 path ignore it.
            pend['pending_id_v'] = tuple(
                m['curr_id_v'] if m['curr_id_v'] is not None
                else jnp.zeros_like(
                    mems[0]['curr_v'][..., :cfg.encoder_embedding_dim])
                for m in mems)
        if need_mass:
            pend['pending_mass'] = mass
        state = state.replace(pred_logits_4x=logits, **pend)
        return logits, state

    def propagate(self, params, state, img, mask=None):
        return self._jit_propagate(params, state, img, mask)

    # ------------------------------------------------------------------ #
    def _update_memory(self, params, state: EngineState, mask):
        """mask: int [B, H, W] predicted (or [B, H, W, O+1] probabilities).
        Reference: engines/aot_engine.py:327-369 + transformer.py:269-436."""
        cfg = self.cfg
        if mask.ndim == 3 or mask.shape[-1] == 1:
            id_emb = self._id_emb_from_label(params, mask,
                                             dtype=state.bank.k[0].dtype)
        else:
            one_hot, ignore = mask, jnp.zeros_like(mask[..., :1])
            id_emb = self._id_emb(params, one_hot, ignore,
                                  dtype=state.bank.k[0].dtype)

        # fuse pending memories with the id embedding
        per_layer = []
        L = cfg.lstt_num
        for idx in range(L):
            m = dict(curr_k=state.pending_long_k[idx],
                     curr_v=state.pending_long_v[idx],
                     local_k=state.pending_short_k[idx],
                     local_v=state.pending_short_v[idx])
            if cfg.vos == 'deaot':
                m['curr_id_v'] = (None if idx == 0
                                  else state.pending_id_v[idx])
            per_layer.append(m)
        fused = self._apply(params, VOSModel.fuse_memory_values, per_layer,
                            id_emb)
        stack = lambda key: tuple(f[key] for f in fused)

        short = membank.push_short_term(
            state.short, stack('short_k'), stack('short_v'),
            stack('short_id_v') if cfg.vos == 'deaot' else None)

        if cfg.no_long_memory:
            return state.replace(short=short)

        # long-term write every `gap` frames (reference aot_engine.py:338-343).
        # Slot-granular predication instead of lax.cond: with the
        # position-indirected bank, append touches ONE physical slot and
        # evict touches NO data, so running both every frame with
        # `enabled=do_long` costs a slot-sized read-modify-write — while a
        # lax.cond carrying the bank paid a branch-join copy every frame
        # (0.75 ms/frame at 8-stream 480p serving, round-4 census).
        do_long = state.frame_step - state.last_mem_step >= state.mem_gap
        do_long = jnp.broadcast_to(do_long, state.bank.length.shape)
        size_2d = self._enc_size_2d(state)

        bank, gh_k, gh_v = state.bank, state.gru_hidden_k, state.gru_hidden_v
        bank = membank.append_frame(
            bank, stack('long_k'), stack('long_v'),
            stack('long_id_v') if cfg.vos == 'deaot' else None,
            state.frame_step, enabled=do_long)
        over = do_long & (bank.length
                          > (cfg.former_mem_len + cfg.latter_mem_len))

        if self.training:
            drop_idx = membank.default_drop_index(
                bank, cfg.former_mem_len, cfg.gru_memory)
        else:
            # GPM scores on every long-memory update; LSTT only once over
            # budget (reference transformer.py:880-964 has no early
            # return, :332-334 does)
            score_now = do_long & (jnp.ones_like(over) if cfg.vos == 'deaot'
                                   else over)
            fg = self._foreground_proba(state, size_2d)
            drop_scored, bank = membank.eviction_scores_and_update(
                bank, state.pending_mass, fg_proba=fg,
                gru_memory=cfg.gru_memory, enabled=score_now,
                former_len=cfg.former_mem_len)
            drop_idx = drop_scored

        compressed = None
        if cfg.gru_memory and cfg.vos == 'aot':
            # compress the to-be-evicted slot into slot 1 via ConvGRU.
            # The hidden state only advances when a drop actually happens
            # (reference restrict_long_memories early-returns while
            # size <= former+latter, transformer.py:332-334, and updates
            # hidden_states only inside the is_drop branch :420-430).
            # The GRU forward itself rides a lax.cond on any(over): unlike
            # the bank, its carried operands are one slot + the hidden
            # state (small join copy), while the always-on ConvGRU forward
            # would cost more than the copy on non-drop frames (round-4
            # advisor). Per-batch selection stays `pick` inside the branch.
            phys_d = bank.phys_of(drop_idx)
            take = lambda arrs: tuple(
                jax.vmap(lambda a, d: a[d])(arr, phys_d)
                for arr in arrs)
            k_in, v_in = take(bank.k), take(bank.v)

            def run_gru(ops):
                k_in, v_in, gh_k, gh_v = ops
                (ck_, cv_), (gh_k_new, gh_v_new) = self._apply(
                    params, VOSModel.compress_evicted_slots, k_in, v_in,
                    gh_k, gh_v, size_2d)
                sel = over[:, None, None]
                pick = lambda new, old: jnp.where(sel, new, old)
                return (ck_, cv_, membank._map(pick, gh_k_new, gh_k),
                        membank._map(pick, gh_v_new, gh_v))

            def skip_gru(ops):
                # ck/cv are dead when over is all-False (the compressed
                # write in evict_frame is predicated on `over`)
                k_in, v_in, gh_k, gh_v = ops
                return k_in, v_in, gh_k, gh_v

            ck_, cv_, gh_k, gh_v = jax.lax.cond(
                jnp.any(over), run_gru, skip_gru, (k_in, v_in, gh_k, gh_v))
            compressed = (ck_, cv_, None)

        bank = membank.evict_frame(bank, drop_idx, enabled=over,
                                   compressed_kv=compressed)
        last_mem = jnp.where(do_long[0], state.frame_step,
                             state.last_mem_step)
        return state.replace(bank=bank, short=short, last_mem_step=last_mem,
                             gru_hidden_k=gh_k, gru_hidden_v=gh_v)

    def _enc_size_2d(self, state: EngineState) -> Tuple[int, int]:
        """Recover the encoder grid from the stored 4x logits shape."""
        h4, w4 = state.pred_logits_4x.shape[1:3]
        if self.cfg.align_corners:
            return (h4 + 3) // 4, (w4 + 3) // 4
        return h4 // 4, w4 // 4

    def _foreground_proba(self, state: EngineState, size_2d):
        """1 - P(bg) at encoder resolution, flattened to [B, HW]
        (reference aot_engine.py:355-362; always align_corners=True there)."""
        logits = interpolate_bilinear(state.pred_logits_4x, size_2d, True)
        prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        fg = 1.0 - prob[..., 0]
        return fg.reshape(fg.shape[0], -1)

    def update_memory(self, params, state, mask):
        return self._jit_update(params, state, mask)

    # ------------------------------------------------------------------ #
    def predict_mask(self, logits_4x, output_size, return_prob: bool = False):
        """Upsample 4x logits to output_size and argmax
        (reference aot_engine.py:467-483)."""
        logits = interpolate_bilinear(logits_4x, output_size,
                                      self.cfg.align_corners)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if return_prob:
            return pred, jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return pred
