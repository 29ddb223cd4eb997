"""Long-Short-Term Transformer (AOT) over the static memory bank.

Reference: aot_plus/networks/layers/transformer.py:133-697
(LongShortTermTransformer + SimplifiedTransformerBlock). Differences by
design:

- memory is the fixed-capacity ordered ring of memory/bank.py, so the
  long-term read is one attention over [T_cap*HW] keys with a -1e9 bias on
  empty slots (numerically identical to attending over only the live slots —
  masked logits underflow to exactly 0 after softmax),
- the per-slot attention mass used for RMem eviction
  (reference :636-643 record_attn_weight) falls out of the same read,
- the id-fusion projections applied at memory-update time
  (reference :269-299 update_short_memories) are exposed as module methods
  so the functional engine can call them when the mask is available.

The reference's module-level `atten_condenser` (transformer.py:126-131) is
dead code and intentionally not reproduced.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from rmem_ocu_tpu.ops.attention import MultiheadAttention
from rmem_ocu_tpu.ops.layers import EPS, DropPath, GNActDWConv2d

SLOT_NEG = -1e9


def bank_key_bias(valid, hw: int):
    """[B, 1, 1, T_cap*HW] additive bias masking empty/free slots.
    valid: [B, T_cap] bool per PHYSICAL slot (bank.slot_valid — the
    position-indirected bank has no prefix-ordering guarantee)."""
    bias = jnp.where(valid, 0.0, SLOT_NEG)
    return jnp.repeat(bias, hw, axis=-1)[:, None, None, :]


def frame_mass_from_probs(probs, capacity: int):
    """probs: [B, h, HWq, T_cap*HWk] -> mass [B, HWq, T_cap]
    (mean over heads, summed over each slot's keys;
    reference transformer.py:636-643)."""
    b, h, q, tk = probs.shape
    hw = tk // capacity
    m = probs.reshape(b, h, q, capacity, hw).astype(jnp.float32)
    return jnp.sum(jnp.mean(m, axis=1), axis=-1)


class LSTTBlock(nn.Module):
    """One SimplifiedTransformerBlock (reference transformer.py:466-697)."""
    d_model: int
    self_heads: int = 8
    att_heads: int = 8
    dim_feedforward: int = 1024
    droppath: float = 0.1
    linear_q: bool = False
    gru_memory: bool = False

    def setup(self):
        d = self.d_model
        self.norm1 = nn.LayerNorm(epsilon=EPS)
        self.self_attn = MultiheadAttention(d, self.self_heads,
                                            name='self_attn')
        self.norm2 = nn.LayerNorm(epsilon=EPS)
        self.linear_Q = nn.Dense(d)
        self.linear_V = nn.Dense(d)
        self.linear_QMem = nn.Dense(d)
        self.linear_VMem = nn.Dense(d)
        if not self.linear_q:
            self.norm4 = nn.LayerNorm(epsilon=EPS)
        self.long_term_attn = MultiheadAttention(d, self.att_heads,
                                                 use_linear=False,
                                                 name='long_term_attn')
        self.short_term_attn = MultiheadAttention(d, self.att_heads,
                                                  use_linear=False,
                                                  name='short_term_attn')
        self.norm3 = nn.LayerNorm(epsilon=EPS)
        self.linear1 = nn.Dense(self.dim_feedforward)
        self.activation = GNActDWConv2d(self.dim_feedforward)
        self.linear2 = nn.Dense(d)
        self.drop_path = DropPath(self.droppath)
        if self.gru_memory:
            from rmem_ocu_tpu.models.gru import ConvGRUCellOutput
            self.memory_gru_k = ConvGRUCellOutput(d, kernel_size=(2, 2),
                                                  name='memory_gru_k')
            self.memory_gru_v = ConvGRUCellOutput(d, kernel_size=(1, 1),
                                                  name='memory_gru_v')

    def __call__(self, tgt, long_mem, short_kv, curr_id_emb, self_pos,
                 size_2d, temporal_pe, need_mass: bool = False,
                 deterministic: bool = True):
        """tgt: [B, HW, C].
        long_mem: (k_bank [B,T,HW,C], v_bank [B,T,HW,C], valid [B,T])
        or None when curr_id_emb is given (reference frame: memory =
        current frame). `valid` marks live PHYSICAL slots
        (bank.slot_valid); slot order is arbitrary.
        short_kv: (k [B,HW,C], v [B,HW,C]) or None (reference frame).
        temporal_pe: (cur_pe [C], mem_pe_interp [B?, T, C]) or None; the
        mem PE is already interpolated to the live length with zero padding.
        Returns (tgt_out, memories dict, mass [B,HW,T]|None).
        """
        # --- self attention (reference :566-571) ---
        _tgt = self.norm1(tgt)
        q = k = _tgt if self_pos is None else _tgt + self_pos
        tgt2, _ = self.self_attn(q, k, _tgt, deterministic=deterministic)
        tgt = tgt + self.drop_path(tgt2, deterministic)

        # --- long-term attention (reference :574-648) ---
        _tgt = self.norm2(tgt)
        curr_q = self.linear_Q(_tgt)
        curr_k = curr_q
        curr_v = _tgt

        mems = {'curr_k': curr_k, 'curr_v': curr_v}
        if curr_id_emb is not None:
            fused_v = self.linear_V(curr_v + curr_id_emb)
            mem_k = curr_k[:, None]                    # [B, 1, HW, C]
            mem_v = fused_v[:, None]
            valid = jnp.ones((tgt.shape[0], 1), bool)
            local_k, local_v_in = curr_k, fused_v
            mems['global_v_fused'] = fused_v
        else:
            mem_k, mem_v, valid = long_mem
            local_k, local_v_in = short_kv

        capacity, hw = mem_k.shape[1], mem_k.shape[2]
        if temporal_pe is not None:
            cur_pe, mem_pe = temporal_pe
            mem_pe = mem_pe[..., :capacity, :]           # [B|1, T, C]
            if mem_pe.ndim == 2:                         # raw [slots, C]
                mem_pe = mem_pe[None]
            q_time = curr_q + cur_pe
        else:
            mem_pe, q_time = None, curr_q
        from rmem_ocu_tpu.ops.attention import pallas_memory_read_enabled
        # eval-only: no VJP is defined for the fused kernel
        if capacity > 1 and deterministic and pallas_memory_read_enabled():
            # fused kernel: attention + per-slot eviction mass in one pass,
            # empty slots skipped; PE applied to keys inside the kernel
            tgt2, mass = self.long_term_attn.bank_read(
                q_time, mem_k, mem_v, valid, mem_pe=mem_pe)
            if not need_mass:
                mass = None
        else:
            if mem_pe is not None:
                mem_k = mem_k + mem_pe[:, :, None, :]
            flat_k = mem_k.reshape(mem_k.shape[0], capacity * hw, -1)
            flat_v = mem_v.reshape(mem_v.shape[0], capacity * hw, -1)
            bias = (None if capacity == 1
                    else bank_key_bias(valid, hw))
            # eviction mass reduced inside the attention call: returning
            # the full [B, H, HWq, T*HW] float32 probs just to sum them
            # costs an extra bank-sized materialization (270 MB at 8-head
            # AOT-L eval shapes)
            tgt2, mass = self.long_term_attn(
                q_time, flat_k, flat_v, key_bias=bias,
                mass_capacity=capacity if need_mass else None,
                deterministic=deterministic)

        # --- short-term attention (reference :650-662) ---
        if self.linear_q:
            tgt3, _ = self.short_term_attn(
                curr_q,
                jnp.concatenate([local_k, curr_k], axis=1),
                jnp.concatenate([local_v_in, curr_v], axis=1),
                deterministic=deterministic)
        else:
            tgt3, _ = self.short_term_attn(
                curr_q,
                self.norm4(local_k + curr_k),
                self.norm4(local_v_in + curr_v),
                deterministic=deterministic)

        new_local_k = self.linear_QMem(tgt3)
        new_local_v = tgt3
        if curr_id_emb is not None:
            new_local_v = self.linear_VMem(new_local_v + curr_id_emb)
        mems['local_k'] = new_local_k
        mems['local_v'] = new_local_v

        tgt = tgt + tgt2 + tgt3

        # --- feed-forward (reference :683-687) ---
        _tgt = self.norm3(tgt)
        tgt2 = self.linear2(self.activation(self.linear1(_tgt), size_2d))
        tgt = tgt + self.drop_path(tgt2, deterministic)
        return tgt, mems, mass

    def fuse_curr_value(self, curr_v, id_emb):
        """Long-term value fusion at memory-update time
        (reference transformer.py:278-281)."""
        return self.linear_V(curr_v + id_emb)

    def fuse_local_value(self, local_v, id_emb):
        """Short-term value fusion at memory-update time
        (reference transformer.py:283-286)."""
        return self.linear_VMem(local_v + id_emb)

    def compress_evicted(self, k_slot, v_slot, hidden_k, hidden_v, size_2d):
        """ConvGRU compression of an evicted slot into slot 1
        (reference transformer.py:420-430)."""
        hk, out_k = self.memory_gru_k(k_slot, hidden_k, size_2d)
        hv, out_v = self.memory_gru_v(v_slot, hidden_v, size_2d)
        return (out_k, out_v), (hk, hv)


class LSTTStack(nn.Module):
    """LongShortTermTransformer (reference transformer.py:133-267)."""
    num_layers: int = 3
    d_model: int = 256
    self_heads: int = 8
    att_heads: int = 8
    dim_feedforward: int = 1024
    emb_dropout: float = 0.0
    droppath: float = 0.1
    droppath_scaling: bool = False
    linear_q: bool = False
    gru_memory: bool = False
    intermediate_norm: bool = True
    final_norm: bool = True

    def setup(self):
        blocks = []
        for idx in range(self.num_layers):
            rate = (self.droppath * idx / max(self.num_layers - 1, 1)
                    if self.droppath_scaling else self.droppath)
            blocks.append(LSTTBlock(
                self.d_model, self.self_heads, self.att_heads,
                self.dim_feedforward, rate, self.linear_q, self.gru_memory,
                name=f'block_{idx}'))
        self.blocks = blocks
        num_norms = (self.num_layers - 1) if self.intermediate_norm else 0
        if self.final_norm:
            num_norms += 1
        self.decoder_norms = [nn.LayerNorm(epsilon=EPS, name=f'decoder_norm_{i}')
                              for i in range(num_norms)]

    def __call__(self, tgt, long_mem, short_mem, curr_id_emb, self_pos,
                 size_2d, temporal_pe, need_mass: bool = False,
                 deterministic: bool = True):
        """long_mem: None or (k, v, valid) where k/v are per-layer tuples
        of [B,T,HW,C] and valid is [B,T] (live physical slots).
        short_mem: None or per-layer tuples (k, v) of [B,HW,C].
        Returns (intermediates list, per-layer memories, layer0 mass)."""
        if self.emb_dropout > 0.0 and not deterministic:
            keep = 1.0 - self.emb_dropout
            tgt = tgt * jax.random.bernoulli(
                self.make_rng('dropout'), keep, tgt.shape) / keep

        intermediates = []
        memories = []
        mass0 = None
        out = tgt
        for idx, block in enumerate(self.blocks):
            lm = None if long_mem is None else (
                long_mem[0][idx], long_mem[1][idx], long_mem[2])
            sm = None if short_mem is None else (
                short_mem[0][idx], short_mem[1][idx])
            out, mems, mass = block(out, lm, sm, curr_id_emb, self_pos,
                                    size_2d, temporal_pe,
                                    need_mass=(need_mass and idx == 0),
                                    deterministic=deterministic)
            if idx == 0:
                mass0 = mass
            intermediates.append(out)
            memories.append(mems)

        if self.decoder_norms:
            if self.final_norm:
                intermediates[-1] = self.decoder_norms[-1](intermediates[-1])
            if self.intermediate_norm:
                for i in range(len(intermediates) - 1):
                    intermediates[i] = self.decoder_norms[i](intermediates[i])
        return intermediates, memories, mass0
