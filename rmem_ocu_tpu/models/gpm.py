"""Dual-branch Gated Propagation Module (DeAOT) over the static memory bank.

Reference: aot_plus/networks/layers/transformer.py:700-1249 (DualBranchGPM +
GatedPropagationModule). The visual branch (tgt) and id branch (tgt_id)
propagate jointly; memory holds (K, V, ID_V) per layer. The long-term read is
one gated attention over the padded ring bank (empty slots masked to -1e9),
and layer-0's per-slot attention mass feeds RMem eviction.

GRU_MEMORY is intentionally absent here: the reference's DualBranchGPM
hardcodes self.gru_memory = False (transformer.py:728), its blocks never
build memory_grus, and the gru branch of its restrict_long_memories would
IndexError on the 4-tuple memory anyway — ConvGRU compression is an
AOT/LSTT-only feature (see models/lstt.py + engine/infer_engine.py).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from rmem_ocu_tpu.ops.attention import (GatedPropagation,
                                        LocalGatedPropagation)
from rmem_ocu_tpu.ops.layers import EPS, DropPath
from rmem_ocu_tpu.models.lstt import bank_key_bias, frame_mass_from_probs


class GPMBlock(nn.Module):
    """GatedPropagationModule (reference transformer.py:1010-1249)."""
    d_model: int
    self_heads: int = 1
    att_heads: int = 1
    dim_feedforward: int = 1024
    droppath: float = 0.1
    lt_dropout: float = 0.0
    st_dropout: float = 0.0
    droppath_lst: bool = False
    layer_idx: int = 0
    expand_ratio: float = 2.0
    max_local_dis: int = 7

    def setup(self):
        d = self.d_model
        self.expand_d_model = int(d * self.expand_ratio)
        # d_att: d/2 for single-head, d/heads otherwise (reference :1033)
        self.d_att = d // 2 if self.att_heads == 1 else d // self.att_heads
        self.norm1 = nn.LayerNorm(epsilon=EPS)
        self.linear_QV = nn.Dense(self.d_att * self.att_heads
                                  + self.expand_d_model)
        self.linear_U = nn.Dense(self.expand_d_model)
        if self.layer_idx == 0:
            self.linear_ID_V = nn.Dense(self.expand_d_model)
        else:
            self.id_norm1 = nn.LayerNorm(epsilon=EPS)
            self.linear_ID_V = nn.Dense(self.expand_d_model)
            self.linear_ID_U = nn.Dense(self.expand_d_model)
        # lt/st dropout rates reach the attention probabilities too
        # (reference transformer.py:1053, 1065 -> attention.py:61, 348)
        self.long_term_attn = GatedPropagation(
            d_qk=d, d_vu=d * 2, num_heads=self.att_heads, use_linear=False,
            d_att=self.d_att, expand_ratio=self.expand_ratio,
            dropout=self.lt_dropout, name='long_term_attn')
        self.short_term_attn = LocalGatedPropagation(
            d_qk=d, d_vu=d * 2, num_heads=self.att_heads, use_linear=False,
            d_att=self.d_att, max_dis=self.max_local_dis,
            expand_ratio=self.expand_ratio, dropout=self.st_dropout,
            name='short_term_attn')
        self.norm2 = nn.LayerNorm(epsilon=EPS)
        self.id_norm2 = nn.LayerNorm(epsilon=EPS)
        self.self_attn = GatedPropagation(
            d_qk=d * 2, d_vu=d * 2, num_heads=self.self_heads,
            d_att=self.d_att, name='self_attn')
        self.drop_path = DropPath(self.droppath)

    def __call__(self, tgt, tgt_id, long_mem, short_kv, curr_id_emb,
                 size_2d, temporal_pe, need_mass: bool = False,
                 deterministic: bool = True):
        """tgt: [B, HW, C]; tgt_id: [B, HW, C] or None (first layer).
        long_mem: (k [B,T,HW,Datt], v [B,T,HW,E], id_v [B,T,HW,E],
        valid [B,T] — live PHYSICAL slots, order arbitrary)
        or None when curr_id_emb is given.
        short_kv: (k, v, id_v) each [B, HW, *] or None.
        Returns (tgt, tgt_id, memories dict, mass)."""
        b = tgt.shape[0]
        _tgt = self.norm1(tgt)
        qv = self.linear_QV(_tgt)
        curr_q, curr_v = jnp.split(qv, [self.d_att * self.att_heads], axis=-1)
        curr_k = curr_q
        curr_v = jax.nn.silu(curr_v)
        curr_u = self.linear_U(_tgt)

        if tgt_id is None:
            cat_curr_u = jnp.concatenate(
                [jax.nn.silu(curr_u), jnp.ones_like(curr_u)], axis=-1)
            curr_id_v = None
        else:
            _tgt_id = self.id_norm1(tgt_id)
            curr_id_v = _tgt_id
            curr_id_u = self.linear_ID_U(_tgt_id)
            cat_curr_u = jax.nn.silu(
                jnp.concatenate([curr_u, curr_id_u], axis=-1))

        mems = {'curr_k': curr_k, 'curr_v': curr_v, 'curr_id_v': curr_id_v}
        if curr_id_emb is not None:
            global_id_v = self.fuse_value_id(curr_id_v, curr_id_emb)
            mem_k = curr_k[:, None]
            mem_v = curr_v[:, None]
            mem_id_v = global_id_v[:, None]
            valid = jnp.ones((b, 1), bool)
            local_k, local_v, local_id_v = curr_k, curr_v, global_id_v
            mems['global_id_v_fused'] = global_id_v
        else:
            mem_k, mem_v, mem_id_v, valid = long_mem
            local_k, local_v, local_id_v = short_kv

        capacity, hw = mem_k.shape[1], mem_k.shape[2]
        if temporal_pe is not None:
            cur_pe, mem_pe = temporal_pe
            mem_pe = mem_pe[..., :capacity, :]           # [B|1, T, Datt]
            if mem_pe.ndim == 2:                         # raw [slots, C]
                mem_pe = mem_pe[None]
            q_time = curr_q + cur_pe
        else:
            mem_pe, q_time = None, curr_q
        from rmem_ocu_tpu.ops.attention import pallas_memory_read_enabled
        # eval-only: no VJP is defined for the fused kernel
        if capacity > 1 and deterministic and pallas_memory_read_enabled():
            # PE is applied to the bank keys inside the kernel (rank-1
            # logit correction) — no full-bank (k + pe) materialization
            cat_tgt2, mass = self.long_term_attn.bank_read(
                q_time, mem_k, mem_v, mem_id_v, cat_curr_u, valid, size_2d,
                mem_pe=mem_pe, deterministic=deterministic)
            if not need_mass:
                mass = None
        else:
            if mem_pe is not None:
                mem_k = mem_k + mem_pe[:, :, None, :]
            flat_k = mem_k.reshape(b, capacity * hw, -1)
            bias = (None if capacity == 1
                    else bank_key_bias(valid, hw))
            if self.att_heads == 1:
                # V and ID_V share one probability matrix: read the two
                # banks separately instead of materializing the bank-sized
                # concat (numerics identical; see multi_value_call), with
                # the eviction mass reduced inside the read
                cat_tgt2, mass = self.long_term_attn.multi_value_call(
                    q_time, flat_k,
                    (mem_v.reshape(b, capacity * hw, -1),
                     mem_id_v.reshape(b, capacity * hw, -1)),
                    cat_curr_u, size_2d, key_bias=bias,
                    mass_capacity=capacity if need_mass else None,
                    deterministic=deterministic)
            else:
                flat_v = jnp.concatenate([
                    mem_v.reshape(b, capacity * hw, -1),
                    mem_id_v.reshape(b, capacity * hw, -1)], axis=-1)
                cat_tgt2, probs = self.long_term_attn(
                    q_time, flat_k, flat_v, cat_curr_u, size_2d,
                    key_bias=bias, return_probs=need_mass,
                    deterministic=deterministic)
                mass = (frame_mass_from_probs(probs, capacity)
                        if need_mass else None)

        cat_local_v = jnp.concatenate([local_v, local_id_v], axis=-1)
        cat_tgt3, _ = self.short_term_attn(
            curr_q, local_k, cat_local_v, cat_curr_u, size_2d,
            deterministic=deterministic)

        tgt2, tgt_id2 = jnp.split(cat_tgt2, 2, axis=-1)
        tgt3, tgt_id3 = jnp.split(cat_tgt3, 2, axis=-1)

        # long+short residual (reference :1215-1220): droppath_lst routes
        # it through stochastic depth, else Dropout(max(lt, st)) — every
        # reference config leaves both at their 0/False defaults
        base_id = tgt_id if tgt_id is not None else 0.0
        lst, lst_id = tgt2 + tgt3, tgt_id2 + tgt_id3
        if self.droppath_lst:
            tgt = tgt + self.drop_path(lst, deterministic)
            tgt_id = base_id + self.drop_path(lst_id, deterministic)
        else:
            rate = max(self.lt_dropout, self.st_dropout)
            if rate > 0.0 and not deterministic:
                keep = 1.0 - rate
                rng = self.make_rng('dropout')
                m = jax.random.bernoulli(rng, keep, lst.shape)
                lst = lst * m / keep
                m_id = jax.random.bernoulli(self.make_rng('dropout'), keep,
                                            lst_id.shape)
                lst_id = lst_id * m_id / keep
            tgt = tgt + lst
            tgt_id = base_id + lst_id

        # joint self-attention (reference :1222-1232)
        cat_q = jnp.concatenate([self.norm2(tgt), self.id_norm2(tgt_id)],
                                axis=-1)
        cat_tgt2, _ = self.self_attn(cat_q, cat_q, cat_q, cat_q, size_2d,
                                     deterministic=deterministic)
        tgt2, tgt_id2 = jnp.split(cat_tgt2, 2, axis=-1)
        tgt = tgt + self.drop_path(tgt2, deterministic)
        tgt_id = tgt_id + self.drop_path(tgt_id2, deterministic)

        return tgt, tgt_id, mems, mass

    def fuse_value_id(self, value, id_emb):
        """ID-value fusion (reference transformer.py:1238-1244)."""
        if value is None:
            return jax.nn.silu(self.linear_ID_V(id_emb))
        return jax.nn.silu(self.linear_ID_V(
            jnp.concatenate([value, id_emb], axis=-1)))


class GPMStack(nn.Module):
    """DualBranchGPM (reference transformer.py:700-824)."""
    num_layers: int = 3
    d_model: int = 256
    self_heads: int = 1
    att_heads: int = 1
    dim_feedforward: int = 1024
    emb_dropout: float = 0.0
    droppath: float = 0.1
    lt_dropout: float = 0.0
    st_dropout: float = 0.0
    droppath_lst: bool = False
    droppath_scaling: bool = False
    intermediate_norm: bool = True
    final_norm: bool = True

    def setup(self):
        blocks = []
        for idx in range(self.num_layers):
            rate = (self.droppath * idx / max(self.num_layers - 1, 1)
                    if self.droppath_scaling else self.droppath)
            blocks.append(GPMBlock(
                self.d_model, self.self_heads, self.att_heads,
                self.dim_feedforward, rate,
                lt_dropout=self.lt_dropout, st_dropout=self.st_dropout,
                droppath_lst=self.droppath_lst, layer_idx=idx,
                name=f'block_{idx}'))
        self.blocks = blocks
        num_norms = (self.num_layers - 1) if self.intermediate_norm else 0
        if self.final_norm:
            num_norms += 1
        # GN(groups=2) over the concatenated [tgt, tgt_id] channels
        # (reference transformer.py:755-758)
        self.decoder_norms = [
            nn.GroupNorm(num_groups=2, epsilon=EPS, name=f'decoder_norm_{i}')
            for i in range(num_norms)]

    def __call__(self, tgt, long_mem, short_mem, curr_id_emb, self_pos,
                 size_2d, temporal_pe, need_mass: bool = False,
                 deterministic: bool = True):
        if self.emb_dropout > 0.0 and not deterministic:
            keep = 1.0 - self.emb_dropout
            tgt = tgt * jax.random.bernoulli(
                self.make_rng('dropout'), keep, tgt.shape) / keep

        intermediates = []
        memories = []
        mass0 = None
        out, out_id = tgt, None
        for idx, block in enumerate(self.blocks):
            lm = None if long_mem is None else (
                long_mem[0][idx], long_mem[1][idx], long_mem[2][idx],
                long_mem[3])
            sm = None if short_mem is None else (
                short_mem[0][idx], short_mem[1][idx], short_mem[2][idx])
            out, out_id, mems, mass = block(
                out, out_id, lm, sm, curr_id_emb, size_2d, temporal_pe,
                need_mass=(need_mass and idx == 0),
                deterministic=deterministic)
            if idx == 0:
                mass0 = mass
            intermediates.append(jnp.concatenate([out, out_id], axis=-1))
            memories.append(mems)

        if self.decoder_norms:
            if self.final_norm:
                intermediates[-1] = self.decoder_norms[-1](intermediates[-1])
            if self.intermediate_norm:
                for i in range(len(intermediates) - 1):
                    intermediates[i] = self.decoder_norms[i](intermediates[i])
        return intermediates, memories, mass0
