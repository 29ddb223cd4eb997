"""AOT / DeAOT model facade.

Reference: aot_plus/networks/models/aot.py:12-205 (AOT) and deaot.py:10-69
(DeAOT). One flax module covers both families; the engine drives it through
`apply(..., method=...)` calls, mirroring the reference's method surface
(encode_image, get_id_emb, LSTT_forward, decode_id_logits) but with all
memory state *outside* the module as an explicit pytree.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from rmem_ocu_tpu.config import ModelConfig
from rmem_ocu_tpu.models.decoders.fpn import FPNSegmentationHead
from rmem_ocu_tpu.models.encoders import build_encoder
from rmem_ocu_tpu.models.gpm import GPMStack
from rmem_ocu_tpu.models.lstt import LSTTStack
from rmem_ocu_tpu.ops.layers import EPS, tokens_from_2d
from rmem_ocu_tpu.ops.s2d import S2DConv
from rmem_ocu_tpu.ops.position import sine_position_embedding


class VOSModel(nn.Module):
    cfg: ModelConfig
    # train-time stochastic-depth / dropout rates (reference
    # cfg.TRAIN_LSTT_DROPPATH{,_SCALING} and TRAIN_LSTT_EMB_DROPOUT feed
    # the LSTT/GPM constructors, aot.py:24-43); build_vos_model fills them
    # from ExpConfig. Inactive whenever the stacks run deterministic.
    droppath: float = 0.1
    droppath_scaling: bool = False
    emb_dropout: float = 0.0
    id_dropout: float = 0.0         # on the id embedding (aot.py:84, :113)
    lt_dropout: float = 0.0         # GPM long+short residual (:1070, 1219)
    st_dropout: float = 0.0
    droppath_lst: bool = False      # stochastic depth on that residual

    @property
    def is_deaot(self) -> bool:
        return self.cfg.vos == 'deaot'

    def setup(self):
        cfg = self.cfg
        d = cfg.encoder_embedding_dim
        self.encoder = build_encoder(cfg.encoder, frozen_bn=cfg.freeze_bn,
                                     use_mask=cfg.use_mask)
        self.encoder_projector = nn.Conv(d, (1, 1), name='encoder_projector')

        # decoder in_dim (reference aot.py:50-52 / deaot.py:28-30) is
        # implied by the concatenated inputs; flax infers input dims
        if self.is_deaot:
            self.lstt = GPMStack(
                num_layers=cfg.lstt_num, d_model=d,
                self_heads=cfg.self_heads, att_heads=cfg.att_heads,
                emb_dropout=self.emb_dropout, droppath=self.droppath,
                lt_dropout=self.lt_dropout, st_dropout=self.st_dropout,
                droppath_lst=self.droppath_lst,
                droppath_scaling=self.droppath_scaling,
                intermediate_norm=cfg.decoder_intermediate_lstt,
                name='lstt')
        else:
            self.lstt = LSTTStack(
                num_layers=cfg.lstt_num, d_model=d,
                self_heads=cfg.self_heads, att_heads=cfg.att_heads,
                linear_q=cfg.linear_q, gru_memory=cfg.gru_memory,
                emb_dropout=self.emb_dropout, droppath=self.droppath,
                droppath_scaling=self.droppath_scaling,
                intermediate_norm=cfg.decoder_intermediate_lstt,
                name='lstt')

        self.decoder = FPNSegmentationHead(
            out_dim=cfg.max_obj_num + 1, hidden_dim=d,
            decode_intermediate_input=cfg.decoder_intermediate_lstt,
            align_corners=cfg.align_corners, name='decoder')

        # patch-wise identity bank (reference aot.py:64-83): one-hot mask
        # [B,H,W,id_dim] -> [B,H/16,W/16,d]; orthogonal init with gain k^-2
        # (reference aot.py:170-177)
        k = 17 if cfg.align_corners else 16
        pad = 8 if cfg.align_corners else 0
        # space-to-depth: a 17x17/s16 conv on the 12-channel one-hot costs
        # ~520 us/frame at 480p (layout copies + 3-way conv split); the
        # s2d 2x2 block conv is one MXU matmul (same params, ops/s2d.py)
        self.patch_wise_id_bank = S2DConv(
            d, (k, k), strides=16, padding=pad,
            kernel_init=nn.initializers.orthogonal(scale=k ** -2,
                                                   column_axis=-1),
            name='patch_wise_id_bank')
        if self.is_deaot:
            self.id_norm = nn.LayerNorm(epsilon=EPS, name='id_norm')

        if cfg.use_temporal_pe:
            pe_dim = d // 2 if self.is_deaot else d
            slots = 4 if cfg.temporal_pe_slot_4 else 2
            init = nn.initializers.truncated_normal(stddev=0.05,
                                                    lower=-2.0, upper=2.0)
            self.cur_pos_emb = self.param('cur_pos_emb', init, (1, pe_dim))
            self.mem_pos_emb = self.param('mem_pos_emb', init,
                                          (slots, pe_dim))

    # --- reference AOT.encode_image (aot.py:116-134) ---
    def encode_image(self, img, mask=None):
        """mask: optional conditioning input for the mask-conditioned
        TopDown encoder (reference aot.py:115-129, USE_MASK/ORACLE path):
        an int label map [B, H, W, 1] is ignore-cleared (255 -> 0) and
        foreground-binarized; a float probability map [B, H, W, O+1]
        becomes 1 - P(background) (the dead PREV_PROBE shape). Anything
        else is the reference's "mask is not expected" error."""
        if self.cfg.use_mask and mask is not None:
            mask = jax.lax.stop_gradient(mask)
            if (mask.shape[-1] == 1
                    and jnp.issubdtype(mask.dtype, jnp.integer)):
                m = jnp.where(mask == 255, 0, mask)
                m = (m > 0).astype(img.dtype)
            elif (mask.shape[-1] > 1
                    and jnp.issubdtype(mask.dtype, jnp.floating)):
                m = 1.0 - mask[..., 0:1].astype(img.dtype)
            else:
                raise ValueError(
                    f'use_mask conditioning expects an int label '
                    f'[B,H,W,1] or float probabilities [B,H,W,O+1]; got '
                    f'{mask.dtype} {mask.shape} (reference aot.py:115-124)')
            xs = self.encoder(img, m)
        else:
            xs = self.encoder(img)
        xs[-1] = self.encoder_projector(xs[-1])
        return xs

    # --- reference AOT.get_id_emb (aot.py:111-114, deaot.py:65-69) ---
    def get_id_emb(self, one_hot, deterministic: bool = True,
                   pre_s2d=None):
        """one_hot: [B, H, W, id_dim] -> id tokens [B, HW/256, d].
        Train-time id dropout per aot.py:84, :113.

        pre_s2d=(H, W): one_hot is already the space-to-depth block layout
        [B, H/16, W/16, 256*id_dim] (built straight from the int label by
        ops/s2d.space_to_depth_label — the eval fast path that skips
        shuffling the 16x-larger one-hot tensor)."""
        id_emb = self.patch_wise_id_bank(one_hot, pre_s2d=pre_s2d)
        if self.is_deaot:
            id_emb = self.id_norm(id_emb)
        id_emb = tokens_from_2d(id_emb)
        if self.id_dropout > 0.0 and not deterministic:
            keep = 1.0 - self.id_dropout
            m = jax.random.bernoulli(self.make_rng('dropout'), keep,
                                     id_emb.shape)
            id_emb = id_emb * m / keep
        return id_emb

    def get_pos_emb(self, size_2d):
        d = self.cfg.encoder_embedding_dim
        pe = sine_position_embedding(size_2d[0], size_2d[1], d // 2)
        return pe.reshape(1, size_2d[0] * size_2d[1], d)

    def temporal_pe(self):
        if not self.cfg.use_temporal_pe:
            return None
        return self.cur_pos_emb, self.mem_pos_emb

    # --- reference AOT.LSTT_forward (aot.py:144-168) ---
    def lstt_forward(self, curr_emb_16x, long_mem, short_mem, curr_id_emb,
                     self_pos, size_2d, temporal_pe=None,
                     need_mass: bool = False, deterministic: bool = True):
        tgt = tokens_from_2d(curr_emb_16x)
        return self.lstt(tgt, long_mem, short_mem, curr_id_emb, self_pos,
                         size_2d, temporal_pe, need_mass=need_mass,
                         deterministic=deterministic)

    # --- reference AOT.decode_id_logits (aot.py:136-142) ---
    def decode_id_logits(self, lstt_intermediates, shortcuts):
        b, h, w, _ = shortcuts[-1].shape
        decoder_inputs = [shortcuts[-1]]
        for emb in lstt_intermediates:
            decoder_inputs.append(emb.reshape(b, h, w, -1))
        return self.decoder(decoder_inputs, shortcuts)

    # --- id-fusion at memory-update time ---
    def fuse_memory_values(self, memories, id_emb):
        """Apply the per-layer value-fusion projections to the pending
        memories captured at propagation time.

        AOT (reference transformer.py:276-299): long V = linear_V(curr_v+id),
        short V = linear_VMem(local_v+id).
        DeAOT (reference transformer.py:833-848): ID_V = fuse_value_id.
        Returns per-layer dicts ready for bank append / short-term push.
        """
        fused = []
        for idx, mems in enumerate(memories):
            block = self.lstt.blocks[idx]
            if self.is_deaot:
                id_v = block.fuse_value_id(mems['curr_id_v'], id_emb)
                fused.append(dict(long_k=mems['curr_k'],
                                  long_v=mems['curr_v'], long_id_v=id_v,
                                  short_k=mems['curr_k'],
                                  short_v=mems['curr_v'], short_id_v=id_v))
            else:
                long_v = block.fuse_curr_value(mems['curr_v'], id_emb)
                short_v = block.fuse_local_value(mems['local_v'], id_emb)
                fused.append(dict(long_k=mems['curr_k'], long_v=long_v,
                                  long_id_v=None, short_k=mems['local_k'],
                                  short_v=short_v, short_id_v=None))
        return fused

    def compress_evicted_slots(self, k_slots, v_slots, hidden_k, hidden_v,
                               size_2d):
        """GRU-compress evicted (K, V) slots per layer (AOT GRU_MEMORY)."""
        outs_k, outs_v, hks, hvs = [], [], [], []
        for idx in range(self.cfg.lstt_num):
            block = self.lstt.blocks[idx]
            (ok, ov), (hk, hv) = block.compress_evicted(
                k_slots[idx], v_slots[idx], hidden_k[idx], hidden_v[idx],
                size_2d)
            outs_k.append(ok)
            outs_v.append(ov)
            hks.append(hk)
            hvs.append(hv)
        return ((tuple(outs_k), tuple(outs_v)),
                (tuple(hks), tuple(hvs)))

    def __call__(self, img, one_hot_mask_ref):
        """Initialization-only path: touches every submodule so
        `model.init` creates the full parameter tree."""
        xs = self.encode_image(img)
        b, h, w, _ = xs[-1].shape
        size_2d = (h, w)
        id_emb = self.get_id_emb(one_hot_mask_ref)
        self_pos = self.get_pos_emb(size_2d)
        tpe = self.temporal_pe()
        inters, mems, _ = self.lstt_forward(
            xs[-1], None, None, id_emb, self_pos, size_2d, temporal_pe=tpe)
        logits = self.decode_id_logits(inters, xs)
        fused = self.fuse_memory_values(mems, id_emb)
        if (not self.is_deaot) and self.cfg.gru_memory:
            k0 = jnp.stack([f['long_k'] for f in fused])
            v0 = jnp.stack([f['long_v'] for f in fused])
            self.compress_evicted_slots(k0, v0, jnp.zeros_like(k0),
                                        jnp.zeros_like(v0), size_2d)
        return logits


def build_vos_model(cfg: ModelConfig, exp=None) -> VOSModel:
    """exp (ExpConfig) supplies the train-time droppath/dropout rates
    (train_lstt_droppath, train_lstt_droppath_scaling,
    train_lstt_emb_dropout); without it the reference defaults apply."""
    if exp is None:
        return VOSModel(cfg)
    return VOSModel(cfg, droppath=exp.train_lstt_droppath,
                    droppath_scaling=exp.train_lstt_droppath_scaling,
                    emb_dropout=exp.train_lstt_emb_dropout,
                    id_dropout=exp.train_lstt_id_dropout,
                    lt_dropout=exp.train_lstt_lt_dropout,
                    st_dropout=exp.train_lstt_st_dropout,
                    droppath_lst=exp.train_lstt_droppath_lst)
