"""Attention primitives.

Token layout: [B, L, C]. All three attention flavours of the reference are
here (aot_plus/networks/layers/attention.py):

- MultiheadAttention (:8-86)   — LSTT self / long-term / short-term attention.
- GatedPropagation (:93-216)   — DeAOT's gated attention (SiLU-gated values,
  depthwise-conv output path).
- LocalGatedPropagation (:220-413) — DeAOT's 15x15 windowed short-term
  attention. The reference materializes an unfolded [ws*ws, HW] key tensor
  (pad_and_unfold, :404-413) and then scatters the local attention into a full
  [HW, HW] matrix (:363-402). Here it is one dense attention over the *padded*
  key grid ([HW, Hp*Wp] logits) with a constant window mask and a gathered
  relative-position bias — two MXU matmuls plus one gather, no scatter, same
  numerics (out-of-window logits get -1e8 exactly like the reference mask).
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e8


def split_heads(x, num_heads: int):
    b, l, c = x.shape
    return x.reshape(b, l, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x):
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def _maybe_compact_logits(logits, in_dtype):
    """Round materialized attention logits/probs to bf16 whenever the
    inputs are bf16: the softmax chain reads the [Lq, Lk] logits ~3x
    (max, exp+sum, div) and at DeAOT eval shapes the f32 bank logits are
    34 MB/layer — the dominant non-MXU HBM term of the frame; at the
    465 2 train recipe the local-attn probs alone are 56 MB/layer/frame
    in forward AND rematerialized backward (27% of the step, round-4
    train census). The softmax arithmetic stays float32 (upcast below);
    only the storage rounds, bounding the error at bf16 epsilon —
    standard practice for bf16 attention (flash-attention stores probs
    in the compute dtype). f32 paths are unchanged (exact reference
    parity; the amp reference keeps f32 softmax under autocast, a
    documented deviation). RMEM_BF16_PROBS=0 restores f32 logit/prob
    storage on bf16 inputs — the escape hatch for A/B-ing the deviation
    against the reference's autocast numerics (round-4 advisor)."""
    if os.environ.get('RMEM_BF16_PROBS', '1') in ('0', 'false', 'False'):
        return logits
    if in_dtype == jnp.bfloat16 and logits.dtype != in_dtype:
        return logits.astype(jnp.bfloat16)
    return logits


def _softmax_f32(logits, axis=-1):
    """Softmax with float32 reduction arithmetic regardless of storage."""
    return jax.nn.softmax(logits.astype(jnp.float32), axis=axis)


def _qk_out_dtype(in_dtype):
    """Output dtype for the QK logits matmul. On bf16 inputs the MXU
    accumulates in f32 and rounds ONCE on write; emitting f32 and
    compacting afterwards costs a full extra read+write pass over the
    logits (a 271 MB convert at 8-stream eval shapes — round-4 HLO
    census). Exactly the `_maybe_compact_logits` rounding, applied at
    the producer. f32 paths keep f32 storage; RMEM_BF16_PROBS=0 restores
    f32 emission on bf16 inputs too (see _maybe_compact_logits)."""
    if os.environ.get('RMEM_BF16_PROBS', '1') in ('0', 'false', 'False'):
        return jnp.float32
    return jnp.bfloat16 if in_dtype == jnp.bfloat16 else jnp.float32


def scaled_dot_attention(q, k, v, num_heads: int, scale: Optional[float] = None,
                         key_bias=None, return_probs: bool = False,
                         dropout_rate: float = 0.0, dropout_rng=None,
                         mass_capacity: Optional[int] = None):
    """q: [B, Lq, H*Dq], k: [B, Lk, H*Dq], v: [B, Lk, H*Dv].

    scale defaults to 1/sqrt(Dq). key_bias: broadcastable to [B, H, Lq, Lk],
    added to logits before softmax. dropout_rate > 0 with an rng applies
    train-time dropout to the attention probabilities (reference
    attention.py:61 / the SDPA dropout_p at :66-72).
    Returns (out [B, Lq, H*Dv], aux) where aux is the per-slot eviction
    mass [B, Lq, T] when mass_capacity=T is given (reduced in place so the
    [B, H, Lq, Lk] float32 probs never escape the softmax fusion —
    numerics identical to frame_mass_from_probs), else the full probs
    when return_probs, else None.
    """
    qh = split_heads(q, num_heads)
    kh = split_heads(k, num_heads)
    vh = split_heads(v, num_heads)
    if scale is None:
        scale = qh.shape[-1] ** -0.5
    logits = jnp.einsum('bhqd,bhkd->bhqk', qh * scale, kh,
                        preferred_element_type=_qk_out_dtype(q.dtype))
    if key_bias is not None:
        logits = logits + key_bias.astype(logits.dtype)
    logits = _maybe_compact_logits(logits, q.dtype)
    probs = _softmax_f32(logits, axis=-1)
    # bf16 storage for the materialized probs on the bf16 eval path (see
    # multi_value_call): PV dots cast to bf16 anyway, mass re-accumulates
    # in f32; halves the largest per-layer HBM array of the frame step.
    probs = _maybe_compact_logits(probs, q.dtype)
    attn = probs
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = 1.0 - dropout_rate
        attn = probs * jax.random.bernoulli(dropout_rng, keep,
                                            probs.shape) / keep
    out = jnp.einsum('bhqk,bhkd->bhqd', attn.astype(vh.dtype), vh,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    out = merge_heads(out)
    if mass_capacity is not None:
        # head-mean of per-slot mass as a matmul over a [K, T]
        # block-indicator (see multi_value_call): reads the materialized
        # probs once in the PV layout, f32 accumulation on the MXU
        b, h, nq, nk = probs.shape
        ind = jnp.repeat(jnp.eye(mass_capacity, dtype=probs.dtype),
                         nk // mass_capacity, axis=0)
        mass = jnp.einsum('bhqk,kt->bqt', probs, ind,
                          preferred_element_type=jnp.float32) / h
        return out, mass
    return (out, probs) if return_probs else (out, None)


def pallas_memory_read_enabled() -> bool:
    """Use the fused Pallas bank-attention kernel for long-term reads.
    Defaults to on only for the real 'tpu' backend; override with
    RMEM_PALLAS=0/1.

    Round-4 measurements on this machine's tunneled v5e ('axon'
    platform), after the bf16-probs/QK rewrite of the XLA path: the
    kernel wins scan-chained THROUGHPUT — 1.13x end-to-end at 3532
    (bench.py --pallas_ab: 592 vs 525 fps, eviction ids bit-identical)
    and +5% at 8-stream 480p serving (587.8 vs 560.6 aggregate fps),
    a wash at single-stream 480p (545 vs 550). But per-DISPATCH latency
    through the axon runtime is 2.8x worse (p50 5.0 ms vs 1.8 ms) —
    an axon custom-call launch overhead that a scan amortizes and an
    interactive caller pays per frame. Hence: default on for real tpu
    (throughput and latency both fine there, ~2 us/grid-step,
    pallas_guide.md), off for axon."""
    import os
    env = os.environ.get('RMEM_PALLAS')
    if env is not None:
        return env not in ('0', 'false', 'False')
    import jax
    # the axon plugin reports default_backend()=='tpu' but runs Pallas
    # grid steps ~40x slower than XLA ops; detect it via the forced
    # platform list ('axon,cpu') and keep the kernel off there
    if 'axon' in str(jax.config.jax_platforms or ''):
        return False
    return jax.default_backend() == 'tpu'


class MultiheadAttention(nn.Module):
    """Reference: attention.py:8-86. use_linear controls Q/K/V projections;
    the output projection always exists."""
    d_model: int
    num_heads: int = 8
    dropout: float = 0.0
    use_linear: bool = True

    def setup(self):
        if self.use_linear:
            self.linear_Q = nn.Dense(self.d_model)
            self.linear_K = nn.Dense(self.d_model)
            self.linear_V = nn.Dense(self.d_model)
        self.projection = nn.Dense(self.d_model)

    def __call__(self, q, k, v, key_bias=None, return_probs: bool = False,
                 mass_capacity: Optional[int] = None,
                 deterministic: bool = True):
        if self.use_linear:
            q = self.linear_Q(q)
            k = self.linear_K(k)
            v = self.linear_V(v)
        drng = (self.make_rng('dropout')
                if self.dropout > 0.0 and not deterministic else None)
        out, aux = scaled_dot_attention(q, k, v, self.num_heads,
                                        key_bias=key_bias,
                                        return_probs=return_probs,
                                        dropout_rate=self.dropout,
                                        dropout_rng=drng,
                                        mass_capacity=mass_capacity)
        return self.projection(out), aux

    def bank_read(self, q, k_bank, v_bank, valid, mem_pe=None,
                  want_mass: bool = True):
        """Fused Pallas memory read: k_bank/v_bank [B, T, HW, C],
        valid [B, T] bool (live physical slots), mem_pe optional
        [B|1, T, C] temporal PE (applied to keys inside the kernel).
        Returns (projected out, mass [B, HWq, T])."""
        from rmem_ocu_tpu.ops.pallas.memory_read import memory_read_fused
        scale = (self.d_model // self.num_heads) ** -0.5
        (raw,), mass = memory_read_fused(q, k_bank, (v_bank,), valid,
                                         self.num_heads, scale,
                                         mem_pe=mem_pe)
        return self.projection(raw.astype(q.dtype)), mass


class GatedPropagation(nn.Module):
    """DeAOT gated attention (reference: attention.py:93-216).

    d_vu is the *un-expanded* value/gate dim; values are expanded by
    expand_ratio and gated with SiLU(U) after aggregation.
    """
    d_qk: int
    d_vu: int
    num_heads: int = 8
    d_att: Optional[int] = None
    expand_ratio: float = 2.0
    use_linear: bool = True
    dropout: float = 0.0

    def setup(self):
        from rmem_ocu_tpu.ops.layers import DWConv2d
        self.expand_d_vu = int(self.d_vu * self.expand_ratio)
        self.hidden = self.expand_d_vu // self.num_heads
        self.att_dim = (self.d_qk // self.num_heads if self.d_att is None
                        else self.d_att)
        if self.use_linear:
            self.linear_QK = nn.Dense(self.att_dim * self.num_heads)
            half = self.hidden * self.num_heads // 2
            self.linear_V1 = nn.Dense(half)
            self.linear_V2 = nn.Dense(half)
            self.linear_U1 = nn.Dense(half)
            self.linear_U2 = nn.Dense(half)
        self.dw_conv = DWConv2d(self.expand_d_vu)
        self.projection = nn.Dense(self.d_vu)

    def _project_inputs(self, q, v, u):
        half = self.hidden * self.num_heads // 2

        def cat_half(x1, x2):
            # interleave per head (reference attention.py:154-162)
            if self.num_heads > 1:
                b, l, _ = x1.shape
                x1 = x1.reshape(b, l, self.num_heads, half // self.num_heads)
                x2 = x2.reshape(b, l, self.num_heads, half // self.num_heads)
                return jnp.concatenate([x1, x2], -1).reshape(b, l, -1)
            return jnp.concatenate([x1, x2], -1)

        q = self.linear_QK(q)
        v1, v2 = jnp.split(v, 2, axis=-1)
        v = jax.nn.silu(cat_half(self.linear_V1(v1), self.linear_V2(v2)))
        u1, u2 = jnp.split(u, 2, axis=-1)
        u = jax.nn.silu(cat_half(self.linear_U1(u1), self.linear_U2(u2)))
        return q, v, u

    def _gate_and_project(self, out, u, size_2d, deterministic):
        out = out * u
        out = self.dw_conv(out, size_2d, deterministic)
        return self.projection(out)

    def __call__(self, q, k, v, u, size_2d: Tuple[int, int], key_bias=None,
                 return_probs: bool = False, deterministic: bool = True):
        if self.use_linear:
            q, v, u = self._project_inputs(q, v, u)
            k = q
        drng = (self.make_rng('dropout')
                if self.dropout > 0.0 and not deterministic else None)
        out, probs = scaled_dot_attention(q, k, v, self.num_heads,
                                          scale=self.att_dim ** -0.5,
                                          key_bias=key_bias,
                                          return_probs=return_probs,
                                          dropout_rate=self.dropout,
                                          dropout_rng=drng,
                                          )
        out = self._gate_and_project(out, u, size_2d, deterministic)
        return out, probs

    def multi_value_call(self, q, k, vs, u, size_2d, key_bias=None,
                         return_probs: bool = False,
                         mass_capacity: Optional[int] = None,
                         deterministic: bool = True):
        """Single-head gated attention sharing ONE probability matrix across
        several value banks: returns concat_i(P @ vs[i]) gated+projected.

        Element-identical to `__call__(q, k, concat(vs), ...)` when
        num_heads == 1 (each output channel contracts over exactly one
        bank), but skips materializing the bank-sized value concat — at
        DeAOT eval shapes that concat is [B, T*HW, 2E] ≈ 19 MB of HBM
        write+read per layer per frame (59 MB at the train recipe shape),
        pure layout traffic. Reference semantics: transformer.py:1183
        concatenates V and ID_V before one GatedPropagation call."""
        assert self.num_heads == 1, 'shared-probs split requires one head'
        scale = self.att_dim ** -0.5
        logits = jnp.einsum('bqd,bkd->bqk', q * scale, k,
                            preferred_element_type=_qk_out_dtype(q.dtype))
        if key_bias is not None:
            # [B, 1, 1, K] (bank_key_bias layout) or broadcastable
            logits = logits + key_bias.reshape(
                key_bias.shape[0], 1, -1).astype(logits.dtype)
        logits = _maybe_compact_logits(logits, q.dtype)
        probs = _softmax_f32(logits, axis=-1)
        # round the MATERIALIZED probs to bf16 on the bf16 eval path: the
        # [B, Q, K] f32 probs is the frame's largest HBM array (34 MB per
        # layer at 480p B=1; 271 MB at 8 streams, where its write + layout
        # copy + reads dominate the super-linear stream-scaling term —
        # round-4 HLO census). Both consumers tolerate bf16 storage: the
        # PV dots cast to bf16 anyway and the eviction mass re-accumulates
        # in f32 below. f32/training paths unchanged (reference parity).
        probs = _maybe_compact_logits(probs, q.dtype)
        attn = probs
        if self.dropout > 0.0 and not deterministic:
            keep = 1.0 - self.dropout
            attn = probs * jax.random.bernoulli(
                self.make_rng('dropout'), keep, probs.shape) / keep
        attn = attn.astype(vs[0].dtype)
        out = jnp.concatenate(
            [jnp.einsum('bqk,bkd->bqd', attn, v,
                        preferred_element_type=jnp.float32).astype(v.dtype)
             for v in vs], axis=-1)
        out = self._gate_and_project(out, u, size_2d, deterministic)
        if mass_capacity is not None:
            # per-slot attention mass for RMem eviction (numerics:
            # frame_mass_from_probs on a 1-head probs tensor, f32
            # accumulation). Computed as a matmul against a [K, T]
            # block-indicator so the MXU reads the materialized probs in
            # the PV dots' layout: the reshape+reduce form forced XLA to
            # materialize an f32 CONVERT of the whole [B, Q, K] probs
            # plus a layout copy (271 MB each at 8 streams — the largest
            # super-linear stream-scaling term, round-4 HLO census).
            b, nq, nk = probs.shape
            ind = jnp.repeat(jnp.eye(mass_capacity, dtype=probs.dtype),
                             nk // mass_capacity, axis=0)
            mass = jnp.einsum('bqk,kt->bqt', probs, ind,
                              preferred_element_type=jnp.float32)
            return out, mass
        return out, (probs[:, None] if return_probs else None)

    def bank_read(self, q, k_bank, v_bank, id_v_bank, u, valid, size_2d,
                  mem_pe=None, deterministic: bool = True):
        """Fused Pallas memory read (use_linear=False path):
        k_bank [B,T,HW,Datt], v_bank/id_v_bank [B,T,HW,E] (DeAOT's value /
        id-value halves — concatenated channel-wise by the reference,
        transformer.py:1183), mem_pe optional [B|1, T, Datt].
        Returns (out, mass)."""
        from rmem_ocu_tpu.ops.pallas.memory_read import (memory_read_fused,
                                                         memory_read_multihead)
        scale = self.att_dim ** -0.5
        if self.num_heads == 1:
            # single head: the concatenated V‖ID_V shares one probability
            # matrix, so the two banks read separately (no bank-sized concat)
            (o_v, o_id), mass = memory_read_fused(
                q, k_bank, (v_bank, id_v_bank), valid, 1, scale,
                mem_pe=mem_pe)
            raw = jnp.concatenate([o_v, o_id], axis=-1)
        else:
            # multi-head: head i of the concatenation straddles the halves
            # differently; keep the generic folded path
            if mem_pe is not None:
                k_bank = k_bank + mem_pe[:, :, None, :].astype(k_bank.dtype)
            cat_v = jnp.concatenate([v_bank, id_v_bank], axis=-1)
            raw, mass = memory_read_multihead(q, k_bank, cat_v, valid,
                                              self.num_heads, scale)
        out = self._gate_and_project(raw.astype(q.dtype), u, size_2d,
                                     deterministic)
        return out, mass


@functools.lru_cache(maxsize=32)
def _local_window_maps(h: int, w: int, max_dis: int):
    """Constant maps for windowed attention over the padded key grid.

    Returns (mask [HW, HpWp] bool — key inside the query's window,
             rel_idx [HW, HpWp] int32 — window-offset index j in [0, ws*ws)
             for in-window pairs, ws*ws (sentinel -> zero bias) elsewhere).
    """
    ws = 2 * max_dis + 1
    hp, wp = h + 2 * max_dis, w + 2 * max_dis
    qy, qx = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    ky, kx = np.meshgrid(np.arange(hp), np.arange(wp), indexing='ij')
    # offset of padded key relative to query, in window coords [0, ws)
    dy = ky.reshape(1, -1) - qy.reshape(-1, 1)          # [HW, HpWp]
    dx = kx.reshape(1, -1) - qx.reshape(-1, 1)
    inside = (dy >= 0) & (dy < ws) & (dx >= 0) & (dx < ws)
    # padded (out-of-image) keys are masked even inside the window, exactly
    # like the reference's qk_mask (attention.py:305-312, 344)
    in_image = ((ky.reshape(1, -1) >= max_dis) & (ky.reshape(1, -1) < h + max_dis)
                & (kx.reshape(1, -1) >= max_dis)
                & (kx.reshape(1, -1) < w + max_dis))
    rel = np.where(inside, dy * ws + dx, ws * ws)
    return inside & in_image, rel.astype(np.int32)


def _skew(a):
    """[..., Q, W] -> [..., Q, Q+W-1] with out[..., q, q+d] = a[..., q, d],
    zeros elsewhere (Music-Transformer relative-position skew: pad each row
    by Q, flatten, trim, reshape — the row stride shrinks by one so row q
    lands shifted by q)."""
    *lead, q_len, w_len = a.shape
    a = jnp.pad(a, [(0, 0)] * len(lead) + [(0, 0), (0, q_len)])
    a = a.reshape(*lead, q_len * (q_len + w_len))
    a = a[..., :q_len * (q_len + w_len - 1)]
    return a.reshape(*lead, q_len, q_len + w_len - 1)


def _scatter_bias_to_padded_grid(rel, h: int, w: int, ws: int):
    """Same map as _skew_bias_to_padded_grid, computed as two static
    one-hot batched matmuls instead of pad/reshape/transpose: the scatter
    index is SEPARABLE (kyp = qy + dy, kxp = qx + dx), so

        bias[b,n,qy,qx,kyp,kxp]
            = sum_{dy,dx} rel6[b,n,qy,qx,dy,dx] A[qy,dy,kyp] B[qx,dx,kxp]

    with A/B 0/1 operands. Exactly one product per output is nonzero, so
    the result is identical (up to the MXU's operand precision). The skew
    formulation materializes three 6-D transposes with (23, 15)-ish minor
    dims that XLA executes as ~20 GB/s tiny-tile layout copies (~150 us
    each per layer on v5e); the one-hot dots are a few us of (padded) MXU
    work and fuse cleanly."""
    b, nh = rel.shape[:2]
    hp, wp = h + ws - 1, w + ws - 1
    dt = rel.dtype
    A = (np.arange(hp)[None, None, :]
         == np.arange(h)[:, None, None] + np.arange(ws)[None, :, None])
    B = (np.arange(wp)[None, None, :]
         == np.arange(w)[:, None, None] + np.arange(ws)[None, :, None])
    A = jnp.asarray(A, dt)                   # [h, ws, hp]
    B = jnp.asarray(B, dt)                   # [w, ws, wp]
    r = rel.reshape(b, nh, h, w, ws, ws)
    r = jnp.einsum('bnyxde,xek->bnyxdk', r, B)   # scatter dx -> kxp
    r = jnp.einsum('bnyxdk,ydm->bnyxmk', r, A)   # scatter dy -> kyp
    return r.reshape(b, nh, h * w, hp * wp)


def _skew_bias_to_padded_grid(rel, h: int, w: int, ws: int):
    """rel [B, H, h*w, ws*ws] (per-query window bias, row-major dy, dx) ->
    bias [B, H, h*w, Hp*Wp] over the padded key grid, where
    bias[q=(qy,qx), k=(kyp,kxp)] = rel[q, (kyp-qy)*ws + (kxp-qx)] inside the
    window and 0 outside (Hp = h+ws-1, Wp = w+ws-1). Equivalent to a
    take_along_axis gather but built from two axis-wise skews — pure
    pad/reshape/transpose, no gather op."""
    b, nh = rel.shape[:2]
    r = rel.reshape(b, nh, h, w, ws, ws)
    r = r.transpose(0, 1, 2, 4, 3, 5)        # [B,H,qy,dy,qx,dx]
    r = _skew(r)                             # [B,H,qy,dy,qx,kxp]
    r = r.transpose(0, 1, 4, 5, 2, 3)        # [B,H,qx,kxp,qy,dy]
    r = _skew(r)                             # [B,H,qx,kxp,qy,kyp]
    r = r.transpose(0, 1, 4, 2, 5, 3)        # [B,H,qy,qx,kyp,kxp]
    return r.reshape(b, nh, h * w, (h + ws - 1) * (w + ws - 1))


@functools.lru_cache(maxsize=32)
def _banded_maps(h: int, w: int, max_dis: int, br: int):
    """Constant tables for the 2D block-banded windowed attention.

    Queries are tiled into br x br blocks; block (iy, ix) attends only its
    key BAND — padded-grid rows [iy*br, iy*br + br + 2*max_dis) x cols
    [ix*br, ...) — which covers every query's full window, so a softmax
    over the band with out-of-window keys masked is numerically identical
    to the dense padded-grid form (the extra keys get exp(-1e8-max) = 0.0
    exactly). Returns:
      A [br, ws, band]  one-hot: band row  = local qy + dy
      B [br, ws, band]  one-hot: band col  = local qx + dx
      mask [nby*nbx, br*br, band*band] bool: in-window AND in-image AND
           real (non-padded) query/key — the block-position-dependent part
    """
    ws = 2 * max_dis + 1
    band = br + 2 * max_dis
    nby, nbx = -(-h // br), -(-w // br)
    lq = np.arange(br)
    dd = np.arange(ws)
    A = (np.arange(band)[None, None, :] ==
         lq[:, None, None] + dd[None, :, None])
    # window membership per (local q, local k) — band origin == block
    # origin in padded coords, so offsets are block-independent
    lk = np.arange(band)
    iny = (lk[None, :] - lq[:, None] >= 0) & (lk[None, :] - lq[:, None] < ws)
    masks = []
    for iy in range(nby):
        for ix in range(nbx):
            # image coords of band rows/cols: padded row iy*br + m maps to
            # image row iy*br + m - max_dis
            my = iy * br + lk - max_dis
            mx = ix * br + lk - max_dis
            ky_ok = (my >= 0) & (my < h)
            kx_ok = (mx >= 0) & (mx < w)
            qy_ok = iy * br + lq < h
            qx_ok = ix * br + lq < w
            myx = (iny[:, None, :, None] & iny[None, :, None, :]
                   & (ky_ok[None, None, :, None] & kx_ok[None, None, None, :])
                   & (qy_ok[:, None, None, None] & qx_ok[None, :, None, None]))
            masks.append(myx.reshape(br * br, band * band))
    # the same one-hot serves both axes (band idx = local q + d)
    return A.astype(np.float32), np.stack(masks)


def _band_blocks(x2d, br: int, max_dis: int, nby: int, nbx: int):
    """[B, Hp2, Wp2, C] padded grid -> [B, nby*nbx, band*band, C] key
    bands via static slices (trivial layouts; no gather/scatter)."""
    band = br + 2 * max_dis
    ys = jnp.stack([x2d[:, iy * br: iy * br + band] for iy in range(nby)],
                   axis=1)                       # [B, nby, band, Wp2, C]
    xs = jnp.stack([ys[:, :, :, ix * br: ix * br + band]
                    for ix in range(nbx)], axis=2)
    b = x2d.shape[0]
    return xs.reshape(b, nby * nbx, band * band, x2d.shape[-1])


class LocalGatedPropagation(nn.Module):
    """15x15 windowed gated attention (reference: attention.py:220-413).

    Two numerically identical attention cores (RMEM_LOCAL_ATTN):
    - 'dense' (default): one attention over the padded key grid
      ([HW, Hp*Wp] logits with a constant window mask), bf16 bias chain
      and probs storage on bf16 inputs.
    - 'banded': 8x8 query blocks x (8+14)^2 key bands — shrinks every
      probs-sized tensor and the bias-scatter operands ~4x, but measured
      SLOWER at the train recipe because the band stacking must copy the
      [HpWp, 1024] value tensor ~4x (see _banded_core and the selection
      comment in __call__); kept as the documented negative result and
      the numerics blueprint for a future fused kernel.
    """
    d_qk: int
    d_vu: int
    num_heads: int
    max_dis: int = 7
    dilation: int = 1
    d_att: Optional[int] = None
    expand_ratio: float = 2.0
    use_linear: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, q, k, v, u, size_2d: Tuple[int, int],
                 deterministic: bool = True):
        from rmem_ocu_tpu.ops.layers import DWConv2d, tokens_to_2d
        assert self.dilation == 1, 'dilated local attention not implemented'
        h, w = size_2d
        ws = 2 * self.max_dis + 1
        expand_d_vu = int(self.d_vu * self.expand_ratio)
        hidden = expand_d_vu // self.num_heads
        d_att = (self.d_qk // self.num_heads if self.d_att is None
                 else self.d_att)
        b = q.shape[0]

        if self.use_linear:
            # reference uses 1x1 convs; on tokens these are Dense layers
            q = k = nn.Dense(d_att * self.num_heads, name='linear_QK')(q)
            # grouped (groups=2) 1x1 convs on the two value halves
            v1, v2 = jnp.split(v, 2, axis=-1)
            v = jnp.concatenate([
                nn.Dense(expand_d_vu // 2, name='linear_V1')(v1),
                nn.Dense(expand_d_vu // 2, name='linear_V2')(v2)], -1)
            v = jax.nn.silu(v)
            u1, u2 = jnp.split(u, 2, axis=-1)
            u = jnp.concatenate([
                nn.Dense(expand_d_vu // 2, name='linear_U1')(u1),
                nn.Dense(expand_d_vu // 2, name='linear_U2')(u2)], -1)
            u = jax.nn.silu(u)
            if self.num_heads > 1:
                # interleave halves per head (reference attention.py:297-303)
                def interleave(x):
                    x = x.reshape(b, h * w, 2, self.num_heads, hidden // 2)
                    return x.transpose(0, 1, 3, 2, 4).reshape(b, h * w, -1)
                v = interleave(v)
                u = interleave(u)

        # learned relative position bias from q (grouped 1x1 conv with
        # groups=num_heads, reference attention.py:260-264, 314): head i's
        # bias reads only head i's query channels.
        rel_w = self.param('relative_emb_k_w', nn.initializers.lecun_normal(),
                           (self.num_heads, d_att, ws * ws))
        rel_b = self.param('relative_emb_k_b', nn.initializers.zeros,
                           (self.num_heads, ws * ws))
        qg = q.reshape(b, h * w, self.num_heads, d_att)
        rel = jnp.einsum('blhd,hdj->bhlj', qg, rel_w) + rel_b[None, :, None]

        # Core selection (RMEM_LOCAL_ATTN=dense|banded|pallas overrides):
        # - 'pallas' (auto-default on real tpu, 1-head eval): the fused
        #   row-band kernel — padded k/v stay VMEM-resident, band
        #   logits/probs never touch HBM (ops/pallas/local_attn.py).
        # - 'dense' (auto-default otherwise): the padded-grid XLA form.
        # - 'banded': the 2D block-banded XLA core — a measured NEGATIVE
        #   result kept for A/B and as the record of why: XLA must COPY
        #   the [HpWp, 1024] value tensor ~4x to build bands
        #   (concatenate copies ~60 ms/step; banded 897.5 vs dense 849.5
        #   ms/step at the train recipe), which outweighs the 4x shrink
        #   of every probs-sized tensor — exactly what the Pallas kernel
        #   avoids by slicing bands from the resident grid.
        mode = os.environ.get('RMEM_LOCAL_ATTN', 'auto')
        if mode == 'auto':
            mode = ('pallas' if (self.num_heads == 1 and deterministic
                                 and pallas_memory_read_enabled())
                    else 'dense')
        if mode == 'pallas' and self.num_heads == 1 and deterministic:
            out = self._pallas_core(q, k, v, rel, size_2d, d_att)
        elif mode == 'banded':
            out = self._banded_core(q, k, v, rel, size_2d, d_att,
                                    deterministic)
        else:
            out = self._dense_core(q, k, v, rel, size_2d, d_att,
                                   deterministic)
        out = out * u
        out = DWConv2d(expand_d_vu, name='dw_conv')(out, size_2d,
                                                    deterministic)
        out = nn.Dense(self.d_vu, name='projection')(out)
        return out, None

    def _maybe_drop_probs(self, probs, deterministic):
        if self.dropout > 0.0 and not deterministic:
            # train-time dropout on the local attention probabilities
            # (reference attention.py:348)
            keep = 1.0 - self.dropout
            probs = probs * jax.random.bernoulli(
                self.make_rng('dropout'), keep, probs.shape) / keep
        return probs

    def _dense_core(self, q, k, v, rel, size_2d, d_att, deterministic):
        """Padded-grid form: [HW, Hp*Wp] logits with a window mask and a
        scattered bias (kept for A/B — RMEM_LOCAL_ATTN=dense)."""
        from rmem_ocu_tpu.ops.layers import tokens_to_2d
        h, w = size_2d
        ws = 2 * self.max_dis + 1
        b = q.shape[0]
        mask_np, _ = _local_window_maps(h, w, self.max_dis)
        mask = jnp.asarray(mask_np)

        pad = [(0, 0), (self.max_dis, self.max_dis),
               (self.max_dis, self.max_dis), (0, 0)]
        k2 = jnp.pad(tokens_to_2d(k, size_2d), pad)
        v2 = jnp.pad(tokens_to_2d(v, size_2d), pad)
        hp, wp = h + 2 * self.max_dis, w + 2 * self.max_dis
        kp = k2.reshape(b, hp * wp, -1)
        vp = v2.reshape(b, hp * wp, -1)

        qh = split_heads(q, self.num_heads) * (d_att ** -0.5)
        kh = split_heads(kp, self.num_heads)
        vh = split_heads(vp, self.num_heads)
        logits = jnp.einsum('bhqd,bhkd->bhqk', qh, kh,
                            preferred_element_type=_qk_out_dtype(q.dtype))
        # Scatter the per-query [ws*ws] bias onto the padded key grid. A
        # per-pair gather costs ~18 ms/layer on TPU (scalar loads); the
        # separable one-hot matmul scatter beats the skew's 6-D transpose
        # copies (~150 us/layer each). RMEM_LOCAL_BIAS=skew keeps the old
        # pad/reshape path for A/B.
        # (A bf16 bias-scatter chain was A/B'd in round 5 — wall-time
        # neutral at the train recipe, 849.1 vs 849.5 ms/step, so the f32
        # chain stays: the cost is the exotic 6-D einsums' layout
        # assignment, not the dtype width.)
        if os.environ.get('RMEM_LOCAL_BIAS', 'scatter') == 'skew':
            bias = _skew_bias_to_padded_grid(rel, h, w, ws)
        else:
            bias = _scatter_bias_to_padded_grid(rel, h, w, ws)
        extra = bias + jnp.where(mask, 0.0, NEG_INF).astype(bias.dtype)
        logits = logits + extra.astype(logits.dtype)
        logits = _maybe_compact_logits(logits, q.dtype)
        probs = _softmax_f32(logits, axis=-1)
        # bf16 probs storage (same policy as the bank read): the f32
        # probs would otherwise materialize ahead of the PV cast
        probs = _maybe_compact_logits(probs, q.dtype)
        probs = self._maybe_drop_probs(probs, deterministic)
        out = jnp.einsum('bhqk,bhkd->bhqd', probs.astype(vh.dtype), vh,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        return merge_heads(out)

    def _pallas_core(self, q, k, v, rel, size_2d, d_att, br: int = 8):
        """Fused row-band kernel (eval forward, num_heads == 1): see
        ops/pallas/local_attn.py. The bias is scattered OUTSIDE on the
        band layout (4x smaller than the dense padded grid) with the
        window/in-image mask folded in; in-kernel softmax over the band
        is numerically identical to the dense form."""
        from rmem_ocu_tpu.ops.layers import tokens_to_2d
        from rmem_ocu_tpu.ops.pallas.local_attn import (
            _band_mask_np, local_window_attention)
        h, w = size_2d
        md, ws = self.max_dis, 2 * self.max_dis + 1
        b = q.shape[0]
        nby = -(-h // br)
        hq = nby * br
        wp = w + 2 * md
        band = br + 2 * md

        pad2 = [(0, 0), (md, hq - h + md), (md, md), (0, 0)]
        kp = jnp.pad(tokens_to_2d(k, size_2d), pad2)
        vp = jnp.pad(tokens_to_2d(v, size_2d), pad2)
        kp = kp.reshape(b, (hq + 2 * md) * wp, -1)
        vp = vp.reshape(b, (hq + 2 * md) * wp, -1)
        q2 = jnp.pad(tokens_to_2d(q, size_2d),
                     [(0, 0), (0, hq - h), (0, 0), (0, 0)])
        qf = q2.reshape(b, hq * w, -1) * (d_att ** -0.5)

        # bias scatter on the ROW-BAND layout: x via the dense one-hot
        # (kxp = qx + dx), y per block via band row = local r + dy
        A_np, _ = _banded_maps(h, w, md, br)          # [br, ws, band]
        B_np = (np.arange(wp)[None, None, :]
                == np.arange(w)[:, None, None]
                + np.arange(ws)[None, :, None])
        A = jnp.asarray(A_np, jnp.float32)
        B = jnp.asarray(B_np, jnp.float32)
        rel2 = jnp.pad(rel[:, 0].reshape(b, h, w, ws * ws),
                       [(0, 0), (0, hq - h), (0, 0), (0, 0)])
        r6 = rel2.reshape(b, hq, w, ws, ws).astype(jnp.float32)
        r6 = jnp.einsum('byxde,xek->byxdk', r6, B)    # dx -> padded col
        r6 = r6.reshape(b, nby, br, w, ws, wp)
        r6 = jnp.einsum('bnrxdk,rdm->bnrxmk', r6, A)  # dy -> band row
        bias_band = (r6.reshape(b, nby, br * w, band * wp)
                     + jnp.asarray(_band_mask_np(h, w, md, br))[None])

        out = local_window_attention(qf, kp, vp, bias_band, h, w, md,
                                     br=br,
                                     precise=(q.dtype == jnp.float32))
        e = out.shape[-1]
        out = out.reshape(b, hq, w, e)[:, :h]
        return out.reshape(b, h * w, e)

    def _banded_core(self, q, k, v, rel, size_2d, d_att, deterministic,
                     br: int = 8):
        """2D block-banded form (default; see class docstring).

        Queries tile into br x br blocks; each block attends its
        (br+2*max_dis)^2 key band, which contains every query's full
        window, so the band softmax with out-of-window keys at -1e8 is
        numerically identical to the dense padded-grid form.
        """
        from rmem_ocu_tpu.ops.layers import tokens_to_2d
        h, w = size_2d
        md, ws = self.max_dis, 2 * self.max_dis + 1
        nh = self.num_heads
        b = q.shape[0]
        nby, nbx = -(-h // br), -(-w // br)
        nb, bq = nby * nbx, br * br
        band = br + 2 * md
        hq, wq = nby * br, nbx * br

        A_np, mask_np = _banded_maps(h, w, md, br)
        A = jnp.asarray(A_np)                         # [br, ws, band] f32
        mask = jnp.asarray(mask_np)                   # [nb, bq, band^2]

        def blk_q(x):
            """[B, HW, C] query-grid tokens -> [B, nb, bq, C] blocks."""
            c = x.shape[-1]
            x = jnp.pad(tokens_to_2d(x, size_2d),
                        [(0, 0), (0, hq - h), (0, wq - w), (0, 0)])
            x = x.reshape(b, nby, br, nbx, br, c).transpose(0, 1, 3, 2, 4, 5)
            return x.reshape(b, nb, bq, c)

        def heads(x, last):
            """[B, nb, L, H*D] -> [B, H, nb, L, D]."""
            return x.reshape(*x.shape[:-1], nh, last).transpose(0, 3, 1, 2, 4)

        # key/value bands from the padded grid (right/bottom padded to the
        # block-rounded query extent so every band is in range)
        pad2 = [(0, 0), (md, hq - h + md), (md, wq - w + md), (0, 0)]
        kp = jnp.pad(tokens_to_2d(k, size_2d), pad2)
        vp = jnp.pad(tokens_to_2d(v, size_2d), pad2)
        kb = _band_blocks(kp, br, md, nby, nbx)       # [B, nb, band^2, Ck]
        vb = _band_blocks(vp, br, md, nby, nbx)

        qh = heads(blk_q(q), d_att) * (d_att ** -0.5)
        kh = heads(kb, d_att)
        vh = heads(vb, vb.shape[-1] // nh)
        logits = jnp.einsum('bhnqd,bhnkd->bhnqk', qh, kh,
                            preferred_element_type=_qk_out_dtype(q.dtype))

        # bias: block the per-query [ws^2] window bias, then scatter to the
        # band with the separable one-hot (band idx = local q + offset; the
        # same [br, ws, band] table serves both axes because band origin ==
        # block origin). (B*H*nb) folds into one leading batch axis so the
        # scatters stay 5-D with trivial layouts.
        rel_blk = blk_q(rel.transpose(0, 2, 1, 3).reshape(b, h * w, -1))
        rel_blk = rel_blk.reshape(b, nb, bq, nh, ws * ws)
        r6 = rel_blk.transpose(0, 3, 1, 2, 4).reshape(
            b * nh * nb, br, br, ws, ws)
        r6 = jnp.einsum('zyxde,xek->zyxdk', r6, A)    # dx -> band col
        r6 = jnp.einsum('zyxdk,ydm->zyxmk', r6, A)    # dy -> band row
        bias = r6.reshape(b, nh, nb, bq, band * band)

        extra = bias + jnp.where(mask, 0.0, NEG_INF)[None, None]
        logits = logits + extra.astype(logits.dtype)
        logits = _maybe_compact_logits(logits, q.dtype)
        probs = _softmax_f32(logits, axis=-1)
        probs = _maybe_compact_logits(probs, q.dtype)
        probs = self._maybe_drop_probs(probs, deterministic)
        out = jnp.einsum('bhnqk,bhnkd->bhnqd', probs.astype(vh.dtype), vh,
                         preferred_element_type=jnp.float32).astype(v.dtype)

        # merge heads + un-block + crop the padded query rows/cols
        e = out.shape[-1] * nh
        out = out.transpose(0, 2, 3, 1, 4).reshape(b, nb, bq, e)
        out = out.reshape(b, nby, nbx, br, br, e).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(b, hq, wq, e)[:, :h, :w]
        return out.reshape(b, h * w, e)
