"""Fused memory-bank attention kernel (Pallas/TPU).

The RMem memory read: queries attend over the fixed-capacity ring bank
[T_cap, HWk] while *also* producing the per-slot attention mass that drives
eviction (reference records explicit softmax weights for this,
aot_plus/networks/layers/attention.py:45-64 + transformer.py:636-643, which
forbids flash-style kernels). Here the mass falls out of the same online-
softmax pass: per-slot partial denominators are tracked alongside the usual
(m, l) running statistics, so eviction scores cost no second pass and the
[HWq, T_cap*HWk] probability matrix is never materialized.

Layout: heads are folded into the leading grid axis; free slots (the
position-indirected bank marks them valid=0 — they can sit anywhere, not
just at the tail) contribute no compute: their grid steps are @pl.when-
skipped, so compute scales with the *live* memory, not the capacity.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(valid_ref,                       # scalar prefetch [BH, T_cap]
            q_ref, k_ref, v_ref,             # VMEM blocks
            o_ref, mass_ref,                 # outputs
            m_scr, l_scr, acc_scr, s_scr,    # scratch
            *, mm_dtype):
    t = pl.program_id(2)
    kb = pl.program_id(3)
    n_kb = pl.num_programs(3)
    t_cap = pl.num_programs(2)
    bh = pl.program_id(0)
    live = valid_ref[bh, t] != 0

    @pl.when(jnp.logical_and(t == 0, kb == 0))
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        s_scr[:] = jnp.zeros_like(s_scr)

    @pl.when(live)
    def _step():
        # bf16 MXU matmuls with f32 accumulation (flash-standard; also what
        # XLA does for f32 inputs by default on TPU); mm_dtype=f32 for
        # bit-accurate parity runs
        q = q_ref[0].astype(mm_dtype)         # [Lq, D]
        k = k_ref[0, 0].astype(mm_dtype)      # [Kb, D]
        v = v_ref[0, 0]                       # [Kb, Dv]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [Lq, Kb]

        m_prev = m_scr[:]                     # [Lq, 1]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1,
                                            keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)           # [Lq, Kb]
        p_sum = jnp.sum(p, axis=-1, keepdims=True)

        l_scr[:] = l_scr[:] * alpha + p_sum
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(mm_dtype), v.astype(mm_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # per-slot partial mass, rescaled like the denominator; dynamic lane
        # indexing is not lowerable, so select the slot with a one-hot mask
        slot_onehot = (jax.lax.broadcasted_iota(
            jnp.int32, s_scr.shape, 1) == t).astype(jnp.float32)
        s_scr[:] = s_scr[:] * alpha + p_sum * slot_onehot
        m_scr[:] = m_new

    @pl.when(jnp.logical_and(t == t_cap - 1, kb == n_kb - 1))
    def _finalize():
        denom = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)
        mass_ref[0] = (s_scr[:] / denom).astype(mass_ref.dtype)


@functools.partial(jax.jit, static_argnames=('block_q', 'block_k',
                                             'interpret', 'precise'))
def memory_read_attention(q, k_bank, v_bank, valid, block_q: int = 512,
                          block_k: int = 512, interpret: bool = False,
                          precise: bool = False):
    """q: [BH, HWq, D] (pre-scaled, PE added); k_bank: [BH, T_cap, HWk, D];
    v_bank: [BH, T_cap, HWk, Dv]; valid: [BH, T_cap] int32/bool live-slot
    mask (arbitrary physical order).

    Returns (out [BH, HWq, Dv] f32-accumulated,
             mass [BH, HWq, T_cap] — per-slot attention mass).
    """
    bh, hwq, d = q.shape
    _, t_cap, hwk, dv = v_bank.shape

    # queries pad freely (padded rows are sliced off); keys must tile
    # exactly — zero-padded keys would leak softmax mass (logit 0)
    if hwk % min(block_k, hwk) != 0:
        raise ValueError(
            f'HWk={hwk} must be divisible by block_k (use _best_block_k)')
    bq = min(block_q, hwq)
    # round the query block up to the fp32 sublane tile
    bq = -(-bq // 8) * 8
    pad_q = (-hwq) % bq
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    bk = min(block_k, hwk)

    n_q = (hwq + pad_q) // bq
    n_k = hwk // bk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, n_q, t_cap, n_k),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, qb, t, kb, L: (b, qb, 0)),
            pl.BlockSpec((1, 1, bk, d),
                         lambda b, qb, t, kb, L: (b, t, kb, 0)),
            pl.BlockSpec((1, 1, bk, dv),
                         lambda b, qb, t, kb, L: (b, t, kb, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, dv), lambda b, qb, t, kb, L: (b, qb, 0)),
            pl.BlockSpec((1, bq, t_cap), lambda b, qb, t, kb, L: (b, qb, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, dv), jnp.float32),
            pltpu.VMEM((bq, t_cap), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _kernel, mm_dtype=jnp.float32 if precise else jnp.bfloat16)
    out, mass = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bh, hwq + pad_q, dv), jnp.float32),
            jax.ShapeDtypeStruct((bh, hwq + pad_q, t_cap), jnp.float32),
        ],
        interpret=interpret,
    )(valid.astype(jnp.int32), q, k_bank, v_bank)

    if pad_q:
        out = out[:, :hwq]
        mass = mass[:, :hwq]
    return out, mass


def _make_fused_kernel(mm_dtype, num_heads: int, has_pe: bool,
                       two_banks: bool):
    """Kernel body for memory_read_fused (closure over static config).

    Ref order after the scalar prefetch: q, k, [pe], v1, [v2] inputs;
    o1, [o2], mass outputs; m, l, acc1, [acc2], s scratch.
    """
    def kernel(valid_ref, *refs):
        it = iter(refs)
        q_ref = next(it)
        k_ref = next(it)
        pe_ref = next(it) if has_pe else None
        v1_ref = next(it)
        v2_ref = next(it) if two_banks else None
        o1_ref = next(it)
        o2_ref = next(it) if two_banks else None
        mass_ref = next(it)
        m_scr = next(it)
        l_scr = next(it)
        acc1 = next(it)
        acc2 = next(it) if two_banks else None
        s_scr = next(it)

        bh = pl.program_id(0)
        t = pl.program_id(2)
        kb = pl.program_id(3)
        t_cap = pl.num_programs(2)
        n_kb = pl.num_programs(3)
        # lax.div, not python //: program ids are non-negative and jnp's
        # floor-div sign correction adds needless select chains in Mosaic
        live = valid_ref[bh if num_heads == 1
                         else jax.lax.div(bh, num_heads), t] != 0

        @pl.when(jnp.logical_and(t == 0, kb == 0))
        def _init():
            m_scr[:] = jnp.full_like(m_scr, NEG_INF)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc1[:] = jnp.zeros_like(acc1)
            if two_banks:
                acc2[:] = jnp.zeros_like(acc2)
            s_scr[:] = jnp.zeros_like(s_scr)

        @pl.when(live)
        def _step():
            q = q_ref[0].astype(mm_dtype)            # [Lq, D]
            k = k_ref[0, 0].astype(mm_dtype)         # [Kb, D]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [Lq, Kb]
            if has_pe:
                # temporal PE is added to every key of slot t; since it is
                # constant across the slot's HW keys, (q @ (k + pe)^T)
                # = q @ k^T + (q . pe) broadcast over the key axis — the
                # full-bank (k + pe) materialization never happens. A
                # multiply-reduce (VPU), not a [Lq,D]x[1,D] dot: Mosaic
                # lowers the degenerate matvec through a mixed-dtype
                # vector.broadcast that fails verification.
                pe = pe_ref[0, 0].astype(jnp.float32)     # [1, D]
                pe_corr = jnp.sum(
                    q.astype(jnp.float32) * pe, axis=-1,
                    keepdims=True)                        # [Lq, 1]
                logits = logits + pe_corr

            m_prev = m_scr[:]
            m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1,
                                                keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(logits - m_new)
            p_sum = jnp.sum(p, axis=-1, keepdims=True)
            l_scr[:] = l_scr[:] * alpha + p_sum
            pmm = p.astype(mm_dtype)
            acc1[:] = acc1[:] * alpha + jax.lax.dot_general(
                pmm, v1_ref[0, 0].astype(mm_dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if two_banks:
                acc2[:] = acc2[:] * alpha + jax.lax.dot_general(
                    pmm, v2_ref[0, 0].astype(mm_dtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            slot_onehot = (jax.lax.broadcasted_iota(
                jnp.int32, s_scr.shape, 1) == t).astype(jnp.float32)
            s_scr[:] = s_scr[:] * alpha + p_sum * slot_onehot
            m_scr[:] = m_new

        @pl.when(jnp.logical_and(t == t_cap - 1, kb == n_kb - 1))
        def _finalize():
            denom = jnp.maximum(l_scr[:], 1e-30)
            o1_ref[0] = (acc1[:] / denom).astype(o1_ref.dtype)
            if two_banks:
                o2_ref[0] = (acc2[:] / denom).astype(o2_ref.dtype)
            mass_ref[0, 0] = (s_scr[:] / denom).astype(mass_ref.dtype)

    return kernel


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_fused_blocks(hwq: int, hwk: int, d: int, dv_heads, t_cap: int,
                       in_itemsize: int, out_itemsize: int,
                       budget: int = 9 * 1024 * 1024):
    """(bq, bk) sized so double-buffered input blocks + f32 accumulators fit
    the VMEM budget. bk must divide hwk exactly (zero-padded keys would leak
    softmax mass), bq is free to pad."""
    dv_total = sum(dv_heads)

    def vmem(bq, bk):
        acc = bq * dv_total * 4 + bq * (t_cap + 2) * 4
        outs = bq * dv_total * out_itemsize + bq * t_cap * 4
        q = bq * d * in_itemsize
        kv = 2 * bk * (d + dv_total) * in_itemsize   # double-buffered
        return acc + outs + q + kv

    bq = _round_up(min(hwq, 2048), 16)
    bk = hwk
    while vmem(bq, bk) > budget and bq > 256:
        bq = _round_up(bq // 2, 16)
    if vmem(bq, bk) > budget:
        bk = _best_block_k(hwk, cap=max(256, hwk // 4))
    return bq, bk


def memory_read_fused(q, k_bank, v_banks, valid, num_heads: int,
                      scale: float, mem_pe=None, block_q: int = None,
                      block_k: int = None, interpret: bool = None,
                      precise: bool = False):
    """Fused bank read without head transposes or bank concatenation.

    q: [B, HWq, H*D] (unscaled); k_bank: [B, T_cap, HWk, H*D];
    v_banks: tuple of 1 or 2 arrays [B, T_cap, HWk, Cv_i] (two banks =
    DeAOT's V / ID_V pair sharing one set of attention probs — requires
    num_heads == 1); valid: [B, T_cap] live-slot mask (arbitrary
    physical order); mem_pe: optional [B|1, T_cap, H*D]
    temporal PE (reference adds it to every memory key,
    transformer.py:594-629); applied here as a rank-1 logit correction
    inside the kernel.

    Heads are handled by BlockSpec channel slicing (grid axis b*h), so the
    banks are read in their storage layout — no [B,T,HW,C] -> [B*H,T,HW,D]
    transpose copies. Returns (outs tuple [B, HWq, Cv_i] in q.dtype,
    mass [B, HWq, T_cap] f32 — mean over heads).
    """
    two_banks = len(v_banks) == 2
    if two_banks and num_heads != 1:
        raise ValueError('two value banks share one probability matrix; '
                         'only num_heads=1 decomposes this way')
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, hwq, hd = q.shape
    _, t_cap, hwk, _ = k_bank.shape
    h = num_heads
    d = hd // h
    dv_heads = tuple(v.shape[-1] // h for v in v_banks)

    q = q * jnp.asarray(scale, q.dtype)
    if mem_pe is not None:
        # [B, T, 1, HD]: the singleton axis keeps the trailing two block
        # dims equal to the array dims (Mosaic's (8, 128)-or-full rule)
        mem_pe = jnp.broadcast_to(
            mem_pe, (b, t_cap, hd)).astype(q.dtype)[:, :, None, :]

    bq, bk = _pick_fused_blocks(
        hwq, hwk, d, dv_heads, t_cap,
        in_itemsize=q.dtype.itemsize, out_itemsize=q.dtype.itemsize)
    if block_q is not None:
        bq = _round_up(min(block_q, hwq), 16)
    if block_k is not None:
        bk = block_k
    if hwk % bk != 0:
        raise ValueError(f'HWk={hwk} must be divisible by block_k={bk}')
    pad_q = (-hwq) % bq
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    n_q = (hwq + pad_q) // bq
    n_k = hwk // bk

    # Index-map arithmetic must stay Mosaic-lowerable: python `//`/`%` on a
    # traced grid index emit jnp's sign-correction jaxpr (select_n over
    # rem/div), which the TPU block-mapping lowering rejects. Grid indices
    # are non-negative, so truncated lax.div/lax.rem are exact — and for the
    # flagship num_heads==1 path they reduce to the identity / constant 0.
    if h == 1:
        def _b(i):                               # batch of grid step i
            return i

        def _h(i):                               # head of grid step i
            return 0
    else:
        def _b(i):
            return jax.lax.div(i, h)

        def _h(i):
            return jax.lax.rem(i, h)

    # dead slots (valid=0) still DMA their block — at most one slot is
    # free in steady state (evict runs right after the over-budget
    # append) and the compute is @pl.when-skipped; index-mapping around
    # them would need a per-slot indirection in SMEM for no measurable
    # win.

    in_specs = [
        pl.BlockSpec((1, bq, d), lambda i, qb, t, kb, L:
                     (_b(i), qb, _h(i))),
        pl.BlockSpec((1, 1, bk, d), lambda i, qb, t, kb, L:
                     (_b(i), t, kb, _h(i))),
    ]
    operands = [q, k_bank]
    if mem_pe is not None:
        in_specs.append(pl.BlockSpec(
            (1, 1, 1, d), lambda i, qb, t, kb, L:
            (_b(i), t, 0, _h(i))))
        operands.append(mem_pe)
    for v, dvh in zip(v_banks, dv_heads):
        in_specs.append(pl.BlockSpec(
            (1, 1, bk, dvh), lambda i, qb, t, kb, L:
            (_b(i), t, kb, _h(i))))
        operands.append(v)

    out_specs = [pl.BlockSpec((1, bq, dvh), lambda i, qb, t, kb, L:
                              (_b(i), qb, _h(i)))
                 for dvh in dv_heads]
    out_specs.append(pl.BlockSpec((1, 1, bq, t_cap),
                                  lambda i, qb, t, kb, L:
                                  (_b(i), _h(i), qb, 0)))
    out_shape = [jax.ShapeDtypeStruct((b, hwq + pad_q, h * dvh), q.dtype)
                 for dvh in dv_heads]
    out_shape.append(jax.ShapeDtypeStruct((b, h, hwq + pad_q, t_cap),
                                          jnp.float32))

    scratch = [pltpu.VMEM((bq, 1), jnp.float32),
               pltpu.VMEM((bq, 1), jnp.float32),
               pltpu.VMEM((bq, dv_heads[0]), jnp.float32)]
    if two_banks:
        scratch.append(pltpu.VMEM((bq, dv_heads[1]), jnp.float32))
    scratch.append(pltpu.VMEM((bq, t_cap), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, n_q, t_cap, n_k),
        in_specs=in_specs, out_specs=out_specs, scratch_shapes=scratch)

    kernel = _make_fused_kernel(
        jnp.float32 if precise else jnp.bfloat16, h,
        has_pe=mem_pe is not None, two_banks=two_banks)
    results = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret)(valid.astype(jnp.int32), *operands)
    *outs, mass = results
    if pad_q:
        outs = [o[:, :hwq] for o in outs]
        mass = mass[:, :, :hwq]
    mass = jnp.mean(mass, axis=1)                 # mean over heads
    return tuple(outs), mass


def _best_block_k(hwk: int, cap: int = 512) -> int:
    """Largest divisor of hwk that is <= cap and a multiple of 8 (Mosaic's
    sublane constraint); falls back to hwk itself (the 'equal to the array
    dimension' escape hatch)."""
    if hwk <= cap:
        return hwk
    best = None
    for b in range(8, cap + 1, 8):
        if hwk % b == 0:
            best = b
    return best if best is not None else hwk


def memory_read_multihead(q, k_bank, v_bank, valid, num_heads: int,
                          scale: float, interpret: bool = None):
    """Convenience wrapper over batch+head folding.

    q: [B, HWq, H*D]; k_bank: [B, T, HWk, H*D]; v_bank: [B, T, HWk, H*Dv];
    valid: [B, T] live-slot mask. Returns (out [B, HWq, H*Dv],
    mass [B, HWq, T] — mean over heads, matching frame_mass_from_probs).

    interpret=None auto-selects: compiled Mosaic on a TPU backend,
    interpret mode elsewhere (so RMEM_PALLAS=1 exercises the kernel's
    numerics on any backend, e.g. the CPU regression suite).
    """
    if interpret is None:
        import jax as _jax
        interpret = _jax.default_backend() != 'tpu'
    b, hwq, hd = q.shape
    _, t_cap, hwk, hdv = v_bank.shape
    h = num_heads
    d, dv = hd // h, hdv // h

    qf = (q * scale).reshape(b, hwq, h, d).transpose(0, 2, 1, 3)
    qf = qf.reshape(b * h, hwq, d)
    kf = k_bank.reshape(b, t_cap, hwk, h, d).transpose(0, 3, 1, 2, 4)
    kf = kf.reshape(b * h, t_cap, hwk, d)
    vf = v_bank.reshape(b, t_cap, hwk, h, dv).transpose(0, 3, 1, 2, 4)
    vf = vf.reshape(b * h, t_cap, hwk, dv)
    lf = jnp.repeat(valid.astype(jnp.int32), h, axis=0)

    # bq=512 / bk~=184 measured fastest at DAVIS-480p eval shapes on v5e
    # (201us vs 244us for the XLA dense path at B=1; 2.8ms vs 3.2ms at B=8)
    block_k = _best_block_k(hwk, cap=256)
    out, mass = memory_read_attention(qf, kf, vf, lf, block_k=block_k,
                                      interpret=interpret)
    out = out.reshape(b, h, hwq, dv).transpose(0, 2, 1, 3).reshape(
        b, hwq, h * dv)
    mass = jnp.mean(mass.reshape(b, h, hwq, t_cap), axis=1)
    return out, mass
