"""Numerics of the fused memory-read kernel vs the XLA reference path
(interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rmem_ocu_tpu.models.lstt import bank_key_bias, frame_mass_from_probs
from rmem_ocu_tpu.ops.attention import scaled_dot_attention
from rmem_ocu_tpu.ops.pallas.memory_read import (memory_read_attention,
                                                 memory_read_fused,
                                                 _best_block_k)


@pytest.mark.parametrize('t_live,heads', [(1, 1), (4, 1), (7, 2)])
def test_memory_read_kernel_matches_xla(t_live, heads):
    rng = np.random.RandomState(0)
    b, hwq, hwk, d, dv, t_cap = 2, 40, 64, 32, 48, 8
    q = rng.randn(b * heads, hwq, d).astype(np.float32) * 0.5
    k = rng.randn(b * heads, t_cap, hwk, d).astype(np.float32) * 0.5
    v = rng.randn(b * heads, t_cap, hwk, dv).astype(np.float32) * 0.5
    length = np.full((b * heads,), t_live, np.int32)

    valid = jnp.arange(t_cap)[None] < jnp.asarray(length)[:, None]
    out, mass = memory_read_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), valid,
        block_q=16, block_k=32, interpret=True, precise=True)

    # XLA reference: masked dense attention (per folded batch*head, 1 head)
    flat_k = k.reshape(b * heads, t_cap * hwk, d)
    flat_v = v.reshape(b * heads, t_cap * hwk, dv)
    bias = bank_key_bias(valid, hwk)
    want, probs = scaled_dot_attention(
        jnp.asarray(q), jnp.asarray(flat_k), jnp.asarray(flat_v), 1,
        scale=1.0, key_bias=bias, return_probs=True)
    want_mass = frame_mass_from_probs(probs, t_cap)

    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mass), np.asarray(want_mass),
                               rtol=2e-5, atol=2e-5)
    # empty slots get zero mass; live mass sums to 1
    m = np.asarray(mass)
    assert np.abs(m[:, :, t_live:]).max() == 0
    np.testing.assert_allclose(m.sum(-1), 1.0, atol=1e-5)


@pytest.mark.parametrize('t_live,heads,with_pe,blocks',
                         [(1, 1, True, {}),
                          (4, 2, True, {}),
                          (7, 4, False, {'block_q': 16, 'block_k': 32})])
def test_memory_read_fused_single_bank(t_live, heads, with_pe, blocks):
    """Head-sliced fused kernel (no transposes) + in-kernel temporal PE vs
    the XLA dense path with PE added to the bank keys."""
    rng = np.random.RandomState(1)
    b, hwq, hwk, t_cap = 2, 40, 64, 8
    d_h, dv_h = 16, 24
    hd, hdv = d_h * heads, dv_h * heads
    q = jnp.asarray(rng.randn(b, hwq, hd).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.randn(b, t_cap, hwk, hd).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.randn(b, t_cap, hwk, hdv).astype(np.float32) * 0.5)
    pe = jnp.asarray(rng.randn(b, t_cap, hd).astype(np.float32) * 0.5)
    length = jnp.full((b,), t_live, jnp.int32)
    scale = d_h ** -0.5

    valid = jnp.arange(t_cap)[None] < length[:, None]
    (out,), mass = memory_read_fused(
        q, k, (v,), valid, heads, scale,
        mem_pe=pe if with_pe else None, interpret=True, precise=True,
        **blocks)

    k_ref = k + pe[:, :, None, :] if with_pe else k
    flat_k = k_ref.reshape(b, t_cap * hwk, hd)
    flat_v = v.reshape(b, t_cap * hwk, hdv)
    bias = bank_key_bias(valid, hwk)
    want, probs = scaled_dot_attention(q, flat_k, flat_v, heads,
                                       scale=scale, key_bias=bias,
                                       return_probs=True)
    want_mass = frame_mass_from_probs(probs, t_cap)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mass), np.asarray(want_mass),
                               rtol=2e-5, atol=2e-5)
    assert np.abs(np.asarray(mass)[:, :, t_live:]).max() == 0


@pytest.mark.parametrize('t_live,with_pe', [(3, True), (8, False)])
def test_memory_read_fused_two_banks(t_live, with_pe):
    """DeAOT V / ID_V pair: two banks share one probability matrix; outputs
    must equal attention over the channel-concatenated bank."""
    rng = np.random.RandomState(2)
    b, hwq, hwk, t_cap, d, dv1, dv2 = 2, 24, 32, 8, 16, 24, 16
    q = jnp.asarray(rng.randn(b, hwq, d).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.randn(b, t_cap, hwk, d).astype(np.float32) * 0.5)
    v1 = jnp.asarray(rng.randn(b, t_cap, hwk, dv1).astype(np.float32) * 0.5)
    v2 = jnp.asarray(rng.randn(b, t_cap, hwk, dv2).astype(np.float32) * 0.5)
    pe = jnp.asarray(rng.randn(1, t_cap, d).astype(np.float32) * 0.5)
    length = jnp.full((b,), t_live, jnp.int32)
    scale = d ** -0.5

    valid = jnp.arange(t_cap)[None] < length[:, None]
    (o1, o2), mass = memory_read_fused(
        q, k, (v1, v2), valid, 1, scale,
        mem_pe=pe if with_pe else None, interpret=True, precise=True)

    k_ref = k + pe[:, :, None, :] if with_pe else k
    flat_k = k_ref.reshape(b, t_cap * hwk, d)
    cat_v = jnp.concatenate([v1, v2], axis=-1).reshape(b, t_cap * hwk,
                                                       dv1 + dv2)
    bias = bank_key_bias(valid, hwk)
    want, probs = scaled_dot_attention(q, flat_k, cat_v, 1, scale=scale,
                                       key_bias=bias, return_probs=True)
    want_mass = frame_mass_from_probs(probs, t_cap)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(want[..., :dv1]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(want[..., dv1:]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mass), np.asarray(want_mass),
                               rtol=2e-5, atol=2e-5)


def test_memory_read_fused_rejects_multihead_two_banks():
    z = jnp.zeros((1, 8, 16, 8))
    with pytest.raises(ValueError):
        memory_read_fused(jnp.zeros((1, 8, 8)), z[..., :8],
                          (z, z), jnp.ones((1,), jnp.int32), 2, 1.0,
                          interpret=True)


def test_best_block_k():
    # multiples of 8 (Mosaic sublane constraint) or the full token count
    assert _best_block_k(900) == 900
    assert _best_block_k(1024) == 512
    assert _best_block_k(920) == 184
    assert _best_block_k(7) == 7
