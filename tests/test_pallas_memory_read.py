"""Numerics of the fused memory-read kernel vs the XLA reference path
(interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rmem_ocu_tpu.models.lstt import bank_key_bias, frame_mass_from_probs
from rmem_ocu_tpu.ops.attention import scaled_dot_attention
from rmem_ocu_tpu.ops.pallas.memory_read import (memory_read_attention,
                                                 _best_block_k)


@pytest.mark.parametrize('t_live,heads', [(1, 1), (4, 1), (7, 2)])
def test_memory_read_kernel_matches_xla(t_live, heads):
    rng = np.random.RandomState(0)
    b, hwq, hwk, d, dv, t_cap = 2, 40, 64, 32, 48, 8
    q = rng.randn(b * heads, hwq, d).astype(np.float32) * 0.5
    k = rng.randn(b * heads, t_cap, hwk, d).astype(np.float32) * 0.5
    v = rng.randn(b * heads, t_cap, hwk, dv).astype(np.float32) * 0.5
    length = np.full((b * heads,), t_live, np.int32)

    out, mass = memory_read_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(length),
        block_q=16, block_k=32, interpret=True, precise=True)

    # XLA reference: masked dense attention (per folded batch*head, 1 head)
    flat_k = k.reshape(b * heads, t_cap * hwk, d)
    flat_v = v.reshape(b * heads, t_cap * hwk, dv)
    bias = bank_key_bias(jnp.asarray(length), t_cap, hwk)
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


def test_best_block_k():
    # multiples of 8 (Mosaic sublane constraint) or the full token count
    assert _best_block_k(900) == 900
    assert _best_block_k(1024) == 512
    assert _best_block_k(920) == 184
    assert _best_block_k(7) == 7
