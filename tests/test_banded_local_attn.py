"""Banded vs dense local-attention equivalence: the 2D block-banded core
(default) must reproduce the padded-grid dense core exactly — the band
covers every query's full window and out-of-window keys underflow to
probability 0.0 in both forms (ops/attention.py:_banded_core)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rmem_ocu_tpu.ops.attention import LocalGatedPropagation


@pytest.mark.parametrize('h,w,heads', [(6, 6, 1), (11, 14, 1), (9, 16, 2),
                                       (8, 8, 1)])
def test_banded_equals_dense(h, w, heads):
    rng = np.random.RandomState(h * 100 + w + heads)
    b, d_qk, d_vu = 2, 32, 16
    mod = LocalGatedPropagation(d_qk=d_qk, d_vu=d_vu, num_heads=heads,
                                max_dis=7, d_att=d_qk // (2 * heads),
                                use_linear=True)
    q = jnp.asarray(rng.randn(b, h * w, d_qk), jnp.float32)
    v = jnp.asarray(rng.randn(b, h * w, d_vu), jnp.float32)
    u = jnp.asarray(rng.randn(b, h * w, d_vu), jnp.float32)

    params = mod.init(jax.random.PRNGKey(0), q, q, v, u, (h, w))

    os.environ['RMEM_LOCAL_ATTN'] = 'dense'
    try:
        dense, _ = mod.apply(params, q, q, v, u, (h, w))
        os.environ['RMEM_LOCAL_ATTN'] = 'banded'
        banded, _ = mod.apply(params, q, q, v, u, (h, w))
    finally:
        os.environ.pop('RMEM_LOCAL_ATTN', None)

    np.testing.assert_allclose(np.asarray(banded), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


def test_banded_grads_match_dense():
    """The banded core must also backprop identically (it is the default
    on the amp training path)."""
    rng = np.random.RandomState(3)
    b, h, w, d_qk, d_vu = 1, 10, 13, 16, 8
    mod = LocalGatedPropagation(d_qk=d_qk, d_vu=d_vu, num_heads=1,
                                max_dis=7, d_att=8, use_linear=True)
    q = jnp.asarray(rng.randn(b, h * w, d_qk), jnp.float32)
    v = jnp.asarray(rng.randn(b, h * w, d_vu), jnp.float32)
    u = jnp.asarray(rng.randn(b, h * w, d_vu), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), q, q, v, u, (h, w))

    def loss(p, q):
        out, _ = mod.apply(p, q, q, v, u, (h, w))
        return jnp.sum(out ** 2)

    os.environ['RMEM_LOCAL_ATTN'] = 'dense'
    try:
        gd_p, gd_q = jax.grad(loss, argnums=(0, 1))(params, q)
        os.environ['RMEM_LOCAL_ATTN'] = 'banded'
        gb_p, gb_q = jax.grad(loss, argnums=(0, 1))(params, q)
    finally:
        os.environ.pop('RMEM_LOCAL_ATTN', None)

    np.testing.assert_allclose(np.asarray(gb_q), np.asarray(gd_q),
                               rtol=1e-4, atol=1e-4)
    jax.tree.map(lambda a, bb: np.testing.assert_allclose(
        np.asarray(bb), np.asarray(a), rtol=1e-4, atol=1e-4), gd_p, gb_p)


@pytest.mark.parametrize('h,w', [(6, 6), (11, 14), (23, 40)])
def test_pallas_core_matches_dense(h, w):
    """The fused row-band Pallas kernel (interpret mode off-TPU) must
    match the dense padded-grid core: same in-window key set, f32
    softmax, identical bias values scattered on the band layout."""
    rng = np.random.RandomState(h + w)
    b, d_qk, d_vu = 1, 32, 16
    mod = LocalGatedPropagation(d_qk=d_qk, d_vu=d_vu, num_heads=1,
                                max_dis=7, d_att=16, use_linear=True)
    q = jnp.asarray(rng.randn(b, h * w, d_qk), jnp.float32)
    v = jnp.asarray(rng.randn(b, h * w, d_vu), jnp.float32)
    u = jnp.asarray(rng.randn(b, h * w, d_vu), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), q, q, v, u, (h, w))

    os.environ['RMEM_LOCAL_ATTN'] = 'dense'
    try:
        dense, _ = mod.apply(params, q, q, v, u, (h, w))
        os.environ['RMEM_LOCAL_ATTN'] = 'pallas'
        fused, _ = mod.apply(params, q, q, v, u, (h, w))
    finally:
        os.environ.pop('RMEM_LOCAL_ATTN', None)

    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)
