"""Remat-policy equivalence: every train_remat_policy computes identical
loss and gradients — the policy may only change what is saved vs
recomputed, never the math. Guards the custom dots_k<N> policy
(engine/train_engine.py:_dots_min_contraction) used by bench.py's remat
A/Bs at recipe scale."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmem_ocu_tpu.config import get_config
from rmem_ocu_tpu.engine.train_engine import TrainEngine
from rmem_ocu_tpu.models import build_vos_model

BATCH, SEQ, SIZE = 1, 3, 33


def _loss_and_gradnorm(policy):
    exp = get_config('pre_vost', model='aott', datasets=('test',),
                     train_batch_size=BATCH, data_seq_len=SEQ,
                     data_randomcrop=(SIZE, SIZE),
                     train_remat_policy=policy)
    model = build_vos_model(exp.model, exp)
    eng = TrainEngine(model, exp)
    rs = np.random.RandomState(0)
    frames = jnp.asarray(rs.randn(BATCH, SEQ, SIZE, SIZE, 3), jnp.float32)
    masks = jnp.asarray((rs.rand(BATCH, SEQ, SIZE, SIZE) * 3)
                        .astype(np.int32))
    obj = jnp.full((BATCH,), 2, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), frames[:, 0],
                        jnp.zeros((BATCH, SIZE, SIZE, exp.model.id_dim)))
    loss, grads = jax.jit(lambda p: jax.value_and_grad(
        lambda q: eng.episode_loss(q, frames, masks, obj, 0,
                                   jax.random.PRNGKey(1))[0])(p))(params)
    gn = jnp.sqrt(sum(jnp.sum(jnp.square(x))
                      for x in jax.tree.leaves(grads)))
    return float(loss), float(gn)


@pytest.mark.parametrize('policy', ['dots_k512', 'dots', 'none'])
def test_policy_matches_full_remat(policy):
    l_full, g_full = _loss_and_gradnorm('full')
    l_pol, g_pol = _loss_and_gradnorm(policy)
    assert l_pol == pytest.approx(l_full, abs=1e-6)
    assert g_pol == pytest.approx(g_full, rel=1e-5)


def test_dots_k_policy_selects_by_contraction():
    from rmem_ocu_tpu.engine.train_engine import _dots_min_contraction
    pol = _dots_min_contraction(512)
    big = jax.core.ShapedArray((8, 1024), jnp.float32)
    small = jax.core.ShapedArray((8, 128), jnp.float32)
    dn_last = (((1,), (0,)), ((), ()))
    dot_p = jax.lax.dot_general_p
    assert pol(dot_p, big, big, dimension_numbers=dn_last)
    assert not pol(dot_p, small, small, dimension_numbers=dn_last)
    assert not pol(jax.lax.add_p, big, big)
