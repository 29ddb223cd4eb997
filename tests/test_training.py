"""Training smoke tests: one optimizer step on synthetic data (the
reference's TEST dataset idea, train_datasets.py:821-854), plus the same
step sharded over the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from rmem_ocu_tpu.config import get_config
from rmem_ocu_tpu.models import build_vos_model
from rmem_ocu_tpu.train import Trainer

SIZE = 49
T = 4


def _batch(b, seed=0):
    rng = np.random.RandomState(seed)
    return {
        'frames': jnp.asarray(rng.randn(b, T, SIZE, SIZE, 3), jnp.float32),
        'masks': jnp.asarray((rng.rand(b, T, SIZE, SIZE) * 3).astype(
            np.int32)),
        'obj_nums': jnp.full((b,), 2, jnp.int32),
    }


@pytest.fixture(scope='module')
def setup():
    exp = get_config('pre_vost', model='aott')
    # shrink schedule so warmup/aux-ramp paths are exercised
    from dataclasses import replace
    exp = replace(exp, train_total_steps=100, data_seq_len=T)
    model = build_vos_model(exp.model)
    return exp, model


def test_single_train_step(setup):
    exp, model = setup
    mesh = Mesh(np.asarray(jax.devices()[:1]), ('data',))
    trainer = Trainer(model, exp, mesh=mesh)
    batch = _batch(1)
    state = trainer.init_state(jax.random.PRNGKey(0), batch['frames'],
                               batch['masks'])
    p0 = jax.tree.leaves(state.params)[0].copy()
    state, metrics = trainer.train_step(state, batch,
                                        jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['loss']))
    assert float(metrics['grad_norm']) > 0
    assert int(state.step) == 1
    # params actually moved
    p1 = jax.tree.leaves(state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # frozen-BN stats must not move
    bn = state.params['params']['encoder']['feat_0']['bn']
    bn0 = trainer.model.init(jax.random.PRNGKey(0),
                             batch['frames'][:1, 0],
                             jnp.zeros((1, SIZE, SIZE, exp.model.id_dim)))
    np.testing.assert_array_equal(
        np.asarray(bn['running_mean']),
        np.asarray(bn0['params']['encoder']['feat_0']['bn']['running_mean']))


def test_deaot_train_step():
    """DeAOT family training episode (GPM memories + id-value fusion)."""
    from dataclasses import replace
    exp = get_config('pre_vost', model='deaott')
    exp = replace(exp, train_total_steps=100, data_seq_len=3)
    model = build_vos_model(exp.model)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ('data',))
    trainer = Trainer(model, exp, mesh=mesh)
    batch = _batch(1, seed=5)
    batch = {**batch, 'frames': batch['frames'][:, :3],
             'masks': batch['masks'][:, :3]}
    state = trainer.init_state(jax.random.PRNGKey(0), batch['frames'],
                               batch['masks'])
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['loss']))
    assert float(metrics['grad_norm']) > 0


def test_data_parallel_step_8dev(setup):
    exp, model = setup
    assert len(jax.devices()) == 8, 'conftest must provide 8 CPU devices'
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ('data',))
    trainer = Trainer(model, exp, mesh=mesh)
    batch = _batch(8, seed=2)
    state = trainer.init_state(jax.random.PRNGKey(0), batch['frames'],
                               batch['masks'])
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['loss']))
    assert int(state.step) == 1


def test_encoder_chunking_equivalence(setup):
    """Chunked offline encode (train_encoder_chunk) must match the
    monolithic batch: loss and gradients identical up to conv-tiling
    noise (frozen-BN encoders are pure per-image functions)."""
    from dataclasses import replace
    from rmem_ocu_tpu.engine.train_engine import TrainEngine
    exp, model = setup
    batch = _batch(2, seed=7)
    params = model.init(jax.random.PRNGKey(0), batch['frames'][:1, 0],
                        jnp.zeros((1, SIZE, SIZE, exp.model.id_dim)))
    rng = jax.random.PRNGKey(3)
    step = jnp.zeros(())

    def loss_fn(engine):
        def f(p):
            return engine.episode_loss(p, batch['frames'], batch['masks'],
                                       batch['obj_nums'], step, rng,
                                       enable_id_shuffle=False)[0]
        return jax.jit(jax.value_and_grad(f))

    l_mono, g_mono = loss_fn(TrainEngine(model, exp))(params)
    # b*t = 2*4 = 8 flat frames -> 4 chunks of 2
    eng_c = TrainEngine(model, replace(exp, train_encoder_chunk=2))
    l_chunk, g_chunk = loss_fn(eng_c)(params)

    np.testing.assert_allclose(float(l_mono), float(l_chunk), rtol=1e-5)
    flat_m = jax.tree.leaves(g_mono)
    flat_c = jax.tree.leaves(g_chunk)
    for a, b_ in zip(flat_m, flat_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


def test_tight_bank_capacity_equivalence(setup):
    """The episode-sized bank (4 slots at gap=1, T=4) must produce the
    same loss/grads as the full former+latter+1 ring: attention masks by
    live length and the PE interpolation depends only on it, so dead
    slots are pure padding."""
    from dataclasses import replace
    from rmem_ocu_tpu.engine.train_engine import TrainEngine
    exp, model = setup
    exp = replace(exp, train_long_term_mem_gap=1)
    batch = _batch(2, seed=11)
    params = model.init(jax.random.PRNGKey(0), batch['frames'][:1, 0],
                        jnp.zeros((1, SIZE, SIZE, exp.model.id_dim)))
    rng = jax.random.PRNGKey(3)
    step = jnp.zeros(())

    def run(engine):
        def f(p):
            return engine.episode_loss(p, batch['frames'], batch['masks'],
                                       batch['obj_nums'], step, rng,
                                       enable_id_shuffle=False)[0]
        return jax.jit(jax.value_and_grad(f))(params)

    eng_tight = TrainEngine(model, exp)
    assert eng_tight._episode_capacity(T) == 4  # 1 ref + 3 writes
    l_t, g_t = run(eng_tight)

    eng_full = TrainEngine(model, exp)
    eng_full._episode_capacity = lambda t: model.cfg.mem_bank_capacity
    l_f, g_f = run(eng_full)

    np.testing.assert_allclose(float(l_t), float(l_f), rtol=1e-6)
    for a, b_ in zip(jax.tree.leaves(g_t), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)


def test_episode_capacity_rules(setup):
    """Pure-function checks of the tight-bank sizing: falls back to the
    full ring whenever the write schedule can overflow former+latter."""
    from dataclasses import replace
    from rmem_ocu_tpu.engine.train_engine import TrainEngine
    exp, model = setup
    cfg = model.cfg

    def cap(gap, t):
        eng = TrainEngine(model, replace(exp, train_long_term_mem_gap=gap))
        return eng._episode_capacity(t)

    # recipe shape: gap 4, T 15 -> ref + 3 writes
    assert cap(4, 15) == 4
    # NO_MEMORY_GAP-style gap 1, T 15 -> 15 live > former+latter(9):
    # eviction active, full ring needed
    assert cap(1, 15) == cfg.mem_bank_capacity
    # huge gap -> ref frame only
    assert cap(9999, 15) == 1
    # exactly at the boundary: live == former+latter stays tight
    t_boundary = 1 + (cfg.former_mem_len + cfg.latter_mem_len - 1)
    assert cap(1, t_boundary) == cfg.former_mem_len + cfg.latter_mem_len
