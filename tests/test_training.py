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
