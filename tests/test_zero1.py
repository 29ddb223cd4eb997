"""ZeRO stage 1: optimizer-moment sharding over the data axis.

TPU-native extension (the reference's DDP replicates optimizer state on
every rank, trainer.py:94-113). Correctness bar: a zero1 run must be
numerically identical to the replicated data-parallel run — the moments
are merely laid out 1/dp per device and GSPMD all-gathers the updates.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from dataclasses import replace
from jax.sharding import Mesh, PartitionSpec as P

from rmem_ocu_tpu.config import get_config
from rmem_ocu_tpu.models import build_vos_model
from rmem_ocu_tpu.parallel import tp
from rmem_ocu_tpu.train import Trainer

SIZE = 49
T = 3


def _batch(b, seed=0):
    rng = np.random.RandomState(seed)
    return {
        'frames': jnp.asarray(rng.randn(b, T, SIZE, SIZE, 3), jnp.float32),
        'masks': jnp.asarray((rng.rand(b, T, SIZE, SIZE) * 3).astype(
            np.int32)),
        'obj_nums': jnp.full((b,), 2, jnp.int32),
    }


def _run(exp, model, zero1: bool, steps=2):
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ('data',))
    trainer = Trainer(model, replace(exp, train_zero1=zero1), mesh=mesh)
    batch = _batch(8, seed=3)
    state = trainer.init_state(jax.random.PRNGKey(0), batch['frames'],
                               batch['masks'])
    state = trainer.globalize_state(state)
    losses = []
    for i in range(steps):
        state, metrics = trainer.train_step(state, _batch(8, seed=3 + i),
                                            jax.random.PRNGKey(7))
        losses.append(float(metrics['loss']))
    return state, losses


def test_zero1_spec_picks_largest_free_divisible_dim():
    assert tp._zero1_spec(P(), (16, 4), 8) == P('data', None)
    assert tp._zero1_spec(P(), (4, 16), 8) == P(None, 'data')
    # TP-taken dim is skipped even if larger
    assert tp._zero1_spec(P(None, 'model'), (8, 64), 8) == P('data', 'model')
    # nothing divisible: unchanged (replicated moment)
    assert tp._zero1_spec(P(), (3, 5), 8) == P()
    # scalars: unchanged
    assert tp._zero1_spec(P(), (), 8) == P()


def test_zero1_moments_are_sharded_and_numerics_match():
    assert len(jax.devices()) == 8, 'conftest must provide 8 CPU devices'
    exp = get_config('pre_vost', model='aott')
    exp = replace(exp, train_total_steps=100, data_seq_len=T)
    model = build_vos_model(exp.model)

    state_ref, losses_ref = _run(exp, model, zero1=False)
    state_z, losses_z = _run(exp, model, zero1=True)

    np.testing.assert_allclose(losses_z, losses_ref, rtol=2e-5)
    for a, b in zip(jax.tree.leaves(state_z.params),
                    jax.tree.leaves(state_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    # the Adam moments really are laid out over the data axis
    sharded = [x for x in jax.tree.leaves(state_z.opt_state)
               if x.ndim and 'data' in
               getattr(x.sharding, 'spec', P())]
    assert sharded, 'no optimizer moment leaf was sharded over data'
    # and each sharded leaf stores 1/8 per device
    x = max(sharded, key=lambda v: v.size)
    shard_size = x.addressable_shards[0].data.size
    assert shard_size * 8 == x.size
    # params stayed replicated
    p = jax.tree.leaves(state_z.params)[0]
    assert p.sharding.is_fully_replicated
