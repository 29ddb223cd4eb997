"""Mixed-precision training (train_amp — the reference's --amp autocast +
GradScaler, aot_plus/networks/managers/trainer.py:170-176). TPU-native
version: bf16 forward/backward, fp32 params/optimizer, fp32 loss
reductions, no loss scaling. Checks: grads and optimizer state stay fp32,
the amp loss tracks the fp32 loss, and a full train step runs finite."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from dataclasses import replace
from jax.sharding import Mesh

from rmem_ocu_tpu.config import get_config
from rmem_ocu_tpu.engine.train_engine import TrainEngine
from rmem_ocu_tpu.models import build_vos_model
from rmem_ocu_tpu.train import Trainer

SIZE = 49
T = 3


def _data(b=1, seed=0):
    rng = np.random.RandomState(seed)
    frames = jnp.asarray(rng.randn(b, T, SIZE, SIZE, 3), jnp.float32)
    masks = jnp.asarray((rng.rand(b, T, SIZE, SIZE) * 3).astype(np.int32))
    obj_nums = jnp.full((b,), 2, jnp.int32)
    return frames, masks, obj_nums


@pytest.fixture(scope='module', params=['aott', 'deaott'])
def setup(request):
    exp = get_config('pre_vost', model=request.param)
    exp = replace(exp, train_total_steps=100, data_seq_len=T,
                  train_long_term_mem_gap=1)
    model = build_vos_model(exp.model)
    frames, masks, obj_nums = _data()
    params = model.init(jax.random.PRNGKey(0), frames[:1, 0],
                        jnp.zeros((1, SIZE, SIZE, exp.model.id_dim)))
    return exp, model, params, frames, masks, obj_nums


def _loss_and_grads(exp, model, params, frames, masks, obj_nums, amp):
    engine = TrainEngine(model, replace(exp, train_amp=amp))

    def loss_fn(p):
        loss, _ = engine.episode_loss(
            p, frames, masks, obj_nums, jnp.zeros((), jnp.int32),
            jax.random.PRNGKey(1), enable_id_shuffle=False)
        return loss

    return jax.value_and_grad(loss_fn)(params)


def test_amp_grads_are_fp32_and_loss_tracks(setup):
    exp, model, params, frames, masks, obj_nums = setup
    loss32, g32 = _loss_and_grads(exp, model, params, frames, masks,
                                  obj_nums, amp=False)
    loss16, g16 = _loss_and_grads(exp, model, params, frames, masks,
                                  obj_nums, amp=True)
    # gradients come back at the fp32 master dtype (the bf16 cast lives
    # inside the loss fn; its VJP casts back)
    for leaf in jax.tree.leaves(g16):
        assert leaf.dtype == jnp.float32
    # the loss itself reduces in fp32 and must track the full-precision
    # loss to bf16 rounding accumulated over the episode
    assert np.isfinite(float(loss16))
    assert abs(float(loss16) - float(loss32)) < 0.05 * abs(float(loss32))
    # grad direction agrees (cosine over the flattened tree)
    v32 = np.concatenate([np.asarray(x).ravel()
                          for x in jax.tree.leaves(g32)])
    v16 = np.concatenate([np.asarray(x).ravel()
                          for x in jax.tree.leaves(g16)])
    cos = float(np.dot(v32, v16) /
                (np.linalg.norm(v32) * np.linalg.norm(v16) + 1e-12))
    assert cos > 0.98, f'amp gradient diverged from fp32: cos={cos:.4f}'


def test_amp_train_step_end_to_end(setup):
    exp, model, params, frames, masks, obj_nums = setup
    del params
    exp = replace(exp, train_amp=True)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ('data',))
    trainer = Trainer(model, exp, mesh=mesh)
    batch = {'frames': frames, 'masks': masks, 'obj_nums': obj_nums}
    state = trainer.init_state(jax.random.PRNGKey(0), frames, masks)
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['loss']))
    assert float(metrics['grad_norm']) > 0
    # master params and optimizer state stay fp32
    for leaf in jax.tree.leaves(state.params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    for leaf in jax.tree.leaves(state.opt_state):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
