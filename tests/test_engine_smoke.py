"""End-to-end engine smoke: reference frame + several propagations with
memory growth, restriction, and eviction, for both model families."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rmem_ocu_tpu.config import get_config, get_model_config
from rmem_ocu_tpu.engine import InferEngine
from rmem_ocu_tpu.models import build_vos_model


def _run_engine(model_name, frames=8, size=65, gap=1):
    exp = get_config('pre_vost', model=model_name)
    cfg = exp.model
    model = build_vos_model(cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, size, size, 3), jnp.float32)
    mask = jnp.asarray((rng.rand(1, size, size) * 3).astype(np.int32))

    oh = jnp.zeros((1, size, size, cfg.id_dim))
    params = model.init(jax.random.PRNGKey(0), img, oh)

    engine = InferEngine(model, exp, long_term_mem_gap=gap)
    h16 = (size - 1) // 16 + 1 if cfg.align_corners else size // 16
    state = engine.init_state(1, (h16, h16))
    state = engine.add_reference_frame(params, state, img, mask,
                                       jnp.array([2], jnp.int32))
    assert int(state.bank.length[0]) == 1

    lengths = []
    for t in range(frames):
        frame = jnp.asarray(rng.randn(1, size, size, 3), jnp.float32)
        logits, state = engine.propagate(params, state, frame)
        assert logits.shape[-1] == cfg.max_obj_num + 1
        assert np.all(np.isfinite(np.asarray(logits)))
        pred = engine.predict_mask(logits, (size, size))
        state = engine.update_memory(params, state, pred)
        lengths.append(int(state.bank.length[0]))
    return lengths, cfg


@pytest.mark.parametrize('model_name', ['aott', 'r50_deaotl'])
def test_engine_memory_growth_and_restriction(model_name):
    budget_cfg = get_model_config(model_name)
    frames = 14
    lengths, cfg = _run_engine(model_name, frames=frames)
    budget = cfg.former_mem_len + cfg.latter_mem_len
    # memory grows by one per frame (gap=1) until the budget, then stays
    expect = [min(2 + t, budget) for t in range(frames)]
    assert lengths == expect


def test_unused_id_logits_masked():
    exp = get_config('pre_vost', model='aott')
    cfg = exp.model
    model = build_vos_model(cfg)
    rng = np.random.RandomState(1)
    size = 65
    img = jnp.asarray(rng.randn(1, size, size, 3), jnp.float32)
    mask = (jnp.arange(size * size).reshape(1, size, size) % 2).astype(
        jnp.int32)
    params = model.init(jax.random.PRNGKey(0), img,
                        jnp.zeros((1, size, size, cfg.id_dim)))
    engine = InferEngine(model, exp, long_term_mem_gap=2)
    state = engine.init_state(1, (5, 5))
    state = engine.add_reference_frame(params, state, img, mask,
                                       jnp.array([1], jnp.int32))
    logits, state = engine.propagate(params, state, img)
    arr = np.asarray(logits)
    assert np.all(arr[..., 2:] <= -1e9)
    assert np.all(arr[..., :2] > -1e9)
