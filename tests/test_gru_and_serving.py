"""GRU memory compression + batched multi-stream serving tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from dataclasses import replace

from rmem_ocu_tpu.config import get_config
from rmem_ocu_tpu.engine import InferEngine
from rmem_ocu_tpu.models import build_vos_model

SIZE = 65


def test_gru_memory_compression():
    """GRU_MEMORY folds the evicted slot into slot 1 via ConvGRU
    (reference transformer.py:420-430); bank stays at budget and the
    hidden state evolves."""
    exp = get_config('pre_vost', model='aott')
    exp = replace(exp, model=replace(exp.model, gru_memory=True,
                                     former_mem_len=1, latter_mem_len=2))
    cfg = exp.model
    model = build_vos_model(cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, SIZE, SIZE, 3), jnp.float32)
    mask = jnp.asarray((rng.rand(1, SIZE, SIZE) * 3).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), img,
                        jnp.zeros((1, SIZE, SIZE, cfg.id_dim)))
    eng = InferEngine(model, exp, long_term_mem_gap=1)
    st = eng.init_state(1, (5, 5))
    st = eng.add_reference_frame(params, st, img, mask,
                                 jnp.array([2], jnp.int32))
    norms = []
    for t in range(5):
        lg, st = eng.propagate(
            params, st, jnp.asarray(rng.randn(1, SIZE, SIZE, 3),
                                    jnp.float32))
        st = eng.update_memory(params, st, eng.predict_mask(lg,
                                                            (SIZE, SIZE)))
        norms.append(float(jnp.linalg.norm(jnp.stack(st.gru_hidden_k))))
    assert int(st.bank.length[0]) == 3          # 1 former + 2 latter
    # the first eviction (and first GRU update) happens once the bank
    # exceeds budget, so the norm starts at 0 and then evolves
    assert norms[-1] > 0 and norms[-1] != norms[1]
    assert np.all(np.isfinite(np.asarray(lg)))


def test_batched_multistream_serving():
    """Multiple independent streams share one engine state via the batch
    axis (BASELINE.json configs[4]); per-stream banks diverge."""
    exp = get_config('pre_vost', model='aott')
    cfg = exp.model
    model = build_vos_model(cfg)
    rng = np.random.RandomState(1)
    n_streams = 3
    imgs0 = jnp.asarray(rng.randn(n_streams, SIZE, SIZE, 3), jnp.float32)
    masks0 = jnp.asarray((rng.rand(n_streams, SIZE, SIZE) * 3).astype(
        np.int32))
    params = model.init(jax.random.PRNGKey(0), imgs0[:1],
                        jnp.zeros((1, SIZE, SIZE, cfg.id_dim)))
    eng = InferEngine(model, exp, long_term_mem_gap=1)
    st = eng.init_state(n_streams, (5, 5))
    st = eng.add_reference_frame(params, st, imgs0, masks0,
                                 jnp.full((n_streams,), 2, jnp.int32))
    for t in range(3):
        frames = jnp.asarray(rng.randn(n_streams, SIZE, SIZE, 3),
                             jnp.float32)
        lg, st = eng.propagate(params, st, frames)
        preds = eng.predict_mask(lg, (SIZE, SIZE))
        st = eng.update_memory(params, st, preds)
    assert st.bank.length.tolist() == [4] * n_streams
    # streams see different content -> different banks and masks
    k = np.asarray(st.bank.k[0])
    assert not np.allclose(k[0], k[1])
    p = np.asarray(preds)
    assert (p[0] != p[1]).mean() > 0.01
