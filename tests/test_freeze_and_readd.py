"""Freeze-recipe wiring (reference trainer.py:65-92, encoders' freeze_at)
and mid-sequence reference re-add semantics (reference resets memory via
init_LSTT_memory, aot_engine.py:321-323)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from dataclasses import replace

from rmem_ocu_tpu.config import get_config
from rmem_ocu_tpu.engine import InferEngine
from rmem_ocu_tpu.models import build_vos_model
from rmem_ocu_tpu.train import optim

SIZE = 49


def _named_frozen(params, exp):
    _, _, frozen = optim.make_masks(params, exp)
    flat = {}
    frozen_flat = jax.tree_util.tree_flatten_with_path(frozen)[0]
    for kp, val in frozen_flat:
        flat[optim.path_str(kp)] = val
    return flat


def _init_params(exp):
    model = build_vos_model(exp.model)
    img = jnp.zeros((1, SIZE, SIZE, 3))
    oh = jnp.zeros((1, SIZE, SIZE, exp.model.id_dim))
    return model, model.init(jax.random.PRNGKey(0), img, oh)


def test_encoder_freeze_at_stages_mnv2():
    exp = get_config('pre_vost', model='aott')   # train_encoder_freeze_at=2
    _, params = _init_params(exp)
    frozen = _named_frozen(params, exp)
    # reference mobilenetv2 stages: features[0:4] frozen at freeze_at=2
    assert frozen['params.encoder.feat_0.conv.kernel']
    assert frozen['params.encoder.feat_3.conv_0.conv.kernel']
    assert not frozen['params.encoder.feat_4.conv_0.conv.kernel']
    assert not frozen['params.encoder.feat_18.conv.kernel']
    # non-encoder params unaffected
    assert not frozen['params.patch_wise_id_bank.kernel']

    exp4 = replace(exp, train_encoder_freeze_at=4)
    frozen4 = _named_frozen(params, exp4)
    assert frozen4['params.encoder.feat_13.conv_0.conv.kernel']
    assert not frozen4['params.encoder.feat_14.conv_0.conv.kernel']

    exp0 = replace(exp, train_encoder_freeze_at=0)
    frozen0 = _named_frozen(params, exp0)
    assert not frozen0['params.encoder.feat_0.conv.kernel']


def test_freeze_backbone_and_except_recipes():
    exp = get_config('pre_vost', model='aott',
                     use_temporal_pe=True, gru_memory=True)
    _, params = _init_params(exp)

    exp_fb = replace(exp, model=replace(exp.model, freeze_backbone=True))
    frozen = _named_frozen(params, exp_fb)
    assert all(v for k, v in frozen.items() if '.encoder.' in k)
    assert not frozen['params.lstt.block_0.linear_Q.kernel']

    exp_pe = replace(exp, model=replace(exp.model,
                                        freeze_except_temporal_pe=True))
    frozen = _named_frozen(params, exp_pe)
    for k, v in frozen.items():
        if 'cur_pos_emb' in k or 'mem_pos_emb' in k:
            assert not v, k
        else:
            assert v, k

    exp_gru = replace(exp, model=replace(exp.model, freeze_except_gru=True))
    frozen = _named_frozen(params, exp_gru)
    for k, v in frozen.items():
        if 'memory_gru' in k:
            assert not v, k
        else:
            assert v, k


def test_freeze_except_temporal_pe_train_step():
    """A real optimizer step moves ONLY cur_pos_emb/mem_pos_emb; every other
    leaf is bit-identical (reference trainer.py:72-80)."""
    from jax.sharding import Mesh
    from rmem_ocu_tpu.train import Trainer

    exp = get_config('pre_vost', model='aott', use_temporal_pe=True)
    exp = replace(exp, train_total_steps=100, data_seq_len=3,
                  model=replace(exp.model, freeze_except_temporal_pe=True))
    model = build_vos_model(exp.model)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ('data',))
    trainer = Trainer(model, exp, mesh=mesh)

    rng = np.random.RandomState(0)
    batch = {
        'frames': jnp.asarray(rng.randn(1, 3, SIZE, SIZE, 3), jnp.float32),
        'masks': jnp.asarray((rng.rand(1, 3, SIZE, SIZE) * 3).astype(
            np.int32)),
        'obj_nums': jnp.full((1,), 2, jnp.int32),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch['frames'],
                               batch['masks'])
    before = jax.tree.map(np.asarray, state.params)
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['loss']))

    after = state.params
    flat_b = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_a = jax.tree.leaves(after)
    moved = []
    for (kp, b), a in zip(flat_b, flat_a):
        name = optim.path_str(kp)
        if np.array_equal(b, np.asarray(a)):
            continue
        moved.append(name)
    assert moved, 'nothing trained'
    for name in moved:
        assert 'cur_pos_emb' in name or 'mem_pos_emb' in name, name


def test_readd_reference_resets_memory():
    """Mid-sequence add_reference_frame empties the bank/short window and
    the eviction state (reference init_LSTT_memory + init_memory,
    transformer.py:438-453)."""
    exp = get_config('pre_vost', model='aott')
    model = build_vos_model(exp.model)
    cfg = exp.model
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, SIZE, SIZE, 3), jnp.float32)
    mask = jnp.asarray((rng.rand(1, SIZE, SIZE) * 3).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), img,
                        jnp.zeros((1, SIZE, SIZE, cfg.id_dim)))
    eng = InferEngine(model, exp, long_term_mem_gap=1)
    h16 = (SIZE - 1) // 16 + 1
    st = eng.init_state(1, (h16, h16))
    st = eng.add_reference_frame(params, st, img, mask,
                                 jnp.array([2], jnp.int32))
    for _ in range(3):
        logits, st = eng.propagate(params, st, img)
        st = eng.update_memory(params, st,
                               eng.predict_mask(logits, (SIZE, SIZE)))
    assert int(st.bank.length[0]) > 1
    assert int(st.short.count[0]) > 1

    st2 = eng.add_reference_frame(params, st, img, mask,
                                  jnp.array([2], jnp.int32))
    assert int(st2.bank.length[0]) == 1
    assert int(st2.short.count[0]) == 1
    # the re-added reference is the only live frame, stamped with the
    # current frame step; eviction bookkeeping restarts
    assert int(st2.bank.frame_ids[0, 0]) == int(st2.frame_step)
    assert list(np.asarray(st2.bank.frame_ids[0, 1:])) == [-1] * (
        cfg.mem_bank_capacity - 1)
    np.testing.assert_array_equal(np.asarray(st2.bank.visits), 0.0)
    assert not bool(np.asarray(st2.bank.ema_present).any())
