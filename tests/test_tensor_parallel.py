"""Tensor parallelism over a `model` mesh axis (parallel/tp.py).

The reference has data-parallel DDP only (trainer.py:94-113); TP is a
TPU-native extension. Correctness bar: a (data=2, model=4) mesh must
produce the same loss and the same updated parameters as the plain
2-device data mesh — GSPMD sharding must never change numerics."""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rmem_ocu_tpu.config import get_config
from rmem_ocu_tpu.models import build_vos_model
from rmem_ocu_tpu.parallel import tp
from rmem_ocu_tpu.train import Trainer

SIZE = 49
T = 3


def _batch(b, seed=3):
    rng = np.random.RandomState(seed)
    return {
        'frames': jnp.asarray(rng.randn(b, T, SIZE, SIZE, 3), jnp.float32),
        'masks': jnp.asarray((rng.rand(b, T, SIZE, SIZE) * 3).astype(
            np.int32)),
        'obj_nums': jnp.full((b,), 2, jnp.int32),
    }


def _exp():
    from dataclasses import replace
    exp = get_config('pre_vost', model='aott')
    return replace(exp, train_total_steps=100, data_seq_len=T)


def test_tp_specs_cover_transformer():
    """The spec table actually shards the LSTT projections and leaves
    encoder/decoder replicated."""
    exp = _exp()
    model = build_vos_model(exp.model)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, SIZE, SIZE, 3)),
                        jnp.zeros((1, SIZE, SIZE, exp.model.id_dim)))
    specs = jax.tree_util.tree_map_with_path(
        lambda p, x: tp.tp_param_spec(p, x, tp=2), params)
    flat = {'/'.join(str(getattr(k, 'key', k)) for k in p): s
            for p, s in jax.tree_util.tree_flatten_with_path(specs)[0]}
    sharded = {k for k, s in flat.items() if s != P()}
    assert any('linear_Q/kernel' in k for k in sharded)
    assert any('linear1/kernel' in k for k in sharded)
    assert any('projection/kernel' in k for k in sharded)
    assert all('/lstt/' in f'/{k}/' for k in sharded)
    # column kernel shards dim 1, row kernel shards dim 0
    q = next(k for k in sharded if 'linear_Q/kernel' in k)
    pr = next(k for k in sharded if 'projection/kernel' in k)
    assert flat[q] == P(None, 'model')
    assert flat[pr] == P('model', None)


def test_tp_serving_matches_single_device():
    """Serving-side TP: commit the params with shard_params and the
    unchanged InferEngine becomes an SPMD program (GSPMD infers the
    activation shardings from the committed arguments). Masks and
    eviction decisions must match the single-device run."""
    from jax.sharding import NamedSharding
    from rmem_ocu_tpu.engine import InferEngine

    devs = np.asarray(jax.devices())
    exp = _exp()
    model = build_vos_model(exp.model)
    rng = np.random.RandomState(0)
    imgs = [jnp.asarray(rng.randn(1, SIZE, SIZE, 3), jnp.float32)
            for _ in range(3)]
    mask = jnp.asarray((rng.rand(1, SIZE, SIZE) * 3).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), imgs[0],
                        jnp.zeros((1, SIZE, SIZE, exp.model.id_dim)))
    grid = ((SIZE - 1) // 16 + 1,) * 2

    def drive(params, mesh=None):
        if mesh is not None:
            params = tp.shard_params(params, mesh)
        eng = InferEngine(model, exp, long_term_mem_gap=1)
        state = eng.init_state(1, grid)
        if mesh is not None:
            state = jax.device_put(state, NamedSharding(mesh, P()))
        state = eng.add_reference_frame(params, state, imgs[0], mask,
                                        jnp.array([2], jnp.int32))
        out = []
        for img in imgs[1:]:
            if mesh is not None:
                img = jax.device_put(img, NamedSharding(mesh, P()))
            logits, state = eng.propagate(params, state, img)
            pred = eng.predict_mask(logits, (SIZE, SIZE))
            state = eng.update_memory(params, state, pred)
            out.append(np.asarray(pred))
        return out, np.asarray(state.bank.frame_ids)

    preds_1, ids_1 = drive(params)
    mesh = Mesh(devs.reshape(8), ('model',))
    preds_tp, ids_tp = drive(params, mesh)
    np.testing.assert_array_equal(ids_1, ids_tp)
    for a, b in zip(preds_1, preds_tp):
        assert (a == b).mean() > 0.999, (a != b).sum()


def test_tp_matches_dp():
    devs = np.asarray(jax.devices())
    assert devs.size == 8, 'conftest must provide 8 CPU devices'
    exp = _exp()
    model = build_vos_model(exp.model)
    batch = _batch(2)

    def run(mesh):
        trainer = Trainer(model, exp, mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(0), batch['frames'],
                                   batch['masks'])
        state = trainer.globalize_state(state)
        state, metrics = trainer.train_step(state, dict(batch),
                                            jax.random.PRNGKey(1))
        return state, float(metrics['loss'])

    s_dp, loss_dp = run(Mesh(devs[:2].reshape(2), ('data',)))
    s_tp, loss_tp = run(Mesh(devs.reshape(2, 4), ('data', 'model')))

    # some transformer weights must actually be distributed
    q = s_tp.params['params']['lstt']['block_0']['self_attn'][
        'linear_Q']['kernel']
    assert q.sharding.spec == P(None, 'model')

    np.testing.assert_allclose(loss_tp, loss_dp, rtol=2e-5)
    flat_dp = jax.tree_util.tree_leaves_with_path(s_dp.params)
    flat_tp = dict(jax.tree_util.tree_leaves_with_path(s_tp.params))
    # atol 2e-5: cross-mesh matmul partitioning changes fp32 reduction
    # order; Adam's rsqrt amplifies that on near-zero second moments
    for path, a in flat_dp:
        b = np.asarray(flat_tp[path])
        np.testing.assert_allclose(np.asarray(a), b, rtol=5e-4, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(path))


def test_spatial_sharding_matches_dp():
    """Sequence/spatial parallelism (train_spatial_sharding): episodes
    constrained to P('data', None, 'model') on H run the convs spatially
    partitioned (GSPMD halo exchange) on top of dp x tp. Numerics must
    match the plain data-parallel step."""
    from dataclasses import replace
    devs = np.asarray(jax.devices())
    assert devs.size == 8, 'conftest must provide 8 CPU devices'
    exp = _exp()
    model = build_vos_model(exp.model)
    batch = _batch(2)

    def run(mesh, exp_):
        trainer = Trainer(model, exp_, mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(0), batch['frames'],
                                   batch['masks'])
        state = trainer.globalize_state(state)
        state, metrics = trainer.train_step(state, dict(batch),
                                            jax.random.PRNGKey(1))
        return state, float(metrics['loss'])

    _, loss_dp = run(Mesh(devs[:2].reshape(2), ('data',)), exp)
    exp_sp = replace(exp, train_spatial_sharding=True)
    s_sp, loss_sp = run(Mesh(devs.reshape(2, 4), ('data', 'model')), exp_sp)
    np.testing.assert_allclose(loss_sp, loss_dp, rtol=2e-5)
    # the tp weight shardings still hold alongside the activation constraint
    q = s_sp.params['params']['lstt']['block_0']['self_attn'][
        'linear_Q']['kernel']
    assert q.sharding.spec == P(None, 'model')
