"""Trainable-BatchNorm encoders (freeze_bn=False): torch-train-mode parity
and a full train step updating running stats.

Reference: build_encoder picks BatchNorm2d when MODEL_FREEZE_BN is off
(encoders/__init__.py:10-37) and the Trainer converts it to SyncBN under
DDP (trainer.py:104-105); here the running stats live in the flax
'batch_stats' collection and the cross-device statistic is global because
GSPMD computes the batch mean over the sharded axis.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rmem_ocu_tpu.config import get_config, get_model_config  # noqa: E402
from rmem_ocu_tpu.models.encoders.resnet import ResNetEncoder  # noqa: E402
from rmem_ocu_tpu.utils.torch_convert import convert_torch_params  # noqa: E402

from ref_utils import randomize_state_dict, setup_reference_path  # noqa: E402

setup_reference_path()

SIZE = 65


def _bn_paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _bn_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def test_resnet50_trainable_bn_parity_train_mode():
    """Forward in train mode: batch statistics normalize, running stats
    update with torch momentum/unbiased-var semantics."""
    from networks.encoders.resnet import ResNet, Bottleneck
    tenc = ResNet(Bottleneck, [3, 4, 6, 3], 16, torch.nn.BatchNorm2d)
    tenc.train()
    randomize_state_dict(tenc, seed=3)
    # keep running stats at non-trivial values
    for m in tenc.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            torch.nn.init.uniform_(m.running_var, 0.5, 1.5)
            torch.nn.init.normal_(m.running_mean, 0.0, 0.2)

    jenc = ResNetEncoder(layers=(3, 4, 6), frozen_bn=False)
    x = np.random.RandomState(0).randn(2, SIZE, SIZE, 3).astype(np.float32)
    variables = jenc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert 'batch_stats' in variables
    cfg = get_model_config('r50_aotl')
    params, missing = convert_torch_params(tenc.state_dict(), variables, cfg,
                                           strict=True)

    outs, updated = jenc.apply(params, jnp.asarray(x),
                               mutable=['batch_stats'])
    t_outs = tenc(torch.from_numpy(x).permute(0, 3, 1, 2))
    for got, want in zip(outs, t_outs):
        np.testing.assert_allclose(np.asarray(got),
                                   want.detach().permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-3, atol=1e-3)

    # running stats after one train-mode forward match torch exactly:
    # re-convert the post-forward torch state_dict and compare collections
    want_after, _ = convert_torch_params(tenc.state_dict(), variables, cfg,
                                         strict=True)
    for (pa, a), (pb, b) in zip(
            sorted(_bn_paths(updated['batch_stats'])),
            sorted(_bn_paths(want_after['batch_stats']))):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=str(pa))

    # eval mode (no mutable) uses the running stats — the ones the
    # train-mode forward just updated (torch updates them in place)
    outs_eval = jenc.apply(
        {'params': params['params'],
         'batch_stats': updated['batch_stats']}, jnp.asarray(x))
    tenc.eval()
    with torch.no_grad():
        t_eval = tenc(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(outs_eval[-1]),
                               t_eval[-1].permute(0, 2, 3, 1).numpy(),
                               rtol=1e-3, atol=1e-3)


def test_train_step_updates_batch_stats():
    """A full Trainer step with freeze_bn=False: BN affines train, running
    stats change via the mutable collection, EMA tracks buffers."""
    from dataclasses import replace

    from rmem_ocu_tpu.models import build_vos_model
    from rmem_ocu_tpu.train import Trainer
    from jax.sharding import Mesh

    exp = get_config('pre_vost', model='aott')
    exp = replace(exp, train_total_steps=100, data_seq_len=3,
                  model=replace(exp.model, freeze_bn=False))
    model = build_vos_model(exp.model)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ('data',))
    trainer = Trainer(model, exp, mesh=mesh)

    rng = np.random.RandomState(0)
    batch = {
        'frames': jnp.asarray(rng.randn(1, 3, 49, 49, 3), jnp.float32),
        'masks': jnp.asarray((rng.rand(1, 3, 49, 49) * 3).astype(np.int32)),
        'obj_nums': jnp.full((1,), 2, jnp.int32),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch['frames'],
                               batch['masks'])
    # past LR warmup: at step 0 the encoder LR is train_lr_min (~1e-8),
    # below fp32 resolution on O(1) weights
    state = state.replace(step=jnp.asarray(30, jnp.int32))
    assert 'batch_stats' in state.params
    bs0 = jax.tree.map(np.asarray, state.params['batch_stats'])
    # feat_0 (stem) is frozen by the default train_encoder_freeze_at=2
    # recipe; check a stage-4 block's BN affine instead
    def bn_affine(params):
        return np.asarray(
            params['params']['encoder']['feat_7']['conv_0']['bn']['weight'])

    bn_w0 = bn_affine(state.params)

    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['loss']))

    bs1 = state.params['batch_stats']
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        bs0, bs1))
    assert max(moved) > 0, 'running stats did not update'
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree.leaves(bs1))
    # BN affine weight trained (nonzero lr under freeze_bn=False);
    # encoder LR ratio puts the step at ~1e-6, so compare exactly
    bn_w1 = bn_affine(state.params)
    assert not np.array_equal(bn_w0, bn_w1), 'BN affine did not train'
    # EMA tracks the buffers too
    ema_bs = state.ema_params['batch_stats']
    assert max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        bs0, ema_bs))) > 0
