"""TRAIN_OPT='sgd' parity: our clip -> L2-into-grad -> momentum chain with
per-group LRs must match torch.optim.SGD exactly (reference
trainer.py:155-167 + clip at :552)."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from dataclasses import replace  # noqa: E402

from rmem_ocu_tpu.config import get_config  # noqa: E402
from rmem_ocu_tpu.train import optim  # noqa: E402


def test_sgd_matches_torch_sgd():
    exp = get_config('pre_vost', model='aott')
    exp = replace(exp, train_opt='sgd', train_sgd_momentum=0.9,
                  train_encoder_freeze_at=0, train_total_steps=100)

    rng = np.random.RandomState(0)
    p_enc = rng.randn(4, 4).astype(np.float32)
    p_head = rng.randn(4, 4).astype(np.float32)
    p_bias = rng.randn(4).astype(np.float32)
    params = {'params': {'encoder': {'conv1': {'kernel': jnp.asarray(p_enc)}},
                         'head': {'kernel': jnp.asarray(p_head),
                                  'bias': jnp.asarray(p_bias)}}}

    tx = optim.make_optimizer(exp, params)
    opt_state = tx.init(params)
    masks = optim.make_masks(params, exp)
    wd_tree = masks[0]

    t_enc = torch.nn.Parameter(torch.from_numpy(p_enc.copy()))
    t_head = torch.nn.Parameter(torch.from_numpy(p_head.copy()))
    t_bias = torch.nn.Parameter(torch.from_numpy(p_bias.copy()))
    mn, ratio = exp.train_lr_min, exp.train_lr_encoder_ratio
    wd = exp.train_weight_decay
    topt = torch.optim.SGD(
        [{'params': [t_enc], 'lr': 0.0, 'weight_decay': wd},
         {'params': [t_head], 'lr': 0.0, 'weight_decay': wd},
         {'params': [t_bias], 'lr': 0.0, 'weight_decay': 0.0}],
        lr=1e-3, momentum=exp.train_sgd_momentum, nesterov=True)

    for step in range(4):
        g_enc = rng.randn(4, 4).astype(np.float32)
        g_head = rng.randn(4, 4).astype(np.float32)
        g_bias = rng.randn(4).astype(np.float32)
        grads = {'params': {
            'encoder': {'conv1': {'kernel': jnp.asarray(g_enc)}},
            'head': {'kernel': jnp.asarray(g_head),
                     'bias': jnp.asarray(g_bias)}}}

        now_lr = float(optim.schedule_lr(step, exp))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optim.apply_updates(params, updates, masks, now_lr, exp)

        # torch mirror: clip jointly, per-group lr like the reference's
        # adjust_learning_rate (encoder affine ratio)
        t_enc.grad = torch.from_numpy(g_enc.copy())
        t_head.grad = torch.from_numpy(g_head.copy())
        t_bias.grad = torch.from_numpy(g_bias.copy())
        torch.nn.utils.clip_grad_norm_([t_enc, t_head, t_bias],
                                       exp.train_clip_grad_norm)
        topt.param_groups[0]['lr'] = (now_lr - mn) * ratio + mn
        topt.param_groups[1]['lr'] = now_lr
        topt.param_groups[2]['lr'] = now_lr
        topt.step()

        np.testing.assert_allclose(
            np.asarray(params['params']['encoder']['conv1']['kernel']),
            t_enc.detach().numpy(), rtol=1e-5, atol=1e-7,
            err_msg=f'enc step {step}')
        np.testing.assert_allclose(
            np.asarray(params['params']['head']['kernel']),
            t_head.detach().numpy(), rtol=1e-5, atol=1e-7,
            err_msg=f'head step {step}')
        np.testing.assert_allclose(
            np.asarray(params['params']['head']['bias']),
            t_bias.detach().numpy(), rtol=1e-5, atol=1e-7,
            err_msg=f'bias step {step}')
    # sanity: wd classification matched the torch groups we mirrored
    assert float(jax.tree.leaves(wd_tree)[0]) in (0.0, wd)
