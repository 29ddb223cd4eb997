"""Training convergence: the optimizer loop must actually LEARN, not just
step. Overfits one static episode (every frame = the reference frame, so
propagation is pure memory copy) and asserts the loss collapses and the
train-time IoU improves — the miniature of the reference's 20k-step recipe
(aot_plus/train_vost.sh) that CI can afford.

The reference has no equivalent test; its proof of learning is the
published checkpoint table (README.md:50-53). This pins the same property
at smoke scale: losses (CE + SoftJaccard), LR schedule, grad clip, EMA and
the scan episode cooperate to descend.

Recipe notes (calibrated on the deterministic trajectory):
- hard mining off (top_k=1.0): the 100%->15% pixel ramp
  (reference aot_engine.py:130-146) destabilizes a 1-sample overfit;
- droppath off and encoder unfrozen (freeze_at=2 would pin a *random*
  stem — the reference default assumes ImageNet weights);
- per-step IoU stays noisy by design: enable_id_shuffle permutes object
  ids every step (reference aot_engine.py:223-231), so argmax quality
  depends on which permutation was sampled while the loss descends on
  average — hence the assertions are loss-ratio + best-IoU, not last-IoU.
"""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from rmem_ocu_tpu.config import get_config
from rmem_ocu_tpu.models import build_vos_model
from rmem_ocu_tpu.train import Trainer

SIZE = 49
T = 3
STEPS = 50


def _static_batch(seed=0):
    """One episode whose frames are all the same image + mask: the
    easiest possible propagation task (copy the reference mask)."""
    rng = np.random.RandomState(seed)
    img = rng.randn(1, 1, SIZE, SIZE, 3).astype(np.float32)
    mask = np.zeros((1, 1, SIZE, SIZE), np.int32)
    mask[:, :, 12:36, 8:30] = 1
    mask[:, :, 36:46, 30:46] = 2
    return {
        'frames': jnp.asarray(np.repeat(img, T, axis=1)),
        'masks': jnp.asarray(np.repeat(mask, T, axis=1)),
        'obj_nums': jnp.full((1,), 2, jnp.int32),
    }


def test_overfit_static_episode():
    exp = get_config('pre_vost', model='aott')
    from dataclasses import replace
    exp = replace(exp, train_total_steps=240, data_seq_len=T,
                  train_lr=2e-4, train_encoder_freeze_at=0,
                  train_top_k_percent_pixels=1.0,
                  train_lstt_droppath=0.0)
    model = build_vos_model(exp.model)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ('data',))
    trainer = Trainer(model, exp, mesh=mesh)

    batch = _static_batch()
    state = trainer.init_state(jax.random.PRNGKey(0), batch['frames'],
                               batch['masks'])
    rng = jax.random.PRNGKey(7)
    losses, ious = [], []
    for _ in range(STEPS):
        rng, step_rng = jax.random.split(rng)
        state, metrics = trainer.train_step(state, dict(batch), step_rng)
        losses.append(float(metrics['loss']))
        ious.append(float(metrics['iou']))

    assert np.isfinite(losses).all()
    first = np.mean(losses[:3])
    last = np.mean(losses[-5:])
    # loss must fall well below half on an overfittable episode
    # (calibrated trajectory reaches ~0.44x by step 50)
    assert last < 0.55 * first, (first, last, losses[::5])
    # the model must have found a good argmax segmentation at least once
    assert max(ious) > ious[0] + 0.2, (ious[0], max(ious), ious[::5])
    # EMA tracked the params (warmup decay active early on)
    ema0 = jax.tree.leaves(state.ema_params)[0]
    p0 = jax.tree.leaves(state.params)[0]
    assert np.allclose(np.asarray(ema0), np.asarray(p0), atol=0.05)
