"""Training-episode loss parity: our scan episode vs the reference
AOTEngine.forward with converted weights (dropout/droppath off)."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from dataclasses import replace  # noqa: E402

from rmem_ocu_tpu.config import get_config  # noqa: E402
from rmem_ocu_tpu.engine.train_engine import TrainEngine  # noqa: E402
from rmem_ocu_tpu.models import build_vos_model  # noqa: E402
from rmem_ocu_tpu.utils.torch_convert import convert_torch_params  # noqa: E402

from ref_utils import (make_torch_cfg, randomize_state_dict,  # noqa: E402
                       setup_reference_path)

setup_reference_path()

SIZE = 81
T = 5


def _patch_assign_identity(engine):
    orig = engine.assign_identity

    def patched(one_hot_mask, ignore_mask=None):
        if ignore_mask is None:
            ignore_mask = torch.zeros(
                one_hot_mask.shape[0], 1, one_hot_mask.shape[2],
                one_hot_mask.shape[3])
        return orig(one_hot_mask, ignore_mask)

    engine.assign_identity = patched


@pytest.mark.parametrize('reverse_infer', [False, True])
def test_train_episode_loss_parity(reverse_infer):
    exp = get_config('pre_vost', model='aott')
    # droppath off on both sides: parity must not depend on which paths a
    # particular PRNG seed happens to keep
    exp = replace(exp, data_seq_len=T, train_total_steps=1000,
                  train_lstt_droppath=0.0)
    if reverse_infer:
        # REVERSE_INFER: backward-consistency loss re-running the LSTT on
        # the reference frame against the current memories
        # (reference aot_engine.py:371-396). gap=1 so the reverse pass
        # actually fires (three long writes in a T=5 episode; the default
        # gap of 4 never writes within the episode)
        exp = replace(exp, train_long_term_mem_gap=1,
                      model=replace(exp.model, reverse_infer=True))
    cfg = exp.model
    jmodel = build_vos_model(cfg, exp)

    tcfg = make_torch_cfg(cfg, exp)
    tcfg.TRAIN_LSTT_DROPPATH = 0.0
    from networks.models.aot import AOT
    from networks.engines.aot_engine import AOTEngine
    tmodel = AOT(tcfg, encoder=cfg.encoder)
    tmodel.eval()  # disables dropout/droppath; losses still computed
    randomize_state_dict(tmodel, seed=31)

    rng = np.random.RandomState(2)
    frames = rng.randn(1, T, SIZE, SIZE, 3).astype(np.float32) * 0.5
    masks = (rng.rand(1, T, SIZE, SIZE) * 3).astype(np.int64)
    step = 100

    # --- ours ---
    variables = jmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, SIZE, SIZE, 3)),
                            jnp.zeros((1, SIZE, SIZE, cfg.id_dim)))
    params, _ = convert_torch_params(tmodel.state_dict(), variables, cfg,
                                     strict=True)
    eng = TrainEngine(jmodel, exp)
    loss, aux = eng.episode_loss(
        params, jnp.asarray(frames), jnp.asarray(masks.astype(np.int32)),
        jnp.array([2], jnp.int32), jnp.asarray(step, jnp.float32),
        jax.random.PRNGKey(0), use_prev_pred=False,
        enable_id_shuffle=False)

    # --- reference (gap matches exp.train_long_term_mem_gap) ---
    teng = AOTEngine(tmodel, gpu_id=0,
                     long_term_mem_gap=exp.train_long_term_mem_gap,
                     short_term_mem_skip=1)
    if reverse_infer:
        # the reference gates the reverse loss on self.training
        # (aot_engine.py:391-395); all dropout rates are zeroed above so
        # train mode is still deterministic
        teng.train()
    else:
        teng.eval()
    teng.restart_engine(batch_size=1, enable_id_shuffle=False)
    _patch_assign_identity(teng)
    t_frames = torch.from_numpy(
        frames.reshape(T, SIZE, SIZE, 3)).permute(0, 3, 1, 2)
    t_masks = torch.from_numpy(masks.reshape(T, 1, SIZE, SIZE))
    with torch.no_grad():
        t_loss, t_pred, t_all_loss, _ = teng(
            t_frames, t_masks, batch_size=1, obj_nums=[2], step=step,
            use_prev_pred=False)

    np.testing.assert_allclose(float(loss), float(t_loss), rtol=2e-3,
                               atol=2e-3)
    if not reverse_infer:
        # per-frame prediction losses too (ours: [T-1] means over batch);
        # with reverse_infer the reference interleaves the reverse entries
        # into all_frame_loss, so only the total is position-comparable
        ours = np.asarray(aux['frame_losses'])
        theirs = np.array([float(l) for l in t_all_loss[1:]])
        np.testing.assert_allclose(ours, theirs, rtol=5e-3, atol=5e-3)


def test_train_episode_grad_parity_reverse():
    """Gradient parity with reverse_infer on: the reference detaches the
    frame-1 short memories before the reverse pass (aot_engine.py:373-375),
    so grads — not just the loss value — must match. The torch grads are
    collected per parameter and mapped through the same converter as the
    weights, giving a full-tree comparison in flax layout."""
    exp = get_config('pre_vost', model='aott')
    exp = replace(exp, data_seq_len=T, train_total_steps=1000,
                  train_lstt_droppath=0.0, train_long_term_mem_gap=1,
                  model=replace(exp.model, reverse_infer=True))
    cfg = exp.model
    jmodel = build_vos_model(cfg, exp)

    tcfg = make_torch_cfg(cfg, exp)
    tcfg.TRAIN_LSTT_DROPPATH = 0.0
    from networks.models.aot import AOT
    from networks.engines.aot_engine import AOTEngine
    tmodel = AOT(tcfg, encoder=cfg.encoder)
    randomize_state_dict(tmodel, seed=31)
    tmodel.train()

    rng = np.random.RandomState(2)
    frames = rng.randn(1, T, SIZE, SIZE, 3).astype(np.float32) * 0.5
    masks = (rng.rand(1, T, SIZE, SIZE) * 3).astype(np.int64)
    step = 100

    variables = jmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, SIZE, SIZE, 3)),
                            jnp.zeros((1, SIZE, SIZE, cfg.id_dim)))
    params, _ = convert_torch_params(tmodel.state_dict(), variables, cfg,
                                     strict=True)
    eng = TrainEngine(jmodel, exp)

    def loss_fn(p):
        loss, _ = eng.episode_loss(
            p, jnp.asarray(frames), jnp.asarray(masks.astype(np.int32)),
            jnp.array([2], jnp.int32), jnp.asarray(step, jnp.float32),
            jax.random.PRNGKey(0), use_prev_pred=False,
            enable_id_shuffle=False)
        return loss

    got_grads = jax.grad(loss_fn)(params)

    teng = AOTEngine(tmodel, gpu_id=0,
                     long_term_mem_gap=1, short_term_mem_skip=1)
    teng.train()
    teng.restart_engine(batch_size=1, enable_id_shuffle=False)
    _patch_assign_identity(teng)
    t_frames = torch.from_numpy(
        frames.reshape(T, SIZE, SIZE, 3)).permute(0, 3, 1, 2)
    t_masks = torch.from_numpy(masks.reshape(T, 1, SIZE, SIZE))
    t_loss, _, _, _ = teng(t_frames, t_masks, batch_size=1, obj_nums=[2],
                           step=step, use_prev_pred=False)
    t_loss.backward()

    gsd = {k: (p.grad if p.grad is not None else torch.zeros_like(p))
           for k, p in tmodel.named_parameters()}
    for k, b in tmodel.named_buffers():
        gsd[k] = torch.zeros_like(b)
    want_grads, _ = convert_torch_params(gsd, variables, cfg, strict=True)

    # the reference freezes encoder stages via requires_grad=False inside
    # the encoder (TRAIN_ENCODER_FREEZE_AT=2, mobilenetv2.py:240-247) so
    # those torch grads are zero; we implement the same freeze as lr-0
    # masks + grad zeroing in the trainer, so episode-level grads for
    # frozen leaves intentionally differ — skip them here
    from rmem_ocu_tpu.train.optim import make_masks
    _, _, frozen_tree = make_masks(params, exp)
    flat_frozen = jax.tree_util.tree_leaves(frozen_tree)
    flat_got = jax.tree_util.tree_flatten_with_path(got_grads)[0]
    flat_want = jax.tree_util.tree_leaves(want_grads)
    bad = []
    for (kp, g), w, fz in zip(flat_got, flat_want, flat_frozen):
        if fz:
            continue
        g = np.asarray(g).ravel().astype(np.float64)
        w = np.asarray(w).ravel().astype(np.float64)
        gn, wn = np.linalg.norm(g), np.linalg.norm(w)
        name = '.'.join(str(getattr(k, 'key', k)) for k in kp)
        if wn < 1e-9 and gn < 1e-9:
            continue
        cos = float(g @ w / (gn * wn + 1e-30))
        ratio = float(gn / (wn + 1e-30))
        if cos < 0.999 or not (0.98 < ratio < 1.02):
            bad.append((name, cos, ratio))
    assert not bad, f'{len(bad)} leaves diverge, e.g. {bad[:5]}'
