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
