"""Oracle (USE_MASK) streaming parity: the mask-conditioned TopDown
encoder driven through the full engine loop vs the reference.

Reference protocol (networks/managers/evaluator.py:379-418 with
ORACLE=True): every frame's GT label (int, nearest-resized) is fed to
match_propogate_one_frame and conditions the encoder
(aot.py:115-124 binarizes it, resnet.py:326-335 multiplies the 16x
feature); the reference frame is ALSO encoded mask-conditioned
(aot_engine.py:258-260). Memory updates still use the prediction.

Round-3 bugs this pins: add_reference_frame dropped the mask before the
encoder, and the label reached the encoder un-binarized (raw id values
scaling features)."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rmem_ocu_tpu.config import get_config  # noqa: E402
from rmem_ocu_tpu.engine import InferEngine  # noqa: E402
from rmem_ocu_tpu.models import build_vos_model  # noqa: E402
from rmem_ocu_tpu.utils.torch_convert import convert_torch_params  # noqa: E402

from ref_utils import (make_torch_cfg, randomize_state_dict,  # noqa: E402
                       setup_reference_path)

setup_reference_path()

SIZE = 81
FRAMES = 8


def test_streaming_oracle_parity():
    from dataclasses import replace

    exp = get_config('pre_vost', model='r50_topdown_aotl', oracle=True)
    exp = replace(exp, model=replace(exp.model, latter_mem_len=3))
    cfg = exp.model
    assert cfg.use_mask
    jmodel = build_vos_model(cfg)

    tcfg = make_torch_cfg(cfg, exp)
    from networks.models.aot import AOT
    tmodel = AOT(tcfg, encoder=cfg.encoder)
    tmodel.eval()
    randomize_state_dict(tmodel, seed=5)

    rng = np.random.RandomState(7)
    img0 = rng.randn(1, SIZE, SIZE, 3).astype(np.float32)
    mask0 = (rng.rand(1, SIZE, SIZE) * 3).astype(np.int64)
    frames = [rng.randn(1, SIZE, SIZE, 3).astype(np.float32) * 0.5 + img0
              for _ in range(FRAMES)]
    # per-frame GT labels for the oracle: drift the reference mask
    gts = [np.roll(mask0, t + 1, axis=2) for t in range(FRAMES)]

    variables = jmodel.init(
        jax.random.PRNGKey(0), jnp.asarray(img0),
        jnp.zeros((1, SIZE, SIZE, cfg.id_dim)))
    params, _ = convert_torch_params(tmodel.state_dict(), variables, cfg,
                                     strict=True)
    eng = InferEngine(jmodel, exp, long_term_mem_gap=1)
    h16 = (SIZE - 1) // 16 + 1
    st = eng.init_state(1, (h16, h16))
    st = eng.add_reference_frame(params, st, jnp.asarray(img0),
                                 jnp.asarray(mask0.astype(np.int32)),
                                 jnp.array([2], jnp.int32))

    from networks.engines.aot_engine import AOTEngine
    teng = AOTEngine(tmodel, gpu_id=0, long_term_mem_gap=1,
                     short_term_mem_skip=1)
    teng.eval()
    teng.restart_engine(batch_size=1, enable_id_shuffle=False)
    # the reference hardcodes a CUDA default ignore mask
    # (aot_engine.py:208-213); route it to CPU
    orig_assign = teng.assign_identity

    def patched(one_hot_mask, ignore_mask=None):
        if ignore_mask is None:
            ignore_mask = torch.zeros(
                one_hot_mask.shape[0], 1, one_hot_mask.shape[2],
                one_hot_mask.shape[3])
        return orig_assign(one_hot_mask, ignore_mask)

    teng.assign_identity = patched
    with torch.no_grad():
        teng.add_reference_frame(
            torch.from_numpy(img0).permute(0, 3, 1, 2),
            torch.from_numpy(mask0).unsqueeze(1).int(),
            obj_nums=[2], frame_step=0)

    _stream_and_compare(eng, params, st, teng, frames, gts)


def _stream_and_compare(eng, params, st, teng, frames, gts):
    for t, (frame, gt) in enumerate(zip(frames, gts)):
        gt_j = jnp.asarray(gt.astype(np.int32))[..., None]  # [B,H,W,1] int
        logits, st = eng.propagate(params, st, jnp.asarray(frame),
                                   mask=gt_j)
        with torch.no_grad():
            t_logits = teng.match_propogate_one_frame(
                torch.from_numpy(frame).permute(0, 3, 1, 2),
                mask=torch.from_numpy(gt).unsqueeze(1).int())
        np.testing.assert_allclose(
            np.asarray(logits)[..., :3],
            t_logits.permute(0, 2, 3, 1).numpy()[..., :3],
            rtol=2e-3, atol=2e-3,
            err_msg=f'oracle logits diverged at frame {t}')

        pred = eng.predict_mask(logits, (SIZE, SIZE))
        with torch.no_grad():
            t_pred = teng.predict_current_mask()
        np.testing.assert_array_equal(
            np.asarray(pred)[0], t_pred.numpy()[0],
            err_msg=f'oracle mask diverged at frame {t}')

        st = eng.update_memory(params, st, pred)
        with torch.no_grad():
            teng.update_short_term_memory(t_pred.unsqueeze(1).float())

        t_len = teng.AOT.LSTT.long_term_memories[0][0].shape[0]
        assert int(st.bank.length[0]) == t_len, f'frame {t}'
        got_ids = list(np.asarray(st.bank.ordered_frame_ids[0][:t_len]))
        assert got_ids == teng.long_memories_indexes, f'frame {t}'


def test_oracle_train_episode_loss_parity():
    """ORACLE training: the offline encode consumes the GT labels
    (reference offline_encoder, aot_engine.py:178-183) and the var-loss
    joins the total (aot_engine.py:115-118). Episode loss must match the
    reference AOTEngine.forward with converted weights."""
    from dataclasses import replace

    from rmem_ocu_tpu.engine.train_engine import TrainEngine

    T = 4
    exp = get_config('pre_vost', model='r50_topdown_aotl', oracle=True)
    exp = replace(exp, data_seq_len=T, train_total_steps=1000,
                  train_lstt_droppath=0.0)
    cfg = exp.model
    assert cfg.use_mask and cfg.var_loss_weight is not None
    jmodel = build_vos_model(cfg, exp)

    tcfg = make_torch_cfg(cfg, exp)
    tcfg.TRAIN_LSTT_DROPPATH = 0.0
    from networks.models.aot import AOT
    from networks.engines.aot_engine import AOTEngine
    tmodel = AOT(tcfg, encoder=cfg.encoder)
    tmodel.eval()
    randomize_state_dict(tmodel, seed=13)

    rng = np.random.RandomState(4)
    frames = rng.randn(1, T, SIZE, SIZE, 3).astype(np.float32) * 0.5
    masks = (rng.rand(1, T, SIZE, SIZE) * 3).astype(np.int64)
    step = 100

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
    assert float(aux['var_loss']) > 0

    teng = AOTEngine(tmodel, gpu_id=0,
                     long_term_mem_gap=exp.train_long_term_mem_gap,
                     short_term_mem_skip=1)
    teng.eval()
    teng.restart_engine(batch_size=1, enable_id_shuffle=False)
    orig_assign = teng.assign_identity

    def patched(one_hot_mask, ignore_mask=None):
        if ignore_mask is None:
            ignore_mask = torch.zeros(
                one_hot_mask.shape[0], 1, one_hot_mask.shape[2],
                one_hot_mask.shape[3])
        return orig_assign(one_hot_mask, ignore_mask)

    teng.assign_identity = patched
    t_frames = torch.from_numpy(
        frames.reshape(T, SIZE, SIZE, 3)).permute(0, 3, 1, 2)
    t_masks = torch.from_numpy(masks.reshape(T, 1, SIZE, SIZE))
    with torch.no_grad():
        t_loss, _, _, _ = teng(t_frames, t_masks, batch_size=1,
                               obj_nums=[2], step=step,
                               use_prev_pred=False)

    np.testing.assert_allclose(float(loss), float(t_loss), rtol=2e-3,
                               atol=2e-3)
