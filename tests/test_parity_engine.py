"""Streaming parity: our functional InferEngine vs the reference AOTEngine
driven frame-by-frame with converted weights, including long-memory appends,
restriction, and attention+UCB eviction."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rmem_ocu_tpu.config import get_config, get_model_config  # noqa: E402
from rmem_ocu_tpu.engine import InferEngine  # noqa: E402
from rmem_ocu_tpu.models import build_vos_model  # noqa: E402
from rmem_ocu_tpu.utils.torch_convert import convert_torch_params  # noqa: E402

from ref_utils import (make_torch_cfg, randomize_state_dict,  # noqa: E402
                       setup_reference_path)

setup_reference_path()

SIZE = 81   # 16x grid = 6x6 (the reference's top-32 attn recording needs
            # at least 32 keys, transformer.py:644-645)
FRAMES = 12


def _patched_assign_identity(engine):
    """The reference hardcodes a CUDA device for the default ignore mask
    (aot_engine.py:208-213); route it to CPU for the oracle run."""
    orig = engine.assign_identity

    def patched(one_hot_mask, ignore_mask=None):
        if ignore_mask is None:
            ignore_mask = torch.zeros(
                one_hot_mask.shape[0], 1, one_hot_mask.shape[2],
                one_hot_mask.shape[3])
        return orig(one_hot_mask, ignore_mask)

    engine.assign_identity = patched


def test_streaming_engine_parity_gru_memory(capsys):
    """GRU_MEMORY streaming parity: the evicted slot is ConvGRU-compressed
    into slot 1, slot 1 is additionally protected by the eviction scores,
    and the hidden state advances only on actual drops (reference
    transformer.py:395-430, 444-453)."""
    from dataclasses import replace

    exp = get_config('pre_vost', model='aott')
    exp = replace(exp, model=replace(exp.model, gru_memory=True,
                                     latter_mem_len=3))
    cfg = exp.model
    jmodel = build_vos_model(cfg)

    tcfg = make_torch_cfg(cfg, exp)
    from networks.models.aot import AOT
    tmodel = AOT(tcfg, encoder=cfg.encoder)
    tmodel.eval()
    randomize_state_dict(tmodel, seed=21)

    rng = np.random.RandomState(3)
    img0 = rng.randn(1, SIZE, SIZE, 3).astype(np.float32)
    mask0 = (rng.rand(1, SIZE, SIZE) * 3).astype(np.int64)
    frames = [rng.randn(1, SIZE, SIZE, 3).astype(np.float32) * 0.5 + img0
              for _ in range(10)]

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
    _patched_assign_identity(teng)
    with torch.no_grad():
        teng.add_reference_frame(
            torch.from_numpy(img0).permute(0, 3, 1, 2),
            torch.from_numpy(mask0).unsqueeze(1).float(),
            obj_nums=[2], frame_step=0)

    for t, frame in enumerate(frames):
        logits, st = eng.propagate(params, st, jnp.asarray(frame))
        with torch.no_grad():
            t_logits = teng.match_propogate_one_frame(
                torch.from_numpy(frame).permute(0, 3, 1, 2))
        np.testing.assert_allclose(
            np.asarray(logits)[..., :3],
            t_logits.permute(0, 2, 3, 1).numpy()[..., :3],
            rtol=2e-3, atol=2e-3,
            err_msg=f'gru logits diverged at frame {t}')
        pred = eng.predict_mask(logits, (SIZE, SIZE))
        with torch.no_grad():
            t_pred = teng.predict_current_mask()
        np.testing.assert_array_equal(np.asarray(pred)[0],
                                      t_pred.numpy()[0],
                                      err_msg=f'gru mask diverged frame {t}')
        st = eng.update_memory(params, st, pred)
        with torch.no_grad():
            teng.update_short_term_memory(t_pred.unsqueeze(1).float())
        t_len = teng.AOT.LSTT.long_term_memories[0][0].shape[0]
        assert int(st.bank.length[0]) == t_len, f'frame {t}'
        got_ids = list(np.asarray(st.bank.ordered_frame_ids[0][:t_len]))
        assert got_ids == teng.long_memories_indexes, f'frame {t}'
        # compressed memory contents track the oracle (incl. the GRU
        # output written into slot 1 and the gated hidden state);
        # reference layout [T, HW, B, C] -> [T, HW, C] for batch 0
        t_mem_k = teng.AOT.LSTT.long_term_memories[0][0]
        want_k = t_mem_k.permute(0, 2, 1, 3).numpy()[:, 0]
        np.testing.assert_allclose(
            np.asarray(st.bank.ordered(st.bank.k[0])[0, :t_len]), want_k,
            rtol=5e-3, atol=5e-3, err_msg=f'bank K diverged frame {t}')


@pytest.mark.parametrize('model_name', ['aott', 'r50_deaotl'])
def test_streaming_engine_parity(model_name, capsys):
    # pre_vost sets linear_q=False; the reference's save_atten_weights path
    # crashes with linear_q=True (transformer.py:663-665 references
    # short_attn that the linear_q branch never assigns — fork bug,
    # SURVEY.md §2.13 territory), so eval parity is tested in the
    # configuration the reference actually evaluates.
    exp = get_config('pre_vost', model=model_name)
    cfg = exp.model
    jmodel = build_vos_model(cfg)

    tcfg = make_torch_cfg(cfg, exp)
    if cfg.vos == 'deaot':
        from networks.models.deaot import DeAOT
        tmodel = DeAOT(tcfg, encoder=cfg.encoder)
    else:
        from networks.models.aot import AOT
        tmodel = AOT(tcfg, encoder=cfg.encoder)
    tmodel.eval()
    randomize_state_dict(tmodel, seed=11)

    rng = np.random.RandomState(0)
    img0 = rng.randn(1, SIZE, SIZE, 3).astype(np.float32)
    mask0 = (rng.rand(1, SIZE, SIZE) * 3).astype(np.int64)
    frames = [rng.randn(1, SIZE, SIZE, 3).astype(np.float32) * 0.5 + img0
              for _ in range(FRAMES)]

    # --- jax engine ---
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

    # --- torch oracle engine ---
    from networks.engines.aot_engine import AOTEngine
    teng = AOTEngine(tmodel, gpu_id=0, long_term_mem_gap=1,
                     short_term_mem_skip=1)
    teng.eval()
    teng.restart_engine(batch_size=1, enable_id_shuffle=False)
    _patched_assign_identity(teng)
    with torch.no_grad():
        teng.add_reference_frame(
            torch.from_numpy(img0).permute(0, 3, 1, 2),
            torch.from_numpy(mask0).unsqueeze(1).float(),
            obj_nums=[2], frame_step=0)

    for t, frame in enumerate(frames):
        logits, st = eng.propagate(params, st, jnp.asarray(frame))
        with torch.no_grad():
            t_logits = teng.match_propogate_one_frame(
                torch.from_numpy(frame).permute(0, 3, 1, 2))
        np.testing.assert_allclose(
            np.asarray(logits)[..., :3],
            t_logits.permute(0, 2, 3, 1).numpy()[..., :3],
            rtol=2e-3, atol=2e-3,
            err_msg=f'logits diverged at frame {t}')

        pred = eng.predict_mask(logits, (SIZE, SIZE))
        with torch.no_grad():
            t_pred = teng.predict_current_mask()
        np.testing.assert_array_equal(np.asarray(pred)[0],
                                      t_pred.numpy()[0],
                                      err_msg=f'mask diverged at frame {t}')

        st = eng.update_memory(params, st, pred)
        with torch.no_grad():
            teng.update_short_term_memory(t_pred.unsqueeze(1).float())

        # memory bank contents must track the oracle exactly
        t_len = teng.AOT.LSTT.long_term_memories[0][0].shape[0]
        assert int(st.bank.length[0]) == t_len, f'frame {t}'
        got_ids = list(np.asarray(st.bank.ordered_frame_ids[0][:t_len]))
        assert got_ids == teng.long_memories_indexes, f'frame {t}'
