"""Mid-sequence reference re-add parity: the engine must RESET its memory to
just the new reference frame, exactly like the reference's
add_reference_frame -> init_LSTT_memory (aot_engine.py:321-323,
transformer.py:438-453). Covers the YouTube-VOS mid-video label flow."""
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
FRAMES = 6
READD_AT = 3


def _patched_assign_identity(engine):
    orig = engine.assign_identity

    def patched(one_hot_mask, ignore_mask=None):
        if ignore_mask is None:
            ignore_mask = torch.zeros(
                one_hot_mask.shape[0], 1, one_hot_mask.shape[2],
                one_hot_mask.shape[3])
        return orig(one_hot_mask, ignore_mask)

    engine.assign_identity = patched


def test_mid_sequence_readd_parity():
    exp = get_config('pre_vost', model='aott')
    cfg = exp.model
    jmodel = build_vos_model(cfg)

    from networks.models.aot import AOT
    from networks.engines.aot_engine import AOTEngine
    tmodel = AOT(make_torch_cfg(cfg, exp), encoder=cfg.encoder)
    tmodel.eval()
    randomize_state_dict(tmodel, seed=17)

    rng = np.random.RandomState(5)
    img0 = rng.randn(1, SIZE, SIZE, 3).astype(np.float32)
    mask0 = (rng.rand(1, SIZE, SIZE) * 3).astype(np.int64)
    # the re-add label introduces a new object id (simulating a YouTube-VOS
    # mid-video annotation)
    mask_new = (rng.rand(1, SIZE, SIZE) * 4).astype(np.int64)
    frames = [rng.randn(1, SIZE, SIZE, 3).astype(np.float32) * 0.5 + img0
              for _ in range(FRAMES)]

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
                                 jnp.array([3], jnp.int32))

    teng = AOTEngine(tmodel, gpu_id=0, long_term_mem_gap=1,
                     short_term_mem_skip=1)
    teng.eval()
    teng.restart_engine(batch_size=1, enable_id_shuffle=False)
    _patched_assign_identity(teng)
    with torch.no_grad():
        teng.add_reference_frame(
            torch.from_numpy(img0).permute(0, 3, 1, 2),
            torch.from_numpy(mask0).unsqueeze(1).float(),
            obj_nums=[3], frame_step=0)

    for t, frame in enumerate(frames):
        logits, st = eng.propagate(params, st, jnp.asarray(frame))
        with torch.no_grad():
            t_logits = teng.match_propogate_one_frame(
                torch.from_numpy(frame).permute(0, 3, 1, 2))
        np.testing.assert_allclose(
            np.asarray(logits)[..., :4],
            t_logits.permute(0, 2, 3, 1).numpy()[..., :4],
            rtol=2e-3, atol=2e-3, err_msg=f'logits diverged at frame {t}')

        pred = eng.predict_mask(logits, (SIZE, SIZE))
        with torch.no_grad():
            t_pred = teng.predict_current_mask()

        if t == READD_AT:
            # evaluator flow for a labeled frame (evaluator.py:484-508):
            # overwrite pred with GT where labeled, re-add as reference
            st = eng.add_reference_frame(
                params, st, jnp.asarray(frame),
                jnp.asarray(mask_new.astype(np.int32)),
                jnp.array([3], jnp.int32))
            with torch.no_grad():
                teng.add_reference_frame(
                    torch.from_numpy(frame).permute(0, 3, 1, 2),
                    torch.from_numpy(mask_new).unsqueeze(1).float(),
                    obj_nums=[3], frame_step=teng.frame_step)
            # memory reset to the single new reference on both sides
            assert int(st.bank.length[0]) == 1
            t_len = tmodel.LSTT.long_term_memories[0][0].shape[0]
            assert t_len == 1, t_len
        else:
            st = eng.update_memory(params, st, pred)
            with torch.no_grad():
                teng.update_short_term_memory(t_pred.unsqueeze(1).float())

        t_len = tmodel.LSTT.long_term_memories[0][0].shape[0]
        assert int(st.bank.length[0]) == t_len, f'frame {t}'
