"""Config-matrix streaming-parity fuzz (round-2 VERDICT #4).

Every RMem memory knob that exists-but-was-never-parity-run is swept here
against the reference oracle on short sequences: former_mem_len=2,
latter_mem_len!=8, 2-slot temporal PE, att_heads in {1,2},
short_term_mem_skip>1, AOT-S depth, DeAOT with former=2, and linear_q=True
streaming in train mode (default-drop eviction). Each case asserts
per-frame masks, logits, and the bank's eviction decisions (frame ids)
against the reference (transformer.py:269-436 semantics).
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rmem_ocu_tpu.config import get_config  # noqa: E402
from rmem_ocu_tpu.engine import InferEngine  # noqa: E402
from rmem_ocu_tpu.models import build_vos_model  # noqa: E402
from rmem_ocu_tpu.utils.torch_convert import convert_torch_params  # noqa: E402

from ref_utils import make_torch_cfg, setup_reference_path  # noqa: E402

setup_reference_path()


def he_randomize_state_dict(module, seed=0):
    """He-scaled random weights: the flat 0.1-std fill used elsewhere
    KILLS the input signal through the deep encoder (memory keys become
    bit-identical across frames, attention exactly uniform, and the
    asserted eviction argmin a tie), so eviction-id assertions need
    signal-preserving initialization: std = sqrt(2 / fan_in) for >=2-d
    weights, gamma ~ 1 for norm scales."""
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if not v.dtype.is_floating_point:
            continue
        if 'running_var' in k:
            sd[k] = (torch.randn(v.shape, generator=g) * 0.1).abs() + 0.9
        elif v.dim() >= 2:
            fan_in = int(np.prod(v.shape[1:]))
            sd[k] = torch.randn(v.shape, generator=g) * \
                (2.0 / max(fan_in, 1)) ** 0.5
        elif k.endswith('.weight'):          # norm scales
            sd[k] = 1.0 + torch.randn(v.shape, generator=g) * 0.1
        else:                                # biases / running_mean / pe
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
    module.load_state_dict(sd)
    return module

SIZE = 81    # 16x grid 6x6 = 36 keys >= the reference's top-32 recording
FRAMES = 8

# (case_id, model, model_overrides, engine_kwargs, train_mode)
CASES = [
    ('former2', 'aott',
     dict(former_mem_len=2, latter_mem_len=3), {}, False),
    ('latter4', 'aott', dict(latter_mem_len=4), {}, False),
    ('pe_2slot', 'aott',
     dict(use_temporal_pe=True, temporal_pe_slot_4=False,
          latter_mem_len=4), {}, False),
    ('pe_4slot_aot', 'aott',
     dict(use_temporal_pe=True, temporal_pe_slot_4=True,
          latter_mem_len=4), {}, False),
    ('heads1', 'aott',
     dict(att_heads=1, self_heads=1, latter_mem_len=4), {}, False),
    ('heads2', 'aott',
     dict(att_heads=2, self_heads=2, latter_mem_len=4), {}, False),
    ('short_skip2', 'aott', dict(latter_mem_len=4),
     dict(short_term_mem_skip=2), False),
    ('aots_depth2', 'aots', dict(latter_mem_len=3), {}, False),
    ('deaot_former2', 'r50_deaotl',
     dict(former_mem_len=2, latter_mem_len=3), {}, False),
    # linear_q=True streaming runs in train mode: the reference's eval-only
    # save_atten_weights path crashes under linear_q (fork bug, see
    # test_parity_engine.py), and train mode exercises the default-drop
    # eviction (drop idx = former_mem_len, transformer.py:330-337)
    ('linearq_train_mode', 'aott',
     dict(linear_q=True, latter_mem_len=3), {}, True),
]


@pytest.mark.parametrize(
    'case_id,model_name,overrides,eng_kw,train_mode',
    CASES, ids=[c[0] for c in CASES])
def test_streaming_parity_fuzz(case_id, model_name, overrides, eng_kw,
                               train_mode):
    from dataclasses import replace

    exp = get_config('pre_vost', model=model_name, **overrides)
    cfg = exp.model
    jmodel = build_vos_model(cfg)

    tcfg = make_torch_cfg(cfg, exp)
    # droppath must be inert for train-mode parity (the rate is a config
    # value; the reference samples it stochastically under .train())
    tcfg.TRAIN_LSTT_DROPPATH = 0.0
    if cfg.vos == 'deaot':
        from networks.models.deaot import DeAOT
        tmodel = DeAOT(tcfg, encoder=cfg.encoder)
    else:
        from networks.models.aot import AOT
        tmodel = AOT(tcfg, encoder=cfg.encoder)
    tmodel.eval()
    he_randomize_state_dict(
        tmodel, seed=100 + [c[0] for c in CASES].index(case_id))

    rng = np.random.RandomState(5)
    img0 = rng.randn(1, SIZE, SIZE, 3).astype(np.float32)
    mask0 = (rng.rand(1, SIZE, SIZE) * 3).astype(np.int64)
    # INDEPENDENT frames (not anchored to img0): anchored clips make every
    # memory slot's keys nearly identical, the eviction mass uniform to
    # ~1e-5, and the argmin a tie broken by fp noise that differs between
    # torch and XLA. Independent content separates the slot scores by
    # ~1e-3 so the asserted eviction ids are numerically meaningful.
    frames = [rng.randn(1, SIZE, SIZE, 3).astype(np.float32)
              for _ in range(FRAMES)]

    variables = jmodel.init(
        jax.random.PRNGKey(0), jnp.asarray(img0),
        jnp.zeros((1, SIZE, SIZE, cfg.id_dim)))
    params, _ = convert_torch_params(tmodel.state_dict(), variables, cfg,
                                     strict=True)
    skip = eng_kw.get('short_term_mem_skip', 1)
    eng = InferEngine(jmodel, exp, long_term_mem_gap=1,
                      training=train_mode, **eng_kw)
    h16 = (SIZE - 1) // 16 + 1
    st = eng.init_state(1, (h16, h16))
    st = eng.add_reference_frame(params, st, jnp.asarray(img0),
                                 jnp.asarray(mask0.astype(np.int32)),
                                 jnp.array([2], jnp.int32))

    from networks.engines.aot_engine import AOTEngine
    teng = AOTEngine(tmodel, gpu_id=0, long_term_mem_gap=1,
                     short_term_mem_skip=skip)
    if train_mode:
        teng.train()
        tmodel.train()
    else:
        teng.eval()
    teng.restart_engine(batch_size=1, enable_id_shuffle=False)
    # route the reference's hardcoded-CUDA default ignore mask to CPU
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
            err_msg=f'[{case_id}] logits diverged at frame {t}')

        pred = eng.predict_mask(logits, (SIZE, SIZE))
        with torch.no_grad():
            t_pred = teng.predict_current_mask()
        agree = float((np.asarray(pred)[0] == t_pred.numpy()[0]).mean())
        assert agree > 0.999, \
            f'[{case_id}] mask diverged at frame {t}: {agree}'

        # teacher-force BOTH engines with the oracle's mask: a single
        # borderline argmax pixel would otherwise fork the id embeddings
        # and make later-frame comparisons chaotic rather than numeric
        st = eng.update_memory(params, st,
                               jnp.asarray(t_pred.numpy().astype(np.int32)))
        with torch.no_grad():
            teng.update_short_term_memory(t_pred.unsqueeze(1).float())

        t_len = teng.AOT.LSTT.long_term_memories[0][0].shape[0]
        assert int(st.bank.length[0]) == t_len, f'[{case_id}] frame {t}'
        got_ids = list(np.asarray(st.bank.ordered_frame_ids[0][:t_len]))
        assert got_ids == teng.long_memories_indexes, \
            f'[{case_id}] eviction ids diverged at frame {t}: ' \
            f'{got_ids} vs {teng.long_memories_indexes}'
