"""Long combined-stress streaming parity: one 44-frame adversarial sequence
per model family with EVERYTHING active at once — flip-aug mean-of-softmax
aggregation (evaluator.py:342-523 protocol), a write gap > 1, attention+UCB
eviction churn, a mid-sequence reference re-add that introduces a NEW
object id, and (AOT family) ConvGRU memory compression — asserting the
aggregated mask and the per-engine bank frame ids against reference
oracles EVERY frame.

The per-feature suites (test_parity_engine / test_parity_readd /
test_parity_eval_augs) cap at ~12 frames and exercise features mostly one
at a time; this is the interaction stress (round-4 review item 4).

Fork breakage found while building this test (SURVEY 2.13 territory):
the reference's mid-sequence `add_reference_frame` resets the memory
tensors (`init_LSTT_memory` -> `init_memory`, clearing the attn-EMA and
visit dicts) but NOT the engine-level `long_memories_indexes` list (only
`restart_engine` clears it, aot_engine.py:548) — the list keeps the
pre-re-add ids and keeps growing. The next eviction after a re-add then
computes `frame_times_np` over the stale list (len != memory length) and
`attn_weight + frame_times_param` raises a size-mismatch RuntimeError
(transformer.py:377-403). So post-re-add eviction semantics are UNDEFINED
upstream; this test places the re-add late enough that the reference
never evicts after it (our engine resets the id bookkeeping with the
bank, the intended semantics), asserts eviction ids through the heavy
pre-re-add churn, and masks + bank length across the re-add.
"""
import copy

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

SIZE = 81          # 16x grid 6x6 >= 32 keys (reference top-32 recording)
FRAMES = 44
# The labeled re-add frame introducing object id 4 sits late enough that
# the REFERENCE never runs its (broken) post-re-add scoring again — see
# module docstring — while the frames before it exercise gap-scheduled
# writes + attention/UCB eviction churn under flip-aug aggregation.
# LSTT (aot) scores only once over budget, so 6 trailing frames at gap 2
# with latter=3 stay safe; GPM (deaot) scores on EVERY long-term write
# (transformer.py:885-964), so its re-add goes at the tail where no
# further write lands inside the window.
READD_AT = {'aot_gru': 37, 'deaot': 42}


def _patched_assign_identity(engine):
    """Route the reference's hardcoded-CUDA default ignore mask to CPU
    (aot_engine.py:208-213)."""
    orig = engine.assign_identity

    def patched(one_hot_mask, ignore_mask=None):
        if ignore_mask is None:
            ignore_mask = torch.zeros(
                one_hot_mask.shape[0], 1, one_hot_mask.shape[2],
                one_hot_mask.shape[3])
        return orig(one_hot_mask, ignore_mask)

    engine.assign_identity = patched


def _make_torch_engine(tmodel, gap):
    from networks.engines.aot_engine import AOTEngine
    te = AOTEngine(tmodel, gpu_id=0, long_term_mem_gap=gap,
                   short_term_mem_skip=1)
    te.eval()
    te.restart_engine(batch_size=1, enable_id_shuffle=False)
    _patched_assign_identity(te)
    return te


def _t_img(a):
    return torch.from_numpy(a).permute(0, 3, 1, 2)


def _t_lbl(a):
    return torch.from_numpy(a.astype(np.int64)).unsqueeze(1).float()


@pytest.mark.parametrize('family', ['aot_gru', 'deaot'])
def test_combined_stress_streaming_parity(family):
    if family == 'aot_gru':
        from dataclasses import replace
        # GRU compression is AOT/LSTT-only (DualBranchGPM hardcodes
        # gru_memory=False, transformer.py:728); latter=3 starts eviction
        # churn early in the 44-frame drive
        exp = get_config('pre_vost', model='aott')
        exp = replace(exp, model=replace(exp.model, gru_memory=True,
                                         latter_mem_len=3))
        gap = 2
        from networks.models.aot import AOT
        tmodel = AOT(make_torch_cfg(exp.model, exp),
                     encoder=exp.model.encoder)
    else:
        from dataclasses import replace
        # latter=3 so the 37 pre-re-add frames at gap 2 run ~12 scored
        # evictions (latter=8 would only evict 2-3 times before the
        # re-add)
        exp = get_config('pre_vost', model='r50_deaotl')
        exp = replace(exp, model=replace(exp.model, latter_mem_len=3))
        gap = 2
        from networks.models.deaot import DeAOT
        tmodel = DeAOT(make_torch_cfg(exp.model, exp),
                       encoder=exp.model.encoder)
    cfg = exp.model
    readd_at = READD_AT[family]
    tmodel.eval()
    randomize_state_dict(tmodel, seed=29)
    jmodel = build_vos_model(cfg)

    rng = np.random.RandomState(13)
    img0 = rng.randn(1, SIZE, SIZE, 3).astype(np.float32)
    mask0 = (rng.rand(1, SIZE, SIZE) * 4).astype(np.int64)      # objs 1..3
    mask_new = (rng.rand(1, SIZE, SIZE) * 5).astype(np.int64)   # adds id 4
    frames = [rng.randn(1, SIZE, SIZE, 3).astype(np.float32) * 0.4 + img0
              for _ in range(FRAMES)]

    variables = jmodel.init(
        jax.random.PRNGKey(0), jnp.asarray(img0),
        jnp.zeros((1, SIZE, SIZE, cfg.id_dim)))
    params, _ = convert_torch_params(tmodel.state_dict(), variables, cfg,
                                     strict=True)

    flip = lambda a: np.ascontiguousarray(a[:, :, ::-1])

    # --- ours: one engine state per aug (identity, W-flip) ---
    eng = InferEngine(jmodel, exp, long_term_mem_gap=gap)
    h16 = (SIZE - 1) // 16 + 1
    obj = jnp.array([3], jnp.int32)
    states = []
    for f in (False, True):
        st = eng.init_state(1, (h16, h16))
        st = eng.add_reference_frame(
            params, st, jnp.asarray(flip(img0) if f else img0),
            jnp.asarray((flip(mask0) if f else mask0).astype(np.int32)),
            obj)
        states.append(st)

    # --- reference: one AOTEngine per aug; each NEEDS its own model copy
    # (the fork keeps memory lists on the shared LSTT module — two engines
    # on one model cross-write, test_parity_multiobj.py) ---
    tengines = []
    for i, f in enumerate((False, True)):
        m = tmodel if i == 0 else copy.deepcopy(tmodel)
        te = _make_torch_engine(m, gap)
        with torch.no_grad():
            te.add_reference_frame(
                _t_img(flip(img0) if f else img0),
                _t_lbl(flip(mask0) if f else mask0),
                obj_nums=[3], frame_step=0)
        tengines.append(te)

    n_obj = 3
    for t, frame in enumerate(frames):
        # propagate both augs, aggregate mean-of-softmax with flip-back
        probs, t_probs, new_states = [], [], []
        for (st, te, f) in zip(states, tengines, (False, True)):
            x = flip(frame) if f else frame
            logits, st = eng.propagate(params, st, jnp.asarray(x))
            new_states.append(st)
            _, p = eng.predict_mask(logits, (SIZE, SIZE), return_prob=True)
            p = np.asarray(p, np.float32)
            probs.append(p[:, :, ::-1] if f else p)
            with torch.no_grad():
                tl = te.match_propogate_one_frame(
                    _t_img(x), output_size=(SIZE, SIZE))
            tp = torch.softmax(tl, dim=1).permute(0, 2, 3, 1).numpy()
            t_probs.append(tp[:, :, ::-1] if f else tp)
        states = new_states
        pred = np.argmax(probs[0] + probs[1], axis=-1)[0]
        t_pred = np.argmax(t_probs[0] + t_probs[1], axis=-1)[0]
        agree = float(np.mean(pred == t_pred))
        assert agree >= 0.995, f'{family} frame {t}: mask agreement {agree}'

        if t == readd_at:
            # labeled mid-sequence frame introduces object id 4: both
            # sides reset memory to just the new reference
            # (aot_engine.py:321-323 -> init_LSTT_memory)
            n_obj = 4
            obj = jnp.array([4], jnp.int32)
            new_states = []
            for (st, te, f) in zip(states, tengines, (False, True)):
                x = flip(frame) if f else frame
                lbl = flip(mask_new) if f else mask_new
                st = eng.add_reference_frame(
                    params, st, jnp.asarray(x),
                    jnp.asarray(lbl.astype(np.int32)), obj)
                new_states.append(st)
                with torch.no_grad():
                    te.add_reference_frame(_t_img(x), _t_lbl(lbl),
                                           obj_nums=[4],
                                           frame_step=te.frame_step)
                assert int(st.bank.length[0]) == 1
            states = new_states
        else:
            # evaluator feedback: both augs update from the AGGREGATED
            # mask, flipped per aug (evaluator.py:484-508)
            new_states = []
            for (st, te, f) in zip(states, tengines, (False, True)):
                lbl = pred[None]
                lbl = flip(lbl) if f else lbl
                st = eng.update_memory(params, st,
                                       jnp.asarray(lbl.astype(np.int32)))
                new_states.append(st)
                t_lbl = t_pred[None]
                t_lbl = flip(t_lbl) if f else t_lbl
                with torch.no_grad():
                    te.update_short_term_memory(
                        torch.from_numpy(
                            np.ascontiguousarray(t_lbl)).unsqueeze(
                                1).float())
            states = new_states

        # bank state must track each oracle exactly, every frame: same
        # length, and (until the re-add) same frame ids in logical order —
        # i.e. identical attention-EMA + UCB eviction decisions through
        # the gap schedule and GRU compression. After the re-add the
        # reference's id list is stale garbage (upstream bug, module
        # docstring), so only length + masks remain comparable.
        for (st, te, f) in zip(states, tengines, (False, True)):
            t_len = te.AOT.LSTT.long_term_memories[0][0].shape[0]
            assert int(st.bank.length[0]) == t_len, \
                f'{family} frame {t} flip={f}: bank length'
            if t < readd_at:
                got = list(np.asarray(st.bank.ordered_frame_ids[0][:t_len]))
                assert got == te.long_memories_indexes, \
                    f'{family} frame {t} flip={f}: eviction ids ' \
                    f'{got} vs {te.long_memories_indexes}'
            else:
                # ours resets cleanly: ids are the re-add frame + later
                got = list(np.asarray(st.bank.ordered_frame_ids[0][:t_len]))
                assert all(i >= readd_at for i in got), \
                    f'{family} frame {t}: pre-re-add id survived: {got}'

    assert n_obj == 4          # the re-add actually happened
