"""Multi-object group parity: our batched group axis + soft aggregation vs
the reference AOTInferEngine's per-group engine list
(aot_engine.py:571-725)."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from dataclasses import replace  # noqa: E402

from rmem_ocu_tpu.config import get_config  # noqa: E402
from rmem_ocu_tpu.engine import InferEngine  # noqa: E402
from rmem_ocu_tpu.eval.evaluator import (separate_mask_groups,  # noqa: E402
                                         soft_aggregate_group_logits)
from rmem_ocu_tpu.models import build_vos_model  # noqa: E402
from rmem_ocu_tpu.ops.resize import interpolate_bilinear  # noqa: E402
from rmem_ocu_tpu.utils.torch_convert import convert_torch_params  # noqa: E402

from ref_utils import (make_torch_cfg, randomize_state_dict,  # noqa: E402
                       setup_reference_path)

setup_reference_path()

SIZE = 81
GROUP = 2     # force 2 groups with 4 objects
FRAMES = 6


def _patch_assign_identity_class():
    """The reference hardcodes a CUDA ignore-mask default
    (aot_engine.py:208-213); AOTInferEngine spawns sub-engines lazily, so
    patch at class level for the CPU oracle."""
    from networks.engines.aot_engine import AOTEngine
    if getattr(AOTEngine, '_cpu_patched', False):
        return
    orig = AOTEngine.assign_identity

    def patched(self, one_hot_mask, ignore_mask=None):
        if ignore_mask is None:
            ignore_mask = torch.zeros(
                one_hot_mask.shape[0], 1, one_hot_mask.shape[2],
                one_hot_mask.shape[3])
        return orig(self, one_hot_mask, ignore_mask)

    AOTEngine.assign_identity = patched
    AOTEngine._cpu_patched = True


def test_grouped_multiobject_streaming_parity():
    exp = get_config('pre_vost', model='aott')
    exp = replace(exp, model=replace(exp.model, max_obj_num=GROUP))
    cfg = exp.model
    jmodel = build_vos_model(cfg)

    from networks.models.aot import AOT
    from networks.engines.aot_engine import AOTInferEngine
    tmodel = AOT(make_torch_cfg(cfg, exp), encoder=cfg.encoder)
    tmodel.eval()
    randomize_state_dict(tmodel, seed=41)

    rng = np.random.RandomState(3)
    img0 = rng.randn(1, SIZE, SIZE, 3).astype(np.float32) * 0.5
    # 4 objects -> 2 groups of 2
    mask0 = (rng.rand(1, SIZE, SIZE) * 5).astype(np.int64)
    frames = [rng.randn(1, SIZE, SIZE, 3).astype(np.float32) * 0.3 + img0
              for _ in range(FRAMES)]

    variables = jmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, SIZE, SIZE, 3)),
                            jnp.zeros((1, SIZE, SIZE, cfg.id_dim)))
    params, _ = convert_torch_params(tmodel.state_dict(), variables, cfg,
                                     strict=True)

    # --- ours: groups fold into the batch axis ---
    eng = InferEngine(jmodel, exp, long_term_mem_gap=2)
    n_groups = 2
    groups = separate_mask_groups(mask0[0].astype(np.int32), n_groups,
                                  GROUP)
    h16 = (SIZE - 1) // 16 + 1
    st = eng.init_state(n_groups, (h16, h16))
    imgs = jnp.repeat(jnp.asarray(img0), n_groups, 0)
    st = eng.add_reference_frame(params, st, imgs,
                                 jnp.asarray(groups[None][0]),
                                 jnp.full((n_groups,), GROUP, jnp.int32))

    # --- reference oracle: one engine per group with an INDEPENDENT model
    # copy. The fork's own AOTInferEngine is broken for >1 group: every
    # sub-engine wraps the same AOT object, and the fork moved the memory
    # lists onto the shared LSTT module (transformer.py:438-441), so groups
    # overwrite each other's banks (verified: update_long_term_memory fires
    # once per group on the same tensor list, sizes 1->2->3 in one frame).
    # Independent engines reproduce the *intended* (upstream AOT) semantics,
    # which is what the batched group axis here implements.
    _patch_assign_identity_class()
    import copy
    tengines = []
    for g in range(n_groups):
        eng_model = tmodel if g == 0 else copy.deepcopy(tmodel)
        te = AOTInferEngine(eng_model, gpu_id=0, long_term_mem_gap=2,
                            short_term_mem_skip=1, max_aot_obj_num=GROUP)
        te.eval()
        with torch.no_grad():
            te.add_reference_frame(
                torch.from_numpy(img0).permute(0, 3, 1, 2),
                torch.from_numpy(groups[g:g + 1, None].astype(
                    np.float32)),
                obj_nums=GROUP, frame_step=0)
        tengines.append(te)

    def t_soft_aggregate(all_logits):
        fg, bg = [], []
        for logit in all_logits:
            prob = torch.softmax(logit, dim=1)
            bg.append(prob[:, 0:1])
            fg.append(prob[:, 1:1 + GROUP])
        bg_prob = torch.prod(torch.cat(bg, dim=1), dim=1, keepdim=True)
        merged = torch.cat([bg_prob] + fg, dim=1).clamp(1e-5, 1 - 1e-5)
        return torch.logit(merged)

    for t, frame in enumerate(frames):
        imgs = jnp.repeat(jnp.asarray(frame), n_groups, 0)
        logits, st = eng.propagate(params, st, imgs)
        # per-group upsample first, then aggregate (reference order,
        # aot_engine.py:704-712)
        logits_up = interpolate_bilinear(logits, (SIZE, SIZE),
                                         cfg.align_corners)
        logits_in = soft_aggregate_group_logits(logits_up, 4, GROUP)
        pred = np.asarray(jnp.argmax(logits_in, -1)[0]).astype(np.int32)

        with torch.no_grad():
            per_group = [te.match_propogate_one_frame(
                torch.from_numpy(frame).permute(0, 3, 1, 2),
                output_size=(SIZE, SIZE)) for te in tengines]
            t_logits = t_soft_aggregate(per_group)
            t_pred = torch.argmax(t_logits, dim=1)[0].numpy()

        # merged logits agree to fp tolerance; a random-init model has
        # near-uniform class logits so a strict argmax comparison only
        # measures tie-breaking noise
        np.testing.assert_allclose(
            np.asarray(logits_in[0]),
            t_logits[0].permute(1, 2, 0).numpy(), rtol=5e-2, atol=5e-3,
            err_msg=f'frame {t}')
        agree = (pred == t_pred).mean()
        assert agree > 0.85, f'frame {t}: {agree}'

        # feed BOTH sides the reference prediction so the memory
        # trajectories stay comparable despite tie flips
        upd_groups = separate_mask_groups(t_pred.astype(np.int32),
                                          n_groups, GROUP)
        st = eng.update_memory(params, st, jnp.asarray(upd_groups))
        with torch.no_grad():
            for g, te in enumerate(tengines):
                te.update_memory(torch.from_numpy(
                    upd_groups[g][None, None].astype(np.float32)))
        for g in range(n_groups):
            t_len = tengines[g].aot_engines[0].AOT.LSTT.long_term_memories[
                0][0].shape[0]
            assert int(st.bank.length[g]) == t_len, f'frame {t} group {g}'
