"""Engine-level Pallas-vs-XLA regression (round-2 VERDICT #6).

Runs the full streaming engine twice on identical inputs — RMEM_PALLAS=1
(fused memory-read kernel; compiled Mosaic on TPU, interpret elsewhere)
vs RMEM_PALLAS=0 (XLA dense path) — at two shapes (Mosaic-aligned and
ragged HWk) and asserts logits, masks, eviction frame-ids, and the
recorded eviction mass match. A Mosaic numerics regression can no longer
ship silently behind the backend-default toggle (ops/attention.py:72).
The one-shot on-hardware A/B is `python bench.py --pallas_ab`.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rmem_ocu_tpu.config import get_config
from rmem_ocu_tpu.engine import InferEngine
from rmem_ocu_tpu.models import build_vos_model


def _stream(exp, h, w, frames_n, pallas, monkeypatch, seed=7):
    monkeypatch.setenv('RMEM_PALLAS', '1' if pallas else '0')
    cfg = exp.model
    model = build_vos_model(cfg)
    rng = np.random.RandomState(seed)
    img0 = rng.randn(1, h, w, 3).astype(np.float32)
    mask0 = (rng.rand(1, h, w) * 3).astype(np.int32)
    frames = [rng.randn(1, h, w, 3).astype(np.float32) * 0.5 + img0
              for _ in range(frames_n)]
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(img0),
                        jnp.zeros((1, h, w, cfg.id_dim)))
    eng = InferEngine(model, exp, long_term_mem_gap=1)
    grid = ((h - 1) // 16 + 1, (w - 1) // 16 + 1)
    st = eng.init_state(1, grid)
    st = eng.add_reference_frame(params, st, jnp.asarray(img0),
                                 jnp.asarray(mask0),
                                 jnp.array([2], jnp.int32))
    logits_all, preds, masses = [], [], []
    for f in frames:
        logits, st = eng.propagate(params, st, jnp.asarray(f))
        pred = eng.predict_mask(logits, (h, w))
        masses.append(np.asarray(st.pending_mass))
        st = eng.update_memory(params, st, pred)
        logits_all.append(np.asarray(logits))
        preds.append(np.asarray(pred))
    ids = np.asarray(st.bank.frame_ids[0])
    return logits_all, preds, masses, ids


# 81x81 -> 16x grid 6x6 = 36 keys (ragged HWk: _best_block_k falls back to
# the full token count); 113x497 -> 8x32 = 256 keys (Mosaic-aligned, the
# kernel tiles block_k=128).
@pytest.mark.parametrize('h,w,n_frames,latter',
                         [(81, 81, 6, 3), (113, 497, 5, 2)],
                         ids=['ragged_hwk36', 'aligned_hwk256'])
def test_engine_pallas_matches_xla(h, w, n_frames, latter, monkeypatch):
    # small latter_mem_len so attention+UCB eviction fires within the clip
    exp = get_config('pre_vost', model='aott', latter_mem_len=latter)

    logits_p, preds_p, mass_p, ids_p = _stream(exp, h, w, n_frames, True,
                                               monkeypatch)
    logits_x, preds_x, mass_x, ids_x = _stream(exp, h, w, n_frames, False,
                                               monkeypatch)

    np.testing.assert_array_equal(ids_p, ids_x)
    for t, (lp, lx) in enumerate(zip(logits_p, logits_x)):
        # the kernel's streaming softmax accumulates in a different order
        # than XLA's dense softmax; ~4e-4 drift through the decoder is
        # numerics, not regression
        np.testing.assert_allclose(lp, lx, rtol=1e-3, atol=1e-3,
                                   err_msg=f'logits diverged frame {t}')
    for t, (pp, px) in enumerate(zip(preds_p, preds_x)):
        assert (pp == px).mean() > 0.999, f'masks diverged frame {t}'
    for t, (mp, mx) in enumerate(zip(mass_p, mass_x)):
        np.testing.assert_allclose(mp, mx, rtol=1e-4, atol=1e-4,
                                   err_msg=f'eviction mass frame {t}')
