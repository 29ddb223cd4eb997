"""Evaluator + scorer smoke tests on synthetic data (the reference's
EVAL_TEST idea, eval_datasets.py:457-509)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rmem_ocu_tpu.config import get_config
from rmem_ocu_tpu.data.eval_datasets import (build_synthetic_dataset,
                                             restrict_size)
from rmem_ocu_tpu.eval.evaluator import Evaluator, adaptive_mem_gap
from rmem_ocu_tpu.models import build_vos_model


def test_restrict_size_matches_reference_rules():
    # DAVIS 480p at max 624, align_corners
    assert restrict_size(480, 854, 480 * 1.3, True) == (353, 625)
    assert restrict_size(480, 854, 480 * 1.3, False) == (352, 624)
    # no resize needed when already under the cap
    assert restrict_size(129, 129, 800 * 1.3, True) == (129, 129)


def test_adaptive_mem_gap():
    # reference evaluator.py:331-335
    assert adaptive_mem_gap(60, 5) == 5
    assert adaptive_mem_gap(300, 5) == 10
    assert adaptive_mem_gap(1000, 5) == 33
    # NO_MEMORY_GAP quarters the adaptive gap (reference evaluator.py:333)
    assert adaptive_mem_gap(300, 5, no_memory_gap=True) == 2
    assert adaptive_mem_gap(60, 5, no_memory_gap=True) == 1


def test_sequence_mem_gap_fixed_override():
    """The adaptive gap always wins (reference evaluator.py:356 overwrites
    the engine's configured gap) unless --gap pins it via
    test_fixed_mem_gap."""
    from dataclasses import replace
    from rmem_ocu_tpu.eval.evaluator import sequence_mem_gap
    exp = get_config('pre_vost', model='aott')
    assert sequence_mem_gap(exp, exp.model, 300) == 10   # adaptive
    pinned = replace(exp, test_long_term_mem_gap=7, test_fixed_mem_gap=True)
    assert sequence_mem_gap(pinned, pinned.model, 300) == 7


def test_evaluator_end_to_end_synthetic(tmp_path):
    exp = get_config('pre_vost', model='aott')
    cfg = exp.model
    model = build_vos_model(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 65, 65, 3)),
                        jnp.zeros((1, 65, 65, cfg.id_dim)))
    ds = build_synthetic_dataset(num_seqs=2, num_frames=4, size=(65, 65),
                                 obj_num=2)
    ev = Evaluator(model, params, exp, str(tmp_path))
    stats = ev.evaluate(ds, verbose=False)
    assert stats.total_frames == 2 * 3      # 2 seqs x 3 non-ref frames
    for i in range(2):
        files = sorted(os.listdir(tmp_path / f'test_{i}'))
        assert files == ['00001.png', '00002.png', '00003.png']
        from PIL import Image
        m = np.array(Image.open(tmp_path / f'test_{i}' / files[0]))
        assert m.shape == (65, 65)
        assert m.max() <= 2


def test_scorer_roundtrip(tmp_path):
    """Perfect predictions must score J == 1; half-overlap scores 1/3."""
    from PIL import Image
    from rmem_ocu_tpu.eval.scorer import (GTDataset, evaluate_semisupervised,
                                          summarize)
    from rmem_ocu_tpu.ops.masks import VOS_PALETTE

    root = tmp_path / 'data'
    res = tmp_path / 'results'
    (root / 'Annotations' / 'seq').mkdir(parents=True)
    (root / 'ImageSets').mkdir()
    (res / 'seq').mkdir(parents=True)
    (root / 'ImageSets' / 'val.txt').write_text('seq\n')

    h = w = 32
    for t in range(6):
        gt = np.zeros((h, w), np.uint8)
        gt[:, :16] = 1
        im = Image.fromarray(gt).convert('P')
        im.putpalette(VOS_PALETTE)
        im.save(root / 'Annotations' / 'seq' / f'{t:05d}.png')
        pred = np.zeros((h, w), np.uint8)
        pred[:, 8:24] = 1          # half-overlapping box: IoU = 8/24 = 1/3
        im = Image.fromarray(pred).convert('P')
        im.putpalette(VOS_PALETTE)
        im.save(res / 'seq' / f'{t:05d}.png')

    ds = GTDataset(str(root), 'val')
    out = evaluate_semisupervised(ds, str(res))
    s = summarize(out)
    np.testing.assert_allclose(s['J_mean'], 1 / 3, atol=1e-6)
    np.testing.assert_allclose(s['J_last_mean'], 1 / 3, atol=1e-6)
