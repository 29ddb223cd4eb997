"""Numeric parity of the benchmark scorer vs the reference `evaluation/`
package (evaluation/source/{metrics,utils,dataset,results}.py) — the scorer
is the framework's acceptance test (reference train_vost.sh:77-79), so its
math is verified here against the reference bit for bit: db_eval_iou,
db_eval_boundary/f_measure (incl. the empty-boundary edge cases),
db_statistics, and the full read-GT → read-results → J/J_last pipeline on a
synthetic dataset tree.

Documented deliberate divergence: reference db_statistics casts the decay
bin indices to uint8 (utils.py:152), which overflows for sequences longer
than 255 frames; this scorer uses int64. Parity is asserted at n <= 255.
"""
import sys
import types
from math import floor

import numpy as np
import pytest

REF_EVAL = '/root/reference/evaluation'


def _shim_skimage():
    # the reference's f_measure imports skimage.morphology.disk inline
    # (metrics.py:84); skimage is not installed, so provide the identical
    # x^2 + y^2 <= r^2 structuring element
    if 'skimage' in sys.modules:
        return
    sk = types.ModuleType('skimage')
    morph = types.ModuleType('skimage.morphology')

    def disk(radius):
        L = np.arange(-int(radius), int(radius) + 1)
        X, Y = np.meshgrid(L, L)
        return ((X ** 2 + Y ** 2) <= radius ** 2).astype(np.uint8)

    morph.disk = disk
    sk.morphology = morph
    sys.modules['skimage'] = sk
    sys.modules['skimage.morphology'] = morph


@pytest.fixture(scope='module')
def ref():
    _shim_skimage()
    if REF_EVAL not in sys.path:
        sys.path.insert(0, REF_EVAL)
    from source import metrics as ref_metrics  # noqa: E402
    from source import utils as ref_utils  # noqa: E402
    return ref_metrics, ref_utils


def _blob(rng, h, w, n_blobs=3):
    """Random blobby binary mask (union of filled discs)."""
    yy, xx = np.mgrid[:h, :w]
    m = np.zeros((h, w), bool)
    for _ in range(n_blobs):
        cy, cx = rng.randint(h), rng.randint(w)
        r = rng.randint(3, max(4, min(h, w) // 3))
        m |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    return m


def test_iou_parity(ref):
    ref_metrics, _ = ref
    from rmem_ocu_tpu.eval import metrics as M
    rng = np.random.RandomState(0)
    for h, w in [(37, 53), (60, 60)]:
        ann = _blob(rng, h, w)
        seg = _blob(rng, h, w)
        void = _blob(rng, h, w, 1)
        for v in (None, void):
            ours = M.db_eval_iou(ann, seg, v)
            theirs = ref_metrics.db_eval_iou(ann.copy(), seg.copy(),
                                             None if v is None else v.copy())
            assert np.allclose(ours, theirs), (h, w, v is None)
        # 3D stacks (per-frame vectorized path)
        ann3 = np.stack([_blob(rng, h, w) for _ in range(5)])
        seg3 = np.stack([_blob(rng, h, w) for _ in range(5)])
        ours = M.db_eval_iou(ann3, seg3)
        theirs = ref_metrics.db_eval_iou(ann3.copy(), seg3.copy())
        assert np.allclose(ours, theirs)
    # empty-union frames score 1 in both
    z = np.zeros((16, 16), bool)
    assert M.db_eval_iou(z, z) == ref_metrics.db_eval_iou(z.copy(), z.copy())


def test_boundary_parity(ref):
    ref_metrics, _ = ref
    from rmem_ocu_tpu.eval import metrics as M
    rng = np.random.RandomState(1)
    for h, w in [(41, 59), (97, 131)]:
        for _ in range(3):
            gt = _blob(rng, h, w)
            fg = _blob(rng, h, w)
            void = _blob(rng, h, w, 1)
            for v in (None, void):
                ours = M.f_measure(fg, gt, v)
                theirs = ref_metrics.f_measure(
                    fg.copy(), gt.copy(), None if v is None else v.copy())
                assert np.isclose(ours, theirs), (h, w)
    # edge cases: one side empty -> 0, both empty -> 1 (metrics.py:100-108)
    z = np.zeros((33, 33), bool)
    b = _blob(np.random.RandomState(2), 33, 33)
    for fg, gt in [(z, b), (b, z), (z, z)]:
        assert M.f_measure(fg, gt) == ref_metrics.f_measure(fg.copy(),
                                                            gt.copy())
    # 3D dispatcher
    gt3 = np.stack([_blob(rng, 41, 59) for _ in range(4)])
    fg3 = np.stack([_blob(rng, 41, 59) for _ in range(4)])
    assert np.allclose(M.db_eval_boundary(gt3, fg3),
                       ref_metrics.db_eval_boundary(gt3.copy(), fg3.copy()))


def test_statistics_parity(ref):
    _, ref_utils = ref
    from rmem_ocu_tpu.eval import metrics as M
    rng = np.random.RandomState(3)
    for n in [4, 5, 7, 13, 37, 100, 255]:
        vals = rng.rand(n)
        ours = M.db_statistics(vals)
        theirs = ref_utils.db_statistics(vals.copy())
        assert np.allclose(ours, theirs, equal_nan=True), n
    # NaN frames are stripped by nanmean in both
    vals = rng.rand(20)
    vals[[3, 7]] = np.nan
    assert np.allclose(M.db_statistics(vals),
                       ref_utils.db_statistics(vals.copy()), equal_nan=True)


def _write_synthetic_tree(root, n_seqs=2, n_frames=9, size=(48, 64),
                          n_objs=2):
    """GT tree (Annotations + ImageSets/val.txt) and a results tree with
    imperfect predictions; returns (gt_root, results_root)."""
    from PIL import Image
    rng = np.random.RandomState(7)
    gt_root = root / 'gt'
    res_root = root / 'results'
    (gt_root / 'ImageSets').mkdir(parents=True)
    names = [f'seq{i}' for i in range(n_seqs)]
    (gt_root / 'ImageSets' / 'val.txt').write_text(
        '\n'.join(names) + '\n')
    h, w = size
    for seq in names:
        (gt_root / 'Annotations' / seq).mkdir(parents=True)
        (res_root / seq).mkdir(parents=True)
        for t in range(n_frames):
            gt = np.zeros((h, w), np.uint8)
            pred = np.zeros((h, w), np.uint8)
            for o in range(1, n_objs + 1):
                m = _blob(rng, h, w, 2)
                gt[m] = o
                # prediction = shifted GT (imperfect but overlapping)
                pred[np.roll(m, rng.randint(0, 4), axis=1)] = o
            gt[_blob(rng, h, w, 1) & (gt == 0)] = 255        # void pixels
            Image.fromarray(gt).save(
                gt_root / 'Annotations' / seq / f'{t:05d}.png')
            Image.fromarray(pred).save(res_root / seq / f'{t:05d}.png')
    return gt_root, res_root


def test_scorer_pipeline_parity(ref, tmp_path):
    """Full pipeline vs the reference Dataset/Results readers + the exact
    evaluate() loop (evaluation.py:80-102, run inline without the mp
    fan-out): first/last frame drop, last-quarter index, per-object J and
    J_last M/R/D."""
    gt_root, res_root = _write_synthetic_tree(tmp_path)

    from source.dataset import Dataset as RefDataset
    from source.metrics import db_eval_iou as ref_iou
    from source.results import Results as RefResults
    from source.utils import db_statistics as ref_stats

    from rmem_ocu_tpu.eval.scorer import (GTDataset,
                                          evaluate_semisupervised)

    ours = evaluate_semisupervised(GTDataset(str(gt_root), 'val'),
                                   str(res_root))

    ref_ds = RefDataset(root=str(gt_root), subset='val')
    ref_res = RefResults(root_dir=str(res_root))
    theirs = {m: {'M': [], 'R': [], 'D': [], 'M_per_object': {}}
              for m in ('J', 'J_last')}
    for seq in ref_ds.get_sequences():
        gt_masks, _, mask_ids = ref_ds.get_all_masks(seq, True)
        gt_masks, mask_ids = gt_masks[:, 1:-1], mask_ids[1:-1]
        last_q = int(floor(len(mask_ids) * 0.75))
        res_masks = ref_res.read_masks(seq, mask_ids)
        if res_masks.shape[0] < gt_masks.shape[0]:   # evaluation.py:35-37
            pad = np.zeros((gt_masks.shape[0] - res_masks.shape[0],
                            *res_masks.shape[1:]))
            res_masks = np.concatenate([res_masks, pad], 0)
        res_masks = res_masks[:gt_masks.shape[0]]
        for ii in range(gt_masks.shape[0]):
            j = ref_iou(gt_masks[ii], res_masks[ii], None)
            for name, vals in (('J', j), ('J_last', j[last_q:])):
                m, r, d = ref_stats(vals)
                theirs[name]['M'].append(m)
                theirs[name]['R'].append(r)
                theirs[name]['D'].append(d)
                theirs[name]['M_per_object'][f'{seq}_{ii + 1}'] = m

    for metric in ('J', 'J_last'):
        for stat in ('M', 'R', 'D'):
            assert np.allclose(sorted(ours[metric][stat]),
                               sorted(theirs[metric][stat]),
                               equal_nan=True), (metric, stat)
        assert set(ours[metric]['M_per_object']) == set(
            theirs[metric]['M_per_object'])
        for k, v in theirs[metric]['M_per_object'].items():
            assert np.isclose(ours[metric]['M_per_object'][k], v), (metric, k)
