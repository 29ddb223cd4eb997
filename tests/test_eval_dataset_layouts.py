"""Eval dataset root/split selection parity.

Reference: evaluator.py:145-147 (dense YTB selected by the '_all_frames'
split suffix), :171-197 (DAVIS Full-Resolution vs 480p image root via
TEST_DATASET_FULL_RESOLUTION), eval_datasets.py:190-261 (DenseTest keeps
only frames between the first and last annotated ones and remembers the
sparse annotated subset).
"""
import json
import os

import numpy as np
from PIL import Image

from rmem_ocu_tpu.data import eval_datasets as ds


def _img(path, size=(8, 8)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.zeros(size + (3,), np.uint8)).save(path)


def _png(path, size=(8, 8)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.zeros(size, np.uint8), mode='P').save(path)


def _make_davis(root, res):
    for f in ('00000', '00001'):
        _img(os.path.join(root, 'JPEGImages', res, 'seqA', f + '.jpg'))
    _png(os.path.join(root, 'Annotations', res, 'seqA', '00000.png'))
    os.makedirs(os.path.join(root, 'ImageSets', '2017'), exist_ok=True)
    with open(os.path.join(root, 'ImageSets', '2017', 'val.txt'), 'w') as f:
        f.write('seqA\n')


def test_davis_full_resolution_root(tmp_path):
    root = str(tmp_path / 'DAVIS')
    _make_davis(root, '480p')
    _make_davis(root, 'Full-Resolution')
    for full_res, res in ((False, '480p'), (True, 'Full-Resolution')):
        d = ds.build_davis_dataset(root, 'val', 2017, full_res=full_res)
        seq = d.sequences['seqA']
        assert res in seq.image_root, (full_res, seq.image_root)


def test_youtubevos_all_frames_split(tmp_path):
    root = str(tmp_path / 'YTB')
    sparse_base = os.path.join(root, '2019', 'valid')
    dense_base = sparse_base + '_all_frames'
    # annotated (sparse) frames 00005 and 00015; dense split has 00000-00020
    for f in ('00005', '00015'):
        _img(os.path.join(sparse_base, 'JPEGImages', 'vid1', f + '.jpg'))
    _png(os.path.join(sparse_base, 'Annotations', 'vid1', '00005.png'))
    for i in range(0, 21, 5):
        _img(os.path.join(dense_base, 'JPEGImages', 'vid1', f'{i:05d}.jpg'))
    meta = {'videos': {'vid1': {'objects': {
        '1': {'frames': ['00005', '00015']}}}}}
    with open(os.path.join(sparse_base, 'meta.json'), 'w') as f:
        json.dump(meta, f)

    sparse = ds.build_youtubevos_dataset(root, split='val')
    assert sparse.sequences['vid1'].images == ['00005.jpg', '00015.jpg']

    dense = ds.build_youtubevos_dataset(root, split='val', all_frames=True)
    seq = dense.sequences['vid1']
    # frames outside [first, last] annotated are dropped (00000, 00020)
    assert seq.images == ['00005.jpg', '00010.jpg', '00015.jpg']
    assert seq.images_sparse == {'00005.jpg', '00015.jpg'}
    # labels still come from the sparse split's Annotations
    assert 'valid_all_frames' not in seq.label_root
    assert 'valid_all_frames' in seq.image_root
