"""ENABLE_PREV_FRAME episode layout (round-2 VERDICT #7).

The flag must round-trip from config to a different episode layout:
default = ref frame starts the walk (curr[0] re-labeled prev,
reference train_datasets.py:547-549); prev-frame mode = prev sampled
anywhere, currs walk from it, ref drawn independently
(reference :460-492 intent; the fork's branch itself is dead code).
Frame indices are recovered from the image pixel values.
"""
import os

import numpy as np
import pytest

PIL = pytest.importorskip('PIL')
from PIL import Image  # noqa: E402

from rmem_ocu_tpu.config import get_config  # noqa: E402
from rmem_ocu_tpu.data.train_datasets import VOSTrainDataset  # noqa: E402

N_FRAMES = 12
SEQ_LEN = 4


def _make_seq(root):
    img_root = os.path.join(root, 'JPEGImages')
    lab_root = os.path.join(root, 'Annotations')
    os.makedirs(os.path.join(img_root, 'seq'))
    os.makedirs(os.path.join(lab_root, 'seq'))
    images, labels = [], []
    for i in range(N_FRAMES):
        name = f'{i:05d}'
        # pixel value encodes the frame index (jpeg-safely: 20*i)
        arr = np.full((64, 64, 3), 20 * i, np.uint8)
        Image.fromarray(arr).save(
            os.path.join(img_root, 'seq', name + '.jpg'), quality=98)
        lab = np.zeros((64, 64), np.uint8)
        lab[10:45, 10:45] = 1                      # >200 fg px for ref
        Image.fromarray(lab).save(
            os.path.join(lab_root, 'seq', name + '.png'))
        images.append(name + '.jpg')
        labels.append(name + '.png')
    return img_root, lab_root, {'seq': (images, labels)}


def _episode_indices(ds, rng):
    s = ds.sample_sequence(0, rng)
    assert len(s['frames']) == SEQ_LEN and len(s['labels']) == SEQ_LEN
    return [int(round(float(np.mean(f)) / 20.0)) for f in s['frames']]


def _build(tmp_path, enable_prev_frame):
    img_root, lab_root, listing = _make_seq(
        str(tmp_path / ('prev' if enable_prev_frame else 'ref')))
    exp = get_config('pre_vost', model='aott',
                     enable_prev_frame=enable_prev_frame)
    return VOSTrainDataset(img_root, lab_root, listing, exp,
                           rand_gap=1, seq_len=SEQ_LEN, rand_reverse=False,
                           dynamic_merge=False)


def test_default_layout_ref_starts_walk(tmp_path):
    ds = _build(tmp_path, enable_prev_frame=False)
    rng = np.random.RandomState(0)
    for _ in range(20):
        idxs = _episode_indices(ds, rng)
        # rand_gap=1 -> strictly consecutive walk from the ref frame
        assert idxs == list(range(idxs[0], idxs[0] + SEQ_LEN)), idxs


def test_prev_frame_layout_decouples_ref(tmp_path):
    ds = _build(tmp_path, enable_prev_frame=True)
    assert ds.enable_prev_frame          # round-trips from ExpConfig
    rng = np.random.RandomState(0)
    decoupled = 0
    for _ in range(40):
        idxs = _episode_indices(ds, rng)
        # currs still walk consecutively from prev (gap=1)
        assert idxs[1:] == list(range(idxs[1], idxs[1] + SEQ_LEN - 1)), idxs
        if idxs[0] != idxs[1] - 1:
            decoupled += 1
    # the ref frame is sampled independently of the prev/curr window --
    # with 12 frames it lands somewhere other than prev-1 most of the time
    assert decoupled >= 10, decoupled


def test_ref_index_v1_object_consistency(tmp_path):
    """Upstream get_ref_index v1 (reference train_datasets.py:292-317):
    a candidate reference frame is rejected unless all its objects are in
    the episode's object set and it has >200 foreground pixels."""
    img_root, lab_root, listing = _make_seq(str(tmp_path / 'v1'))
    # give frame 3 an extra object (id 2) the episode set won't contain
    extra = np.zeros((64, 64), np.uint8)
    extra[10:45, 10:45] = 1
    extra[50:60, 50:60] = 2
    Image.fromarray(extra).save(
        os.path.join(lab_root, 'seq', '00003.png'))

    exp = get_config('pre_vost', model='aott')
    ds = VOSTrainDataset(img_root, lab_root, listing, exp,
                         rand_gap=1, seq_len=SEQ_LEN, rand_reverse=False,
                         dynamic_merge=False)
    labels = listing['seq'][1]
    rng = np.random.RandomState(0)
    for _ in range(50):
        ref = ds._ref_index_v1(rng, 'seq', labels, objs={0, 1})
        assert ref != 3                  # object 2 is not in the set
    # with the object allowed, frame 3 is eventually accepted
    rng = np.random.RandomState(0)
    picks = {ds._ref_index_v1(rng, 'seq', labels, objs={0, 1, 2})
             for _ in range(50)}
    assert 3 in picks
