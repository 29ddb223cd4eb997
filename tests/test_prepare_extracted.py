"""prepare_extracted staging tool: layout + name-stable eval object ids.

The raw labelme data orders polygon shapes inconsistently across frames
(('peeling','Peeled') and ('Peeled','peeling') both occur in the reference
extracted_frames), so the eval GT must key object ids by label NAME — this
test swaps shape order between two frames and asserts the rasterized ids
don't swap.
"""
import json
import os

import numpy as np
import pytest
from PIL import Image

from rmem_ocu_tpu.tools.prepare_extracted import prepare


def _write_frame(root, num, shapes, size=(40, 60)):
    h, w = size
    img = Image.fromarray(
        np.full((h, w, 3), num % 255, np.uint8))
    img.save(os.path.join(root, f'frame_{num}.jpg'))
    with open(os.path.join(root, f'frame_{num}.json'), 'w') as f:
        json.dump({'imageHeight': h, 'imageWidth': w,
                   'shapes': shapes}, f)


def _rect(label, x0, y0, x1, y1):
    return {'label': label, 'shape_type': 'polygon',
            'points': [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]}


A = _rect('alpha', 2, 2, 12, 12)        # left box
B = _rect('beta', 30, 2, 50, 20)        # right box


@pytest.fixture
def staged(tmp_path):
    src = tmp_path / 'src'
    src.mkdir()
    # 5 train frames, 3 eval frames; eval frame 105 swaps shape order and
    # frame 106 drops one object entirely
    for n in (100, 101, 102, 103):
        _write_frame(str(src), n, [A, B])
    _write_frame(str(src), 104, [A, B])
    _write_frame(str(src), 105, [B, A])        # swapped order
    _write_frame(str(src), 106, [B])           # alpha absent
    # a non-matching file must be ignored (the real dir has test_frame.json)
    with open(src / 'test_frame.json', 'w') as f:
        json.dump({'shapes': []}, f)
    out = tmp_path / 'out'
    prepare(str(src), str(out), eval_frames=3, seq_name='seq')
    return out


def test_layout_and_split(staged):
    train = sorted(os.listdir(staged / 'train' / 'extracted_frames'))
    assert train == [f'frame_{n}.{e}' for n in (100, 101, 102, 103)
                     for e in ('jpg', 'json')]
    imgs = sorted(os.listdir(staged / 'eval' / 'JPEGImages_10fps' / 'seq'))
    anns = sorted(os.listdir(staged / 'eval' / 'Annotations' / 'seq'))
    assert imgs == ['000104.jpg', '000105.jpg', '000106.jpg']
    assert anns == ['000104.png', '000105.png', '000106.png']
    with open(staged / 'eval' / 'ImageSets' / 'val.txt') as f:
        assert f.read().split() == ['seq']


def test_ids_stable_under_shape_order_swap(staged):
    ann = staged / 'eval' / 'Annotations' / 'seq'
    m0 = np.array(Image.open(ann / '000104.png'))
    m1 = np.array(Image.open(ann / '000105.png'))
    m2 = np.array(Image.open(ann / '000106.png'))
    # alpha (left box) keeps id 1 in both frames despite the order swap
    assert m0[5, 5] == 1 and m1[5, 5] == 1
    assert m0[10, 40] == 2 and m1[10, 40] == 2
    # frame with alpha absent still labels beta as 2
    assert m2[5, 5] == 0 and m2[10, 40] == 2
    # palette PNGs (the scorer + eval datasets read these)
    assert Image.open(ann / '000104.png').mode == 'P'
