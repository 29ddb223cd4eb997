"""Layer-7 CLI smoke tests: demo tool end to end on synthetic frames
(reference aot_plus/tools/demo.py), video renderer on saved masks."""
import os
import sys

import numpy as np
import pytest

PIL = pytest.importorskip('PIL')
from PIL import Image  # noqa: E402


def _write_frames(d, n=3, size=49):
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    names = []
    for i in range(n):
        name = f'{i:05d}.jpg'
        Image.fromarray(
            (rng.rand(size, size, 3) * 255).astype(np.uint8)).save(
                os.path.join(d, name))
        names.append(name)
    return names


def _write_mask(path, size=49):
    from rmem_ocu_tpu.ops.masks import save_mask_png
    m = np.zeros((size, size), np.uint8)
    m[10:30, 10:30] = 1
    m[32:45, 5:20] = 2
    save_mask_png(m, path)


def test_demo_cli_end_to_end(tmp_path, monkeypatch):
    frames = tmp_path / 'clip'
    _write_frames(str(frames))
    mask_png = tmp_path / 'first.png'
    _write_mask(str(mask_png))
    out = tmp_path / 'out'

    from rmem_ocu_tpu.tools import demo
    monkeypatch.setattr(sys, 'argv', [
        'demo', '--img_dir', str(frames), '--mask', str(mask_png),
        '--model', 'aott', '--stage', 'pre_vost',
        '--output', str(out), '--max_size', '65'])
    demo.main()

    masks = sorted(os.listdir(out / 'masks' / 'clip'))
    assert len(masks) == 3
    m = np.array(Image.open(out / 'masks' / 'clip' / masks[0]))
    assert m.shape == (49, 49)
    overlays = sorted(os.listdir(out / 'overlay' / 'clip'))
    assert len(overlays) == 3
    assert (out / 'clip.mp4').exists()
