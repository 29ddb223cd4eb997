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


def test_video_render_cli(tmp_path, monkeypatch):
    """tools/video.py: compose saved masks over frames into an mp4."""
    frames = tmp_path / 'imgs' / 'seq0'
    _write_frames(str(frames))
    masks = tmp_path / 'res' / 'seq0'
    import os
    os.makedirs(masks, exist_ok=True)
    for i in range(3):
        _write_mask(str(masks / f'{i:05d}.png'))

    from rmem_ocu_tpu.tools import video
    out = tmp_path / 'vis'
    monkeypatch.setattr(sys, 'argv', [
        'video', '--image_root', str(tmp_path / 'imgs'),
        '--results_path', str(tmp_path / 'res'), '--output', str(out)])
    video.main()
    assert (out / 'seq0.mp4').exists()
    assert (out / 'seq0.mp4').stat().st_size > 0


def test_pipeline_cli_end_to_end(tmp_path, monkeypatch):
    """Layer-8: tools/pipeline.py chains train -> eval on the synthetic
    'test' dataset (reference train_vost.sh:18-79; the scorer leg needs a
    GT dataset and is covered by test_eval_pipeline's scorer roundtrip)."""
    monkeypatch.chdir(tmp_path)
    from rmem_ocu_tpu.tools import pipeline
    monkeypatch.setattr(sys, 'argv', [
        'pipeline', '--exp_name', 'smoke', '--stage', 'pre_vost',
        '--model', 'aott', '--dataset', 'test',
        '--batch_size', '8', '--total_steps', '2', '--save_step', '2',
        '--crop_size', '65', '--max_size', '65'])
    pipeline.main()

    res = tmp_path / 'results' / 'smoke_aott' / 'pre_vost'
    assert (res / 'ckpt').is_dir() and os.listdir(res / 'ckpt')
    ev = res / 'eval' / 'test'
    seqs = [d for d in os.listdir(ev) if (ev / d).is_dir()]
    assert seqs, 'eval produced no sequences'
    assert any(f.endswith('.png') for f in os.listdir(ev / seqs[0]))


def test_accept_cli_end_to_end(tmp_path, monkeypatch):
    """tools/accept.py: ckpt + VOST-layout root -> eval -> score -> J/J_tr
    report, one command (VERDICT round-3 Missing #1; replaces the eval leg
    of the reference's train_vost.sh:63-79 + hand-diff vs README.md:50-53)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from rmem_ocu_tpu.config import get_config
    from rmem_ocu_tpu.models import build_vos_model
    from rmem_ocu_tpu.ops.masks import save_mask_png
    from rmem_ocu_tpu.train import Trainer
    from rmem_ocu_tpu.utils import checkpoint as ckpt_io

    monkeypatch.chdir(tmp_path)
    size = 33

    # synthetic VOST-layout tree: 1 sequence, 4 frames, GT every frame
    root = tmp_path / 'VOST'
    (root / 'JPEGImages_10fps' / 'seq').mkdir(parents=True)
    (root / 'Annotations' / 'seq').mkdir(parents=True)
    (root / 'ImageSets').mkdir()
    (root / 'ImageSets' / 'val.txt').write_text('seq\n')
    rng = np.random.RandomState(0)
    for t in range(4):
        Image.fromarray(
            (rng.rand(size, size, 3) * 255).astype(np.uint8)).save(
                root / 'JPEGImages_10fps' / 'seq' / f'{t:05d}.jpg')
        gt = np.zeros((size, size), np.uint8)
        gt[8:24, 8:24] = 1
        save_mask_png(gt, str(root / 'Annotations' / 'seq' / f'{t:05d}.png'))

    # native checkpoint for the slim model
    exp = get_config('pre_vost_2', model='aott')
    model = build_vos_model(exp.model)
    trainer = Trainer(model, exp,
                      mesh=Mesh(np.asarray(jax.devices()[:1]), ('data',)))
    state = trainer.init_state(jax.random.PRNGKey(0),
                               jnp.zeros((1, 3, size, size, 3)),
                               jnp.zeros((1, 3, size, size), jnp.int32))
    ckpt_dir = str(tmp_path / 'ckpt')
    ckpt_io.save_checkpoint(ckpt_dir, 1, state)

    from rmem_ocu_tpu.tools import accept
    out = accept.run(['--ckpt', ckpt_dir, '--vost_root', str(root),
                      '--model', 'aott', '--gap', '1',
                      '--output', str(tmp_path / 'accept_out')])
    assert os.path.isfile(out['csv'])
    assert np.isfinite(out['J']) and 0.0 <= out['J'] <= 100.0
    assert np.isfinite(out['J_tr'])
    assert 'ref_J' not in out      # aott has no published row

    # the flagship models resolve their published row
    assert accept.PUBLISHED[('r50_deaotl', 'rmem')] == (40.4, 51.8)
