"""Multi-augmentation eval parity: our Evaluator's flip + multi-scale
protocol (per-aug engines, logit upsample, flip-back, mean-of-softmax
aggregation, nearest label resize on update) vs the reference evaluator's
protocol (evaluator.py:342-523) hand-driven over reference AOTInferEngines
with converted weights."""
import copy
import os

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rmem_ocu_tpu.config import get_config  # noqa: E402
from rmem_ocu_tpu.data.eval_datasets import VOSSequence  # noqa: E402
from rmem_ocu_tpu.eval.evaluator import (Evaluator,  # noqa: E402
                                         adaptive_mem_gap)
from rmem_ocu_tpu.models import build_vos_model  # noqa: E402
from rmem_ocu_tpu.ops.masks import read_mask_png, save_mask_png  # noqa: E402
from rmem_ocu_tpu.utils.torch_convert import convert_torch_params  # noqa: E402

from ref_utils import (make_torch_cfg, randomize_state_dict,  # noqa: E402
                       setup_reference_path)

setup_reference_path()

# the smallest aug grid must have >= 32 tokens for the reference's top-32
# attention recording (transformer.py:644-645): 113 * 0.8 snaps to 81 ->
# 6x6 = 36 keys
SIZE = 113
FRAMES = 8


def _patch_assign_identity_class():
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


def _nearest_label(label_2d: np.ndarray, size):
    """Reference: F.interpolate(label, size, mode='nearest')
    (evaluator.py:498-503)."""
    t = torch.from_numpy(label_2d.astype(np.float32))[None, None]
    return F.interpolate(t, size=size, mode='nearest')


def test_multi_aug_eval_parity(tmp_path):
    from PIL import Image

    exp = get_config('pre_vost', model='aott')
    cfg = exp.model
    jmodel = build_vos_model(cfg)

    from networks.models.aot import AOT
    from networks.engines.aot_engine import AOTInferEngine
    tmodel_base = AOT(make_torch_cfg(cfg, exp), encoder=cfg.encoder)
    tmodel_base.eval()
    randomize_state_dict(tmodel_base, seed=51)
    _patch_assign_identity_class()

    # --- synthetic sequence on disk ---
    rng = np.random.RandomState(7)
    img_dir = tmp_path / 'imgs' / 'seq0'
    lbl_dir = tmp_path / 'lbls' / 'seq0'
    os.makedirs(img_dir)
    os.makedirs(lbl_dir)
    names = []
    base_img = (rng.rand(SIZE, SIZE, 3) * 255).astype(np.uint8)
    for i in range(FRAMES):
        name = f'{i:05d}.jpg'
        jitter = (rng.rand(SIZE, SIZE, 3) * 60).astype(np.uint8)
        Image.fromarray(np.clip(base_img * 0.8 + jitter, 0,
                                255).astype(np.uint8)).save(img_dir / name)
        names.append(name)
    mask0 = np.zeros((SIZE, SIZE), np.uint8)
    mask0[8:30, 8:30] = 1
    mask0[35:60, 10:40] = 2
    mask0[5:20, 45:62] = 3
    save_mask_png(mask0, str(lbl_dir / '00000.png'))

    seq = VOSSequence(str(tmp_path / 'imgs'), str(tmp_path / 'lbls'),
                      'seq0', names, ['00000.png'], max_size=SIZE,
                      align_corners=cfg.align_corners,
                      multi_scale=(1.0, 0.8), flip=True)

    # --- ours: full Evaluator ---
    variables = jmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, SIZE, SIZE, 3)),
                            jnp.zeros((1, SIZE, SIZE, cfg.id_dim)))
    params, _ = convert_torch_params(tmodel_base.state_dict(), variables,
                                     cfg, strict=True)

    class _DS:
        def items(self):
            return [('seq0', seq)]

        def __len__(self):
            return 1

    out = tmp_path / 'out'
    ev = Evaluator(jmodel, params, exp, str(out))
    ev.evaluate(_DS(), verbose=False)

    # --- reference protocol, one AOTInferEngine per aug ---
    gap = adaptive_mem_gap(FRAMES, exp.test_long_term_mem_gap)
    obj_num = 3
    engines = None
    for frame_idx in range(FRAMES):
        samples = seq.frame(frame_idx)
        if frame_idx == 0:
            engines = []
            for a, s in enumerate(samples):
                m = tmodel_base if a == 0 else copy.deepcopy(tmodel_base)
                te = AOTInferEngine(m, gpu_id=0, long_term_mem_gap=gap,
                                    short_term_mem_skip=1,
                                    max_aot_obj_num=cfg.max_obj_num)
                te.eval()
                lbl = s.label[:, ::-1] if s.flip else s.label
                lbl_in = _nearest_label(np.ascontiguousarray(lbl),
                                        s.image.shape[:2])
                with torch.no_grad():
                    te.add_reference_frame(
                        torch.from_numpy(s.image).permute(2, 0, 1)[None],
                        lbl_in, obj_nums=obj_num, frame_step=0)
                engines.append(te)
            continue

        prob_sum = None
        for s, te in zip(samples, engines):
            with torch.no_grad():
                logits = te.match_propogate_one_frame(
                    torch.from_numpy(s.image).permute(2, 0, 1)[None],
                    output_size=(SIZE, SIZE))
            prob = torch.softmax(logits, dim=1)
            if s.flip:
                prob = torch.flip(prob, dims=(3,))
            prob_sum = prob if prob_sum is None else prob_sum + prob
        pred = torch.argmax(prob_sum, dim=1)[0].numpy().astype(np.uint8)

        for s, te in zip(samples, engines):
            lbl = pred[:, ::-1] if s.flip else pred
            lbl_in = _nearest_label(np.ascontiguousarray(lbl),
                                    s.image.shape[:2])
            with torch.no_grad():
                te.update_memory(lbl_in)

        ours = read_mask_png(str(out / 'seq0' / f'{frame_idx:05d}.png'))
        agree = float(np.mean(ours == pred))
        assert agree >= 0.995, (f'frame {frame_idx}: only {agree:.4f} '
                                'agreement with the reference protocol')


def test_label_at_matches_torch_nearest():
    """_label_at must be bit-faithful to F.interpolate(mode='nearest'),
    including the float32-scale quirk (exact integer floor diverges at
    ratios like 500->480)."""
    rng = np.random.RandomState(0)
    for (h, w), (oh, ow) in [((500, 810), (480, 624)),
                             ((65, 65), (52, 52)),
                             ((353, 625), (353, 625)),
                             ((100, 100), (720, 540))]:
        lbl = (rng.rand(h, w) * 5).astype(np.uint8)
        got = Evaluator._label_at(lbl, (oh, ow))
        want = F.interpolate(
            torch.from_numpy(lbl.astype(np.float32))[None, None],
            size=(oh, ow), mode='nearest')[0, 0].numpy().astype(np.uint8)
        np.testing.assert_array_equal(got, want, err_msg=f'{h}x{w}->{oh}x{ow}')
