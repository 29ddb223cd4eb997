"""Observability parity: train-time IoU vs the reference pytorch_iou,
label2colormap vs the reference bit-shuffle, config snapshot roundtrip."""
import json

import numpy as np
import pytest

import jax.numpy as jnp

from rmem_ocu_tpu.config import config_from_dict, config_to_dict, get_config
from rmem_ocu_tpu.ops.masks import label2colormap
from rmem_ocu_tpu.utils.metric import batched_iou

from ref_utils import setup_reference_path

setup_reference_path()


def test_batched_iou_matches_reference():
    torch = pytest.importorskip('torch')
    from utils.metric import pytorch_iou

    rng = np.random.RandomState(0)
    for case in range(4):
        b = 3
        pred = (rng.rand(b, 24, 24) * 4).astype(np.int64)
        target = (rng.rand(b, 24, 24) * 4).astype(np.int64)
        obj_nums = np.array([3, 2, 0 if case == 1 else 1])
        if case == 2:
            obj_nums = np.zeros(3, np.int64)   # all-background fallback -> 1
        want = float(pytorch_iou(torch.from_numpy(pred),
                                 torch.from_numpy(target),
                                 torch.from_numpy(obj_nums)))
        got = float(batched_iou(jnp.asarray(pred), jnp.asarray(target),
                                jnp.asarray(obj_nums), max_obj=5))
        np.testing.assert_allclose(got, want, rtol=1e-5,
                                   err_msg=f'case {case}')


def test_label2colormap_matches_reference():
    from utils.image import label2colormap as ref_cmap
    m = np.arange(256, dtype=np.uint8).reshape(16, 16)
    np.testing.assert_array_equal(label2colormap(m), ref_cmap(m))


def test_tb_image_log_helper():
    """_tb_log_images builds HWC uint8 overlays from a train batch +
    metrics (reference trainer.py:712-761)."""
    from rmem_ocu_tpu.tools.train import _tb_log_images

    class StubTB:
        def __init__(self):
            self.images = {}

        def add_image(self, tag, img, step, dataformats):
            assert dataformats == 'HWC'
            self.images[tag] = np.asarray(img)

    rng = np.random.RandomState(0)
    batch = {
        'frames': rng.randn(2, 4, 24, 24, 3).astype(np.float32),
        'masks': (rng.rand(2, 4, 24, 24) * 3).astype(np.int32),
    }
    metrics = {'pred_mask': (rng.rand(2, 24, 24) * 3).astype(np.int32)}
    tb = StubTB()
    _tb_log_images(tb, 7, batch, metrics)
    for tag in ('train/image', 'train/gt_overlay', 'train/pred_overlay'):
        assert tb.images[tag].shape == (24, 24, 3)
        assert tb.images[tag].dtype == np.uint8


def test_no_memory_gap_couples_derived_settings():
    """NO_MEMORY_GAP sets att_heads=2 and quarters reverse_loss in the
    config composition layer (reference configs/models/r50_deaotl.py:23,27);
    explicitly requested values are never clobbered."""
    from dataclasses import replace

    base = get_config('pre_vost_2', model='r50_deaotl').model
    assert base.att_heads == 1 and base.reverse_loss == 0.4
    m = get_config('pre_vost_2', model='r50_deaotl',
                   no_memory_gap=True).model
    assert m.no_memory_gap
    assert m.att_heads == 2
    assert m.reverse_loss == 0.1
    # an explicit att_heads/reverse_loss wins over the coupling
    m_exp = get_config('pre_vost_2', model='r50_deaotl',
                       no_memory_gap=True, att_heads=1,
                       reverse_loss=0.4).model
    assert m_exp.att_heads == 1 and m_exp.reverse_loss == 0.4
    # roundtrip through the snapshot does not re-derive
    d = json.loads(json.dumps(config_to_dict(
        replace(get_config('pre_vost_2', model='r50_deaotl'),
                model=m))))
    m2 = config_from_dict(d).model
    assert m2 == m


def test_oracle_couples_use_mask_and_conditions_encoder():
    """ORACLE implies USE_MASK (reference r50_topdown_aotl.py:13) and the
    mask must actually reach the TopDown encoder: with use_mask the GT mask
    changes the 16x features (round-2 advisor: build_encoder dropped
    use_mask so --oracle silently ran non-oracle)."""
    import jax
    import jax.numpy as jnp
    import pytest
    from dataclasses import replace
    from rmem_ocu_tpu.config import get_model_config
    from rmem_ocu_tpu.models import build_vos_model

    m = get_model_config('r50_topdown_aotl', oracle=True)
    assert m.use_mask
    # non-topdown encoders cannot consume a mask -> loud config error
    with pytest.raises(ValueError):
        get_model_config('r50_deaotl', oracle=True)

    model = build_vos_model(replace(m, lstt_num=1))
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (1, 65, 65, 3))
    oh = jnp.zeros((1, 65, 65, m.id_dim))
    params = model.init(rng, img, oh)
    mask0 = jnp.zeros((1, 65, 65, 1), jnp.int32)
    mask1 = jnp.ones((1, 65, 65, 1), jnp.int32)
    enc = lambda mk: model.apply(params, img, mk, mutable=['losses'],
                                 method='encode_image')[0][-1]
    assert not jnp.allclose(enc(mask0), enc(mask1))


def test_config_snapshot_roundtrip():
    exp = get_config('pre_vost_2', model='r50_deaotl')
    d = json.loads(json.dumps(config_to_dict(exp)))
    exp2 = config_from_dict(d)
    assert exp2 == exp
    # the reloaded snapshot is usable for model construction
    assert exp2.model.mem_bank_capacity == exp.model.mem_bank_capacity
