"""Train data pipeline + checkpoint roundtrip tests."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dataclasses import replace

from rmem_ocu_tpu.config import get_config
from rmem_ocu_tpu.data.train_datasets import (SyntheticTrainDataset,
                                              TrainDataLoader,
                                              build_train_dataset,
                                              merge_samples)


def _exp(**kw):
    exp = get_config('pre_vost', model='aott')
    return replace(exp, data_seq_len=3, **kw)


def test_synthetic_dataset_and_loader():
    exp = _exp(datasets=('test',))
    ds = build_train_dataset(exp)
    assert isinstance(ds, SyntheticTrainDataset)
    loader = TrainDataLoader(ds, batch_size=2, num_workers=2)
    batch = next(iter(loader))
    assert batch['frames'].shape == (2, 3, 465, 465, 3)
    assert batch['masks'].shape == (2, 3, 465, 465)
    assert batch['obj_nums'].tolist() == [3, 3]


def test_loader_rank_sharding():
    exp = _exp(datasets=('test',))
    ds = build_train_dataset(exp)
    b0 = next(iter(TrainDataLoader(ds, 2, seed=7, rank=0, world=2)))
    b1 = next(iter(TrainDataLoader(ds, 2, seed=7, rank=1, world=2)))
    assert b0['frames'].shape == b1['frames'].shape


def test_merge_samples_semantics():
    rng = np.random.RandomState(0)
    t, h, w = 2, 16, 16
    s1 = {'frames': np.zeros((t, h, w, 3), np.float32),
          'masks': np.zeros((t, h, w), np.int32), 'obj_num': 1}
    s1['masks'][:, :8, :8] = 1
    s2 = {'frames': np.ones((t, h, w, 3), np.float32),
          'masks': np.zeros((t, h, w), np.int32), 'obj_num': 1}
    s2['masks'][:, 8:, 8:] = 1
    merged = merge_samples(s1, s2, rng, min_obj_pixels=10, max_obj_n=10)
    # clip2's object pasted over clip1, relabeled +max_obj then densified
    m = merged['masks'][0]
    assert set(np.unique(m)) == {0, 1, 2}
    assert np.all(m[8:, 8:] == 2)          # pasted object
    assert np.all(m[:8, :8] == 1)          # original object
    # pasted pixels take clip2's image
    assert np.all(merged['frames'][0][8:, 8:] == 1.0)
    assert merged['obj_num'] == 2


def test_checkpoint_roundtrip(tmp_path):
    from jax.sharding import Mesh
    from rmem_ocu_tpu.models import build_vos_model
    from rmem_ocu_tpu.train import Trainer
    from rmem_ocu_tpu.utils import checkpoint as ckpt

    exp = _exp(train_total_steps=10)
    model = build_vos_model(exp.model)
    trainer = Trainer(model, exp,
                      mesh=Mesh(np.asarray(jax.devices()[:1]), ('data',)))
    frames = jnp.zeros((1, 3, 49, 49, 3))
    masks = jnp.zeros((1, 3, 49, 49), jnp.int32)
    state = trainer.init_state(jax.random.PRNGKey(0), frames, masks)

    root = str(tmp_path / 'ckpt')
    ckpt.save_checkpoint(root, 5, state, max_keep=2)
    ckpt.save_checkpoint(root, 10, state, max_keep=2)
    ckpt.save_checkpoint(root, 15, state, max_keep=2)
    assert ckpt.list_checkpoint_steps(root) == [10, 15]

    restored, step = ckpt.restore_checkpoint(root, state)
    assert step == 15
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]))


def test_checkpoint_backup_fallback(tmp_path, monkeypatch):
    """A failed primary write lands in <root>_backup and auto-resume
    finds it there (reference utils/checkpoint.py:118-130 backup_dir).

    The failure is injected by wrapping the Orbax save (the suite runs
    as root, so a chmod-read-only directory would not actually fail)."""
    import orbax.checkpoint as ocp
    from jax.sharding import Mesh
    from rmem_ocu_tpu.models import build_vos_model
    from rmem_ocu_tpu.train import Trainer
    from rmem_ocu_tpu.utils import checkpoint as ckpt

    exp = _exp(train_total_steps=10)
    model = build_vos_model(exp.model)
    trainer = Trainer(model, exp,
                      mesh=Mesh(np.asarray(jax.devices()[:1]), ('data',)))
    frames = jnp.zeros((1, 3, 49, 49, 3))
    masks = jnp.zeros((1, 3, 49, 49), jnp.int32)
    state = trainer.init_state(jax.random.PRNGKey(0), frames, masks)

    root = str(tmp_path / 'ckpt')
    ckpt.save_checkpoint(root, 5, state)  # healthy primary write

    real_save = ocp.StandardCheckpointer.save

    def failing_save(self, path, *a, **kw):
        if str(path).startswith(root + '/'):
            raise OSError(28, 'No space left on device', str(path))
        return real_save(self, path, *a, **kw)

    monkeypatch.setattr(ocp.StandardCheckpointer, 'save', failing_save)
    ckpt.save_checkpoint(root, 10, state)
    monkeypatch.setattr(ocp.StandardCheckpointer, 'save', real_save)
    backup = ckpt.backup_root_for(root)
    assert ckpt.list_checkpoint_steps(backup) == [10]

    # auto-resume picks the newest step across primary + backup
    restored, step = ckpt.restore_checkpoint(root, state)
    assert step == 10
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]))
    # an explicit older step still resolves to the primary
    _, step5 = ckpt.restore_checkpoint(root, state, step=5)
    assert step5 == 5


def test_torch_pretrained_id_bank_pad(tmp_path):
    """The reference pads the id-bank input channel when loading pre-ignore
    checkpoints (utils/checkpoint.py:89-91)."""
    torch = pytest.importorskip('torch')
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from ref_utils import make_torch_cfg, setup_reference_path
    setup_reference_path()
    from networks.models.aot import AOT

    from rmem_ocu_tpu.config import get_model_config
    from rmem_ocu_tpu.models import build_vos_model
    from rmem_ocu_tpu.utils.checkpoint import load_torch_pretrained

    cfg = get_model_config('aott')
    # reference model without the ignore token (id_dim one smaller)
    cfg_noign = replace(cfg, ignore_token=False)
    tmodel = AOT(make_torch_cfg(cfg_noign), encoder=cfg.encoder)
    pth = tmp_path / 'old.pth'
    torch.save({'state_dict': tmodel.state_dict()}, str(pth))

    model = build_vos_model(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 49, 49, 3)),
                        jnp.zeros((1, 49, 49, cfg.id_dim)))
    loaded = load_torch_pretrained(str(pth), params, cfg)
    k = loaded['params']['patch_wise_id_bank']['kernel']
    assert k.shape[2] == cfg.id_dim
    # padded channel is zero
    assert np.abs(np.asarray(k[:, :, -1])).max() == 0
