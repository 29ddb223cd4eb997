"""Parity for the remaining encoder matrix: MobileNetV3, ResNet-101,
ResNeSt-101, and the ResNet-50 TopDown two-pass encoder (incl. var-loss),
vs the reference torch modules with converted weights."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from dataclasses import replace  # noqa: E402

from rmem_ocu_tpu.config import get_config, get_model_config  # noqa: E402
from rmem_ocu_tpu.models.encoders.mobilenetv3 import (  # noqa: E402
    MobileNetV3Encoder)
from rmem_ocu_tpu.models.encoders.resnet import ResNetEncoder  # noqa: E402
from rmem_ocu_tpu.models.encoders.resnest import ResNeStEncoder  # noqa: E402
from rmem_ocu_tpu.models.encoders.resnet_topdown import (  # noqa: E402
    ResNetTopDownEncoder)
from rmem_ocu_tpu.utils.torch_convert import convert_torch_params  # noqa: E402

from ref_utils import randomize_state_dict, setup_reference_path  # noqa: E402

setup_reference_path()

# 65 = 1 (mod 16): the TopDown transposed-conv feedback only shape-matches
# the forward activations at the reference's align_corners grid
SIZE = 65


def _img(seed=0):
    return np.random.RandomState(seed).randn(1, SIZE, SIZE, 3).astype(
        np.float32)


def _check(jenc, tenc, cfg_name, seed, rtol=1e-3, atol=1e-4):
    tenc.eval()
    randomize_state_dict(tenc, seed=seed)
    x = _img(seed=seed + 1)
    variables = jenc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    cfg = get_model_config(cfg_name)
    params, _ = convert_torch_params(tenc.state_dict(), variables, cfg,
                                     strict=True)
    outs = jenc.apply(params, jnp.asarray(x))
    with torch.no_grad():
        t_outs = tenc(torch.from_numpy(x).permute(0, 3, 1, 2))
    assert len(outs) == 4
    for i, (got, want) in enumerate(zip(outs, t_outs)):
        np.testing.assert_allclose(np.asarray(got),
                                   want.permute(0, 2, 3, 1).numpy(),
                                   rtol=rtol, atol=atol, err_msg=f'scale {i}')


def test_mobilenetv3_encoder_parity():
    from networks.encoders.mobilenetv3 import MobileNetV3Large
    from networks.layers.normalization import FrozenBatchNorm2d
    tenc = MobileNetV3Large(16, FrozenBatchNorm2d, freeze_at=-1)
    # the reference's forward drops the final stage through self.conv
    _check(MobileNetV3Encoder(), tenc, 'aott', seed=31)


def test_resnet101_encoder_parity():
    from networks.encoders.resnet import ResNet101
    from networks.layers.normalization import FrozenBatchNorm2d
    tenc = ResNet101(16, FrozenBatchNorm2d, freeze_at=-1)
    _check(ResNetEncoder(layers=(3, 4, 23)), tenc, 'r101_aotl', seed=33)


def test_resnest101_encoder_parity():
    from networks.encoders.resnest import resnest
    from networks.layers.normalization import FrozenBatchNorm2d
    tenc = resnest.resnest101(norm_layer=FrozenBatchNorm2d, dilation=2,
                              freeze_at=-1)
    _check(ResNeStEncoder(layers=(3, 4, 23), stem_width=64), tenc,
           'rs101_aotl', seed=35)


def test_resnet50_topdown_encoder_parity():
    from networks.encoders.resnet import ResNet50_TopDown
    from networks.layers.normalization import FrozenBatchNorm2d
    tenc = ResNet50_TopDown(16, FrozenBatchNorm2d, freeze_at=-1)
    tenc.eval()
    randomize_state_dict(tenc, seed=37)

    jenc = ResNetTopDownEncoder(layers=(3, 4, 6))
    x = _img(seed=38)
    variables = jenc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    cfg = get_model_config('r50_topdown_aotl')
    params, _ = convert_torch_params(tenc.state_dict(), variables, cfg,
                                     strict=True)
    outs, sown = jenc.apply(params, jnp.asarray(x), mutable=['losses'])
    with torch.no_grad():
        t_outs, t_var = tenc(torch.from_numpy(x).permute(0, 3, 1, 2))
    for i, (got, want) in enumerate(zip(outs, t_outs)):
        np.testing.assert_allclose(np.asarray(got),
                                   want.permute(0, 2, 3, 1).numpy(),
                                   rtol=2e-3, atol=5e-4, err_msg=f'scale {i}')
    var = float(jax.tree.leaves(sown['losses'])[0])
    np.testing.assert_allclose(var, float(t_var), rtol=1e-3)


def test_topdown_var_loss_in_episode():
    """The train episode collects the sown var_loss: episode loss shifts by
    exactly (w2 - w1) * var_loss when var_loss_weight changes (reference
    aot_engine.py:115-118)."""
    from rmem_ocu_tpu.engine.train_engine import TrainEngine
    from rmem_ocu_tpu.models import build_vos_model

    size, t = 49, 2
    exp = get_config('pre_vost', model='r50_topdown_aotl')
    exp = replace(exp, data_seq_len=t, train_total_steps=100,
                  model=replace(exp.model, lstt_num=1))
    model = build_vos_model(exp.model)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(1, t, size, size, 3), jnp.float32)
    masks = jnp.asarray((rng.rand(1, t, size, size) * 3).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), frames[:, 0],
                        jnp.zeros((1, size, size, exp.model.id_dim)))

    def loss_with(w):
        e = replace(exp, model=replace(exp.model, var_loss_weight=w))
        eng = TrainEngine(build_vos_model(e.model), e)
        total, aux = eng.episode_loss(
            params, frames, masks, jnp.array([2], jnp.int32),
            jnp.zeros((), jnp.int32), jax.random.PRNGKey(1),
            enable_id_shuffle=False)
        return float(total), float(aux['var_loss'])

    l1, v1 = loss_with(0.01)
    l2, v2 = loss_with(1.0)
    assert v1 > 0 and np.isclose(v1, v2)
    np.testing.assert_allclose(l2 - l1, (1.0 - 0.01) * v1, rtol=1e-4)
