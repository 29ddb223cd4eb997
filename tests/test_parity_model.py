"""Parity of encoders, FPN decoder, and the full AOT/DeAOT model facade
against the reference, with converted weights."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rmem_ocu_tpu.config import get_model_config  # noqa: E402
from rmem_ocu_tpu.models import build_vos_model  # noqa: E402
from rmem_ocu_tpu.models.encoders.resnet import ResNetEncoder  # noqa: E402
from rmem_ocu_tpu.models.encoders.mobilenetv2 import MobileNetV2Encoder  # noqa: E402
from rmem_ocu_tpu.models.vos_model import VOSModel  # noqa: E402
from rmem_ocu_tpu.utils.torch_convert import convert_torch_params  # noqa: E402

from ref_utils import (make_torch_cfg, randomize_state_dict,  # noqa: E402
                       setup_reference_path)

setup_reference_path()

SIZE = 65


def _img(b=1, size=SIZE, seed=0):
    return np.random.RandomState(seed).randn(b, size, size, 3).astype(
        np.float32)


def test_resnet50_encoder_parity():
    from networks.encoders.resnet import ResNet, Bottleneck
    from networks.layers.normalization import FrozenBatchNorm2d
    tenc = ResNet(Bottleneck, [3, 4, 6, 3], 16, FrozenBatchNorm2d)
    tenc.eval()
    randomize_state_dict(tenc, seed=1)

    jenc = ResNetEncoder(layers=(3, 4, 6))
    x = _img()
    variables = jenc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    cfg = get_model_config('r50_aotl')
    params, missing = convert_torch_params(tenc.state_dict(), variables, cfg,
                                           strict=True)
    outs = jenc.apply(params, jnp.asarray(x))
    with torch.no_grad():
        t_outs = tenc(torch.from_numpy(x).permute(0, 3, 1, 2))
    for got, want in zip(outs, t_outs):
        np.testing.assert_allclose(np.asarray(got),
                                   want.permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-3, atol=1e-4)


def test_mobilenetv2_encoder_parity():
    from networks.encoders.mobilenetv2 import MobileNetV2
    from networks.layers.normalization import FrozenBatchNorm2d
    tenc = MobileNetV2(16, FrozenBatchNorm2d)
    tenc.eval()
    randomize_state_dict(tenc, seed=2)

    jenc = MobileNetV2Encoder()
    x = _img(seed=3)
    variables = jenc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    cfg = get_model_config('aott')
    params, missing = convert_torch_params(tenc.state_dict(), variables, cfg,
                                           strict=True)
    outs = jenc.apply(params, jnp.asarray(x))
    with torch.no_grad():
        t_outs = tenc(torch.from_numpy(x).permute(0, 3, 1, 2))
    for got, want in zip(outs, t_outs):
        np.testing.assert_allclose(np.asarray(got),
                                   want.permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize('model_name', ['aott', 'r50_deaotl'])
def test_full_model_forward_parity(model_name):
    """encode -> id-emb -> LSTT(ref frame) -> decode, both families."""
    cfg = get_model_config(model_name)
    jmodel = build_vos_model(cfg)

    tcfg = make_torch_cfg(cfg)
    if cfg.vos == 'deaot':
        from networks.models.deaot import DeAOT
        tmodel = DeAOT(tcfg, encoder=cfg.encoder)
    else:
        from networks.models.aot import AOT
        tmodel = AOT(tcfg, encoder=cfg.encoder)
    tmodel.eval()
    randomize_state_dict(tmodel, seed=4)

    x = _img(seed=5)
    rng = np.random.RandomState(6)
    mask = (rng.rand(1, SIZE, SIZE) * 3).astype(np.int64)
    one_hot_np = (mask[..., None] ==
                  np.arange(cfg.id_dim)[None, None, None]).astype(np.float32)

    variables = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x),
                            jnp.asarray(one_hot_np))
    params, missing = convert_torch_params(tmodel.state_dict(), variables,
                                           cfg, strict=True)

    # --- encode_image ---
    xs = jmodel.apply(params, jnp.asarray(x), method=VOSModel.encode_image)
    with torch.no_grad():
        t_xs = tmodel.encode_image(torch.from_numpy(x).permute(0, 3, 1, 2))
    for got, want in zip(xs, t_xs):
        np.testing.assert_allclose(np.asarray(got),
                                   want.permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-3, atol=1e-4)

    # --- get_id_emb ---
    id_emb = jmodel.apply(params, jnp.asarray(one_hot_np),
                          method=VOSModel.get_id_emb)
    with torch.no_grad():
        t_id = tmodel.get_id_emb(
            torch.from_numpy(one_hot_np).permute(0, 3, 1, 2))
        hw16 = t_id.shape[-1] * t_id.shape[-2]
        t_id_tokens = t_id.view(1, -1, hw16).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(id_emb), t_id_tokens.numpy(),
                               rtol=1e-3, atol=1e-4)

    # --- reference-frame LSTT forward + decode ---
    b, h, w, _ = xs[-1].shape
    self_pos = jmodel.apply(params, (h, w), method=VOSModel.get_pos_emb)
    tpe = jmodel.apply(params, method=VOSModel.temporal_pe)
    if tpe is not None:
        from rmem_ocu_tpu.ops.position import interpolated_memory_pe
        mem_i = jax.vmap(lambda l: interpolated_memory_pe(tpe[1], l, 1))(
            jnp.ones((b,), jnp.int32))
        tpe = (tpe[0][0], mem_i)
    inters, mems, _ = jmodel.apply(
        params, xs[-1], None, None, id_emb, self_pos, (h, w),
        temporal_pe=tpe, method=VOSModel.lstt_forward)
    logits = jmodel.apply(params, inters, xs,
                          method=VOSModel.decode_id_logits)

    with torch.no_grad():
        t_pos = tmodel.get_pos_emb(t_xs[-1]).expand(
            1, -1, -1, -1).view(1, -1, h * w).permute(2, 0, 1)
        t_tpe = (torch.cat([tmodel.cur_pos_emb, tmodel.mem_pos_emb], dim=0)
                 if cfg.use_temporal_pe else None)
        t_inters = tmodel.LSTT_forward(
            t_xs, t_id.view(1, -1, hw16).permute(2, 0, 1), pos_emb=t_pos,
            size_2d=(h, w), temporal_encoding=t_tpe)
        t_logits = tmodel.decode_id_logits(t_inters, t_xs)

    for got, want in zip(inters, t_inters):
        np.testing.assert_allclose(
            np.asarray(got),
            want.view(h, w, 1, -1).permute(2, 0, 1, 3).reshape(
                1, h * w, -1).numpy(),
            rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logits),
                               t_logits.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-3, atol=1e-4)
