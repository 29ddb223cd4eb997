"""Parity of the Swin-B and ResNeSt encoders vs the reference torch code."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rmem_ocu_tpu.config import get_model_config  # noqa: E402
from rmem_ocu_tpu.models.encoders.resnest import ResNeStEncoder  # noqa: E402
from rmem_ocu_tpu.models.encoders.swin import SwinEncoder  # noqa: E402
from rmem_ocu_tpu.utils.torch_convert import convert_torch_params  # noqa: E402

from ref_utils import randomize_state_dict, setup_reference_path  # noqa: E402

setup_reference_path()

SIZE = 64


def _img(seed=0):
    return np.random.RandomState(seed).randn(1, SIZE, SIZE, 3).astype(
        np.float32)


def test_swin_encoder_parity():
    from networks.encoders.swin.swin_transformer import SwinTransformer
    tenc = SwinTransformer(embed_dim=32, depths=[2, 2, 2, 2],
                           num_heads=[2, 4, 8, 16], window_size=7,
                           drop_path_rate=0.0, out_indices=(0, 1, 2),
                           ape=False, patch_norm=True, frozen_stages=-1,
                           use_checkpoint=False)
    tenc.eval()
    randomize_state_dict(tenc, seed=21)

    jenc = SwinEncoder(embed_dim=32, depths=(2, 2, 2), num_heads=(2, 4, 8))
    x = _img(seed=22)
    variables = jenc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    cfg = get_model_config('swinb_aotl')
    params, missing = convert_torch_params(tenc.state_dict(), variables,
                                           cfg, strict=True)
    outs = jenc.apply(params, jnp.asarray(x))
    with torch.no_grad():
        t_outs = tenc(torch.from_numpy(x).permute(0, 3, 1, 2))
    # the reference appends a duplicate of the 16x output (forward:714)
    assert len(t_outs) == 4
    for got, want in zip(outs, t_outs):
        np.testing.assert_allclose(np.asarray(got),
                                   want.permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-3, atol=1e-4)


def test_resnest_encoder_parity():
    from networks.encoders.resnest import resnest
    from networks.layers.normalization import FrozenBatchNorm2d
    tenc = resnest.resnest50(norm_layer=FrozenBatchNorm2d, dilation=2,
                             freeze_at=-1)
    tenc.eval()
    randomize_state_dict(tenc, seed=23)

    jenc = ResNeStEncoder(layers=(3, 4, 6), stem_width=32)
    x = _img(seed=24)
    variables = jenc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    cfg = get_model_config('rs101_aotl')
    params, missing = convert_torch_params(tenc.state_dict(), variables,
                                           cfg, strict=True)
    outs = jenc.apply(params, jnp.asarray(x))
    with torch.no_grad():
        t_outs = tenc(torch.from_numpy(x).permute(0, 3, 1, 2))
    for got, want in zip(outs, t_outs):
        np.testing.assert_allclose(np.asarray(got),
                                   want.permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-3, atol=1e-4)
