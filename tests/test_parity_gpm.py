"""Numerical parity of the GPM (DeAOT) block and the local windowed
attention against the reference torch implementation."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rmem_ocu_tpu.config import get_model_config  # noqa: E402
from rmem_ocu_tpu.models.gpm import GPMBlock  # noqa: E402
from rmem_ocu_tpu.ops.attention import LocalGatedPropagation  # noqa: E402
from rmem_ocu_tpu.ops.position import interpolated_memory_pe  # noqa: E402
from rmem_ocu_tpu.utils.torch_convert import convert_torch_params  # noqa: E402

from ref_utils import setup_reference_path, randomize_state_dict  # noqa: E402

setup_reference_path()

D = 64          # d_model
H = W = 6
HW = H * W
B = 1
E = 2 * D       # expand_d_model
D_ATT = D // 2  # single-head d_att


def _rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32) * 0.3


def test_local_gated_propagation_parity():
    """Windowed attention: dense padded-key formulation vs the reference's
    pad_and_unfold + local2global scatter (attention.py:220-413)."""
    from networks.layers.attention import LocalGatedPropagation as TLocal
    tmod = TLocal(d_qk=D, d_vu=2 * D, num_head=1, max_dis=2, dilation=1,
                  use_linear=False, enable_corr=False, d_att=D_ATT,
                  expand_ratio=2.0)
    tmod.eval()
    randomize_state_dict(tmod, seed=5)

    jmod = LocalGatedPropagation(d_qk=D, d_vu=2 * D, num_heads=1, max_dis=2,
                                 d_att=D_ATT, expand_ratio=2.0,
                                 use_linear=False)
    q = _rand(B, HW, D_ATT, seed=10)
    k = _rand(B, HW, D_ATT, seed=11)
    v = _rand(B, HW, 4 * D, seed=12)   # expand_d_vu = 2*d_vu
    u = _rand(B, HW, 4 * D, seed=13)

    variables = jmod.init(jax.random.PRNGKey(0), jnp.asarray(q),
                          jnp.asarray(k), jnp.asarray(v), jnp.asarray(u),
                          (H, W))
    cfg = get_model_config('r50_deaotl')
    params, missing = convert_torch_params(tmod.state_dict(), variables, cfg,
                                           strict=False)
    assert not missing, missing
    out, _ = jmod.apply(params, jnp.asarray(q), jnp.asarray(k),
                        jnp.asarray(v), jnp.asarray(u), (H, W))

    # torch wants 2D maps [B, C, H, W] for q/k/v and [HW, B, C] for u
    t_q = torch.from_numpy(q).view(B, H, W, D_ATT).permute(0, 3, 1, 2)
    t_k = torch.from_numpy(k).view(B, H, W, D_ATT).permute(0, 3, 1, 2)
    t_v = torch.from_numpy(v).view(B, H, W, 4 * D).permute(0, 3, 1, 2)
    t_u = torch.from_numpy(u).permute(1, 0, 2)
    with torch.no_grad():
        t_out, _ = tmod(t_q, t_k, t_v, t_u, (H, W))
    np.testing.assert_allclose(np.asarray(out),
                               t_out.permute(1, 0, 2).numpy(),
                               rtol=1e-4, atol=1e-5)


def _torch_gpm_block(layer_idx):
    from networks.layers.transformer import GatedPropagationModule
    blk = GatedPropagationModule(D, self_nhead=1, att_nhead=1,
                                 dim_feedforward=2 * D, droppath=0.0,
                                 layer_idx=layer_idx)
    blk.eval()
    return randomize_state_dict(blk, seed=7)


@pytest.mark.parametrize('layer_idx', [0, 1])
def test_gpm_block_reference_frame_parity(layer_idx):
    tblk = _torch_gpm_block(layer_idx)
    blk = GPMBlock(D, self_heads=1, att_heads=1, dim_feedforward=2 * D,
                   droppath=0.0, layer_idx=layer_idx, max_local_dis=7)

    tgt = _rand(B, HW, D, seed=30)
    tgt_id = None if layer_idx == 0 else _rand(B, HW, D, seed=31)
    id_emb = _rand(B, HW, D, seed=32)

    variables = blk.init(
        jax.random.PRNGKey(0), jnp.asarray(tgt),
        None if tgt_id is None else jnp.asarray(tgt_id), None, None,
        jnp.asarray(id_emb), (H, W), None)
    cfg = get_model_config('r50_deaotl')
    params, missing = convert_torch_params(tblk.state_dict(), variables, cfg,
                                           strict=False)
    assert not missing, missing

    out, out_id, mems, _ = blk.apply(
        params, jnp.asarray(tgt),
        None if tgt_id is None else jnp.asarray(tgt_id), None, None,
        jnp.asarray(id_emb), (H, W), None)

    with torch.no_grad():
        t_out, t_out_id, t_mems = tblk(
            torch.from_numpy(tgt).permute(1, 0, 2),
            None if tgt_id is None
            else torch.from_numpy(tgt_id).permute(1, 0, 2),
            None, None,
            curr_id_emb=torch.from_numpy(id_emb).permute(1, 0, 2),
            self_pos=None, size_2d=(H, W))
    np.testing.assert_allclose(np.asarray(out),
                               t_out.permute(1, 0, 2).numpy(),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_id),
                               t_out_id.permute(1, 0, 2).numpy(),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mems['global_id_v_fused']),
                               t_mems[1][3][0].permute(1, 0, 2).numpy(),
                               rtol=1e-4, atol=2e-5)


@pytest.mark.parametrize('t_mem,use_tpe', [(1, False), (5, True)])
def test_gpm_block_propagate_parity(t_mem, use_tpe):
    layer_idx = 1
    tblk = _torch_gpm_block(layer_idx)
    blk = GPMBlock(D, self_heads=1, att_heads=1, dim_feedforward=2 * D,
                   droppath=0.0, layer_idx=layer_idx, max_local_dis=7)

    tgt = _rand(B, HW, D, seed=40)
    tgt_id = _rand(B, HW, D, seed=41)
    mem_k = _rand(t_mem, HW, B, D_ATT, seed=42)
    mem_v = _rand(t_mem, HW, B, E, seed=43)
    mem_id_v = _rand(t_mem, HW, B, E, seed=44)
    s_k = _rand(B, HW, D_ATT, seed=45)
    s_v = _rand(B, HW, E, seed=46)
    s_id_v = _rand(B, HW, E, seed=47)

    cap = 6
    bank = lambda m, c: np.concatenate(
        [m.transpose(2, 0, 1, 3),
         np.zeros((B, cap - t_mem, HW, c), np.float32)], axis=1)
    length = jnp.full((B,), t_mem, jnp.int32)
    valid = jnp.arange(cap)[None] < length[:, None]

    tpe, t_tpe = None, None
    if use_tpe:
        cur_pe = _rand(1, D_ATT, seed=48)
        mem_pe = _rand(4, D_ATT, seed=49)
        mem_i = jax.vmap(lambda l: interpolated_memory_pe(
            jnp.asarray(mem_pe), l, cap))(length)
        tpe = (jnp.asarray(cur_pe[0]), mem_i)
        t_tpe = torch.from_numpy(np.concatenate([cur_pe, mem_pe], 0))

    variables = blk.init(
        jax.random.PRNGKey(0), jnp.asarray(tgt), jnp.asarray(tgt_id),
        (jnp.asarray(bank(mem_k, D_ATT)), jnp.asarray(bank(mem_v, E)),
         jnp.asarray(bank(mem_id_v, E)), valid),
        (jnp.asarray(s_k), jnp.asarray(s_v), jnp.asarray(s_id_v)),
        None, (H, W), tpe)
    cfg = get_model_config('r50_deaotl')
    params, missing = convert_torch_params(tblk.state_dict(), variables, cfg,
                                           strict=False)
    assert not missing, missing

    out, out_id, mems, mass = blk.apply(
        params, jnp.asarray(tgt), jnp.asarray(tgt_id),
        (jnp.asarray(bank(mem_k, D_ATT)), jnp.asarray(bank(mem_v, E)),
         jnp.asarray(bank(mem_id_v, E)), valid),
        (jnp.asarray(s_k), jnp.asarray(s_v), jnp.asarray(s_id_v)),
        None, (H, W), tpe, need_mass=True)

    to2d = lambda x, c: torch.from_numpy(x).view(B, H, W, c).permute(
        0, 3, 1, 2)
    with torch.no_grad():
        t_out, t_out_id, _ = tblk(
            torch.from_numpy(tgt).permute(1, 0, 2),
            torch.from_numpy(tgt_id).permute(1, 0, 2),
            [torch.from_numpy(mem_k), torch.from_numpy(mem_v), None,
             torch.from_numpy(mem_id_v)],
            [to2d(s_k, D_ATT), to2d(s_v, E), None, to2d(s_id_v, E)],
            curr_id_emb=None, self_pos=None, size_2d=(H, W),
            temporal_encoding=t_tpe, save_atten_weights=False)
    np.testing.assert_allclose(np.asarray(out),
                               t_out.permute(1, 0, 2).numpy(),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_id),
                               t_out_id.permute(1, 0, 2).numpy(),
                               rtol=1e-4, atol=2e-5)
    assert np.abs(np.asarray(mass)[:, :, t_mem:]).max() < 1e-6


def test_skew_bias_equals_gather():
    """The pad+reshape skew that scatters the per-query [ws*ws] window bias
    onto the padded key grid must equal the straightforward per-pair gather
    it replaced (an 18 ms/layer TPU pathology), for asymmetric grids."""
    from rmem_ocu_tpu.ops.attention import (_local_window_maps,
                                            _skew_bias_to_padded_grid)
    for (h, w, m), seed in (((5, 9, 2), 0), ((7, 4, 3), 1), ((1, 6, 7), 2)):
        ws = 2 * m + 1
        _, relidx = _local_window_maps(h, w, m)
        rel = np.random.RandomState(seed).randn(
            2, 3, h * w, ws * ws).astype(np.float32)
        rel_sent = np.concatenate(
            [rel, np.zeros((2, 3, h * w, 1), np.float32)], -1)
        want = np.take_along_axis(
            rel_sent,
            np.broadcast_to(relidx[None, None],
                            (2, 3) + relidx.shape), axis=-1)
        got = np.asarray(_skew_bias_to_padded_grid(jnp.asarray(rel), h, w,
                                                   ws))
        np.testing.assert_array_equal(got, want, err_msg=f'{h}x{w} m={m}')


def test_scatter_bias_equals_skew():
    """The separable one-hot matmul scatter (the TPU default: two batched
    dots instead of three 6-D transpose copies) must be bit-identical to
    the skew, including windows larger than the grid."""
    from rmem_ocu_tpu.ops.attention import (_scatter_bias_to_padded_grid,
                                            _skew_bias_to_padded_grid)
    for (h, w, m), seed in (((5, 9, 2), 0), ((7, 4, 3), 1), ((1, 6, 7), 2),
                            ((23, 40, 7), 3)):
        ws = 2 * m + 1
        rel = jnp.asarray(np.random.RandomState(seed).randn(
            2, 3, h * w, ws * ws).astype(np.float32))
        want = np.asarray(_skew_bias_to_padded_grid(rel, h, w, ws))
        got = np.asarray(_scatter_bias_to_padded_grid(rel, h, w, ws))
        np.testing.assert_array_equal(got, want, err_msg=f'{h}x{w} m={m}')
