"""Numerical parity of the LSTT / GPM transformer blocks against the
reference torch implementation, with converted weights."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rmem_ocu_tpu.config import get_model_config  # noqa: E402
from rmem_ocu_tpu.models.lstt import LSTTBlock  # noqa: E402
from rmem_ocu_tpu.models.gpm import GPMBlock  # noqa: E402
from rmem_ocu_tpu.ops.position import interpolated_memory_pe  # noqa: E402
from rmem_ocu_tpu.utils.torch_convert import convert_torch_params  # noqa: E402

from ref_utils import setup_reference_path, randomize_state_dict  # noqa: E402

setup_reference_path()

D, HEADS, FF = 64, 4, 128
H = W = 6
HW = H * W
B = 2


def _rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32) * 0.3


def _torch_lstt_block(linear_q=False):
    from networks.layers.transformer import SimplifiedTransformerBlock
    blk = SimplifiedTransformerBlock(D, HEADS, HEADS, FF, droppath=0.0,
                                     linear_q=linear_q)
    blk.eval()
    return randomize_state_dict(blk, seed=3)


def _flax_lstt_block(tblock, linear_q=False):
    blk = LSTTBlock(D, HEADS, HEADS, FF, droppath=0.0, linear_q=linear_q)
    tgt = jnp.asarray(_rand(B, HW, D))
    variables = blk.init(jax.random.PRNGKey(0), tgt, None, None,
                         jnp.asarray(_rand(B, HW, D, seed=1)), None, (H, W),
                         None)
    cfg = get_model_config('aott')
    params, missing = convert_torch_params(tblock.state_dict(), variables,
                                           cfg, strict=False)
    # the reference defines linear_KMem but never uses it (transformer.py:494)
    assert not missing, missing
    return blk, params


@pytest.mark.parametrize('linear_q', [False, True])
def test_lstt_block_reference_frame_parity(linear_q):
    tblk = _torch_lstt_block(linear_q)
    blk, params = _flax_lstt_block(tblk, linear_q)

    tgt = _rand(B, HW, D, seed=10)
    id_emb = _rand(B, HW, D, seed=11)
    pos = _rand(1, HW, D, seed=12)

    out, mems, _ = blk.apply(params, jnp.asarray(tgt), None, None,
                             jnp.asarray(id_emb), jnp.asarray(pos), (H, W),
                             None)

    t_tgt = torch.from_numpy(tgt).permute(1, 0, 2)        # [HW, B, C]
    t_id = torch.from_numpy(id_emb).permute(1, 0, 2)
    t_pos = torch.from_numpy(pos).permute(1, 0, 2)
    with torch.no_grad():
        t_out, t_mems = tblk(t_tgt, None, None, curr_id_emb=t_id,
                             self_pos=t_pos, size_2d=(H, W))
    np.testing.assert_allclose(np.asarray(out),
                               t_out.permute(1, 0, 2).numpy(),
                               rtol=1e-4, atol=1e-5)
    # memories: [[curr_K, curr_V], [global_K, global_V], [local_K, local_V]]
    np.testing.assert_allclose(np.asarray(mems['curr_k']),
                               t_mems[0][0].permute(1, 0, 2).numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mems['global_v_fused']),
                               t_mems[1][1][0].permute(1, 0, 2).numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mems['local_v']),
                               t_mems[2][1].permute(1, 0, 2).numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('t_mem,use_tpe', [(1, False), (3, False), (3, True),
                                           (6, True)])
def test_lstt_block_propagate_parity(t_mem, use_tpe):
    tblk = _torch_lstt_block(False)
    blk, params = _flax_lstt_block(tblk, False)

    tgt = _rand(B, HW, D, seed=20)
    pos = _rand(1, HW, D, seed=21)
    mem_k = _rand(t_mem, HW, B, D, seed=22)
    mem_v = _rand(t_mem, HW, B, D, seed=23)
    short_k = _rand(B, HW, D, seed=24)
    short_v = _rand(B, HW, D, seed=25)

    cap = 8  # static bank capacity with padding beyond t_mem
    bank_k = np.zeros((B, cap, HW, D), np.float32)
    bank_v = np.zeros((B, cap, HW, D), np.float32)
    bank_k[:, :t_mem] = mem_k.transpose(2, 0, 1, 3)
    bank_v[:, :t_mem] = mem_v.transpose(2, 0, 1, 3)
    length = jnp.full((B,), t_mem, jnp.int32)

    tpe = None
    t_tpe = None
    if use_tpe:
        cur_pe = _rand(1, D, seed=26)
        mem_pe = _rand(4, D, seed=27)
        mem_i = jax.vmap(lambda l: interpolated_memory_pe(
            jnp.asarray(mem_pe), l, cap))(length)
        tpe = (jnp.asarray(cur_pe[0]), mem_i)
        t_tpe = torch.from_numpy(np.concatenate([cur_pe, mem_pe], 0))

    out, mems, mass = blk.apply(
        params, jnp.asarray(tgt),
        (jnp.asarray(bank_k), jnp.asarray(bank_v),
         jnp.arange(jnp.asarray(bank_k).shape[1])[None] < length[:, None]),
        (jnp.asarray(short_k), jnp.asarray(short_v)), None,
        jnp.asarray(pos), (H, W), tpe, need_mass=True)

    with torch.no_grad():
        t_out, t_mems = tblk(
            torch.from_numpy(tgt).permute(1, 0, 2),
            [torch.from_numpy(mem_k), torch.from_numpy(mem_v)],
            [torch.from_numpy(short_k).permute(1, 0, 2),
             torch.from_numpy(short_v).permute(1, 0, 2)],
            curr_id_emb=None, self_pos=torch.from_numpy(pos).permute(1, 0, 2),
            size_2d=(H, W), temporal_encoding=t_tpe,
            save_atten_weights=False)
    np.testing.assert_allclose(np.asarray(out),
                               t_out.permute(1, 0, 2).numpy(),
                               rtol=1e-4, atol=1e-5)

    # eviction mass: compare against explicit torch attention weights
    with torch.no_grad():
        _tgt = tblk.norm1(torch.from_numpy(tgt).permute(1, 0, 2))
        q = k = _tgt + torch.from_numpy(pos).permute(1, 0, 2)
        t1 = torch.from_numpy(tgt).permute(1, 0, 2) + tblk.self_attn(
            q, k, _tgt)[0]
        _t = tblk.norm2(t1)
        curr_q = tblk.linear_Q(_t)
        flat_k = torch.from_numpy(mem_k).flatten(0, 1)
        if use_tpe:
            # replicate the reference PE interpolation
            pe = np.asarray(interpolated_memory_pe(jnp.asarray(mem_pe),
                                                   t_mem, t_mem))
            flat_k = (torch.from_numpy(mem_k) +
                      torch.from_numpy(pe).view(t_mem, 1, 1, D)).flatten(0, 1)
            curr_q = curr_q + torch.from_numpy(cur_pe).view(1, 1, D)
        _, attn = tblk.long_term_attn(curr_q, flat_k,
                                      torch.from_numpy(mem_v).flatten(0, 1),
                                      is_return_attn_weight=True)
        # [B, heads, HW, T*HW] -> mean heads, sum key-HW -> [B, HW, T]
        want_mass = attn.view(B, HEADS, HW, t_mem, HW).mean(1).sum(-1)
    np.testing.assert_allclose(np.asarray(mass)[:, :, :t_mem],
                               want_mass.numpy(), rtol=1e-4, atol=1e-5)
    assert np.abs(np.asarray(mass)[:, :, t_mem:]).max() < 1e-6


def test_gpm_multi_value_call_matches_folded_concat():
    """The single-head shared-probs split read (multi_value_call) must be
    numerically identical to one GatedPropagation call over the folded
    concat(V, ID_V) — each output channel contracts over exactly one bank,
    so only the (skipped) bank-sized concat differs."""
    from rmem_ocu_tpu.ops.attention import GatedPropagation
    from rmem_ocu_tpu.models.lstt import bank_key_bias

    B, HW, T, D_ATT, E = 2, 30, 4, 16, 24
    size_2d = (5, 6)
    gp = GatedPropagation(d_qk=2 * D_ATT, d_vu=E, num_heads=1, d_att=D_ATT,
                          use_linear=False)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, HW, D_ATT), jnp.float32)
    k = jnp.asarray(rng.randn(B, T * HW, D_ATT), jnp.float32)
    v1 = jnp.asarray(rng.randn(B, T * HW, E), jnp.float32)
    v2 = jnp.asarray(rng.randn(B, T * HW, E), jnp.float32)
    u = jnp.asarray(rng.randn(B, HW, 2 * E), jnp.float32)
    length = jnp.asarray([3, 4], jnp.int32)
    valid = jnp.arange(T)[None] < length[:, None]
    bias = bank_key_bias(valid, HW)

    params = gp.init(jax.random.PRNGKey(0), q, k,
                     jnp.concatenate([v1, v2], -1), u, size_2d,
                     key_bias=bias)
    want, want_probs = gp.apply(params, q, k, jnp.concatenate([v1, v2], -1),
                                u, size_2d, key_bias=bias, return_probs=True)
    got, got_probs = gp.apply(params, q, k, (v1, v2), u, size_2d,
                              key_bias=bias, return_probs=True,
                              method=GatedPropagation.multi_value_call)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_probs), np.asarray(want_probs),
                               rtol=1e-6, atol=1e-6)

    # in-place eviction mass == frame_mass_from_probs on the full probs
    from rmem_ocu_tpu.models.lstt import frame_mass_from_probs
    got2, got_mass = gp.apply(params, q, k, (v1, v2), u, size_2d,
                              key_bias=bias, mass_capacity=T,
                              method=GatedPropagation.multi_value_call)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got_mass),
        np.asarray(frame_mass_from_probs(want_probs, T)),
        rtol=1e-6, atol=1e-6)


def test_multihead_fused_mass_matches_frame_mass_from_probs():
    """scaled_dot_attention(mass_capacity=T) must reduce the eviction mass
    exactly like frame_mass_from_probs on the full returned probs — incl.
    the multi-head mean (the 1-head GPM variant is covered above; LSTT
    AOT-L runs this path with att_heads=8)."""
    from rmem_ocu_tpu.models.lstt import frame_mass_from_probs
    from rmem_ocu_tpu.ops.attention import scaled_dot_attention

    B, HW, T, H, D = 2, 12, 5, 4, 32
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(B, HW, H * D), jnp.float32)
    k = jnp.asarray(rng.randn(B, T * HW, H * D), jnp.float32)
    v = jnp.asarray(rng.randn(B, T * HW, H * D), jnp.float32)

    out_ref, probs = scaled_dot_attention(q, k, v, num_heads=H,
                                          return_probs=True)
    want = frame_mass_from_probs(probs, T)
    out, mass = scaled_dot_attention(q, k, v, num_heads=H, mass_capacity=T)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mass), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    assert mass.shape == (B, HW, T)
