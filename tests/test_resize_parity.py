"""Bit-level parity of ops/resize.py against torch F.interpolate."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp  # noqa: E402

from rmem_ocu_tpu.ops.resize import (interpolate_bilinear,
                                     interpolate_linear_1d,
                                     interpolate_nearest,
                                     interpolate_nearest_1d)  # noqa: E402


@pytest.mark.parametrize('in_size,out_size', [
    ((30, 30), (59, 59)), ((59, 59), (117, 117)), ((117, 117), (465, 465)),
    ((13, 17), (29, 31)), ((29, 31), (13, 17)),
])
@pytest.mark.parametrize('align', [True, False])
def test_bilinear_matches_torch(in_size, out_size, align):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *in_size, 3).astype(np.float32)
    got = np.asarray(interpolate_bilinear(jnp.asarray(x), out_size, align))
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=out_size,
        mode='bilinear', align_corners=align).permute(0, 2, 3, 1).numpy()
    # matmul-based interpolation accumulates in a different order than
    # torch's per-pixel lerp; agreement is ~1e-5 absolute at fp32
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize('in_size,out_size', [((30, 30), (117, 117)),
                                              ((14, 9), (29, 31))])
def test_nearest_matches_torch(in_size, out_size):
    rng = np.random.RandomState(1)
    x = rng.randn(1, *in_size, 2).astype(np.float32)
    got = np.asarray(interpolate_nearest(jnp.asarray(x), out_size))
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=out_size,
        mode='nearest').permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want)


@pytest.mark.parametrize('in_size,out_size', [(4, 9), (2, 4), (4, 3), (2, 7)])
def test_linear_1d_matches_torch(in_size, out_size):
    rng = np.random.RandomState(2)
    x = rng.randn(1, 8, in_size).astype(np.float32)
    got = np.asarray(interpolate_linear_1d(jnp.asarray(x), out_size, True))
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=out_size, mode='linear',
        align_corners=True).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('in_size,out_size', [(4, 9), (4, 11), (2, 5)])
def test_nearest_1d_matches_torch(in_size, out_size):
    rng = np.random.RandomState(3)
    x = rng.randn(1, 8, in_size).astype(np.float32)
    got = np.asarray(interpolate_nearest_1d(jnp.asarray(x), out_size))
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=out_size, mode='nearest').numpy()
    np.testing.assert_allclose(got, want)


def test_temporal_pe_flip_nearest_parity():
    """The reference's flip/nearest/flip memory-PE upsample
    (transformer.py:606-621) against the precomputed weight bank."""
    from rmem_ocu_tpu.ops.position import interpolated_memory_pe
    rng = np.random.RandomState(4)
    emb = rng.randn(4, 16).astype(np.float32)
    for t in range(1, 11):
        got = np.asarray(interpolated_memory_pe(jnp.asarray(emb), t, 10))
        pe = torch.from_numpy(emb)
        if t == 1:
            want = pe[:1].numpy()
        else:
            x = pe.permute(1, 0).view(1, 16, -1)
            if t <= 4:
                x = torch.nn.functional.interpolate(
                    x[:, :, :t] if t <= 4 and t <= pe.shape[0] else x,
                    size=t, mode='linear', align_corners=True)
            else:
                x = torch.nn.functional.interpolate(
                    x, size=4, mode='linear', align_corners=True)
                x = torch.flip(x, dims=(-1,))
                x = torch.nn.functional.interpolate(x, size=t, mode='nearest')
                x = torch.flip(x, dims=(-1,))
            want = x.view(16, t).permute(1, 0).numpy()
        np.testing.assert_allclose(got[:t], want, rtol=1e-5, atol=1e-6)
        assert np.all(got[t:] == 0)
