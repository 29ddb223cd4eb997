"""Space-to-depth conv == strided nn.Conv, exactly (same multiply-adds).

Covers every stem shape the encoders use: ResNet conv1 7x7/s2/p3, the
patch-wise id bank 17x17/s16/p8 (align_corners) and 16x16/s16/p0,
MobileNet/ResNeSt 3x3/s2/p1, Swin 4x4/s4/p0 — at odd (align_corners)
and even input sizes, with and without bias.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn

from rmem_ocu_tpu.ops.s2d import S2DConv, s2d_conv


CASES = [
    # (H, W, cin, cout, k, stride, pad, bias)
    (65, 113, 3, 64, 7, 2, 3, False),     # resnet conv1, odd sizes
    (64, 112, 3, 64, 7, 2, 3, False),     # resnet conv1, even sizes
    (65, 113, 12, 32, 17, 16, 8, True),   # id bank, align_corners
    (64, 112, 12, 32, 16, 16, 0, True),   # id bank, no align_corners
    (65, 113, 3, 16, 3, 2, 1, False),     # mobilenet/resnest stem
    (64, 112, 3, 24, 4, 4, 0, True),      # swin patch embed
    (33, 49, 4, 8, 7, 2, 3, False),       # topdown stem w/ mask channel
]


@pytest.mark.parametrize('h,w,cin,cout,k,s,p,bias', CASES)
def test_s2d_matches_nn_conv(h, w, cin, cout, k, s, p, bias):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, cin), jnp.float32)

    ref = nn.Conv(cout, (k, k), strides=s, padding=p, use_bias=bias)
    params = ref.init(jax.random.PRNGKey(1), x)
    want = ref.apply(params, x)

    s2d = S2DConv(cout, (k, k), strides=s, padding=p, use_bias=bias)
    got = s2d.apply(params, x)   # identical param pytree by construction

    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_s2d_grads_match():
    """d/dkernel and d/dx flow through the scatter identically."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 33, 49, 3), jnp.float32)
    kern = jnp.asarray(rng.randn(7, 7, 3, 8) * 0.1, jnp.float32)

    def loss_ref(kern, x):
        y = jax.lax.conv_general_dilated(
            x, kern, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return jnp.sum(y ** 2)

    def loss_s2d(kern, x):
        return jnp.sum(s2d_conv(x, kern, 2, 3) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(kern, x)
    g_s2d = jax.grad(loss_s2d, argnums=(0, 1))(kern, x)
    for a, b in zip(g_s2d, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
