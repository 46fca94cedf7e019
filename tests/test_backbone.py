import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy XLA compiles; excluded from the fast default

from uwcv_tpu.models.fpn import FPN, upsample2x_nearest
from uwcv_tpu.models.resnet import ResNet, STAGE_BLOCKS


def test_upsample2x_nearest():
    x = jnp.arange(4, dtype=jnp.float32).reshape(1, 2, 2, 1)
    y = upsample2x_nearest(x)
    assert y.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(np.asarray(y[0, :, :, 0]),
                               [[0, 0, 1, 1], [0, 0, 1, 1],
                                [2, 2, 3, 3], [2, 2, 3, 3]])


@pytest.mark.parametrize("depth", [50])
def test_resnet_fpn_shapes(depth):
    model = ResNet(depth=depth, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.key(0), x)
    feats = model.apply(params, x)
    assert feats["c2"].shape == (1, 16, 16, 256)
    assert feats["c3"].shape == (1, 8, 8, 512)
    assert feats["c4"].shape == (1, 4, 4, 1024)
    assert feats["c5"].shape == (1, 2, 2, 2048)

    fpn = FPN(channels=256, dtype=jnp.float32)
    fparams = fpn.init(jax.random.key(1), feats)
    pyr = fpn.apply(fparams, feats)
    assert pyr["p2"].shape == (1, 16, 16, 256)
    assert pyr["p5"].shape == (1, 2, 2, 256)
    assert pyr["p6"].shape == (1, 1, 1, 256)


def test_resnet101_param_count_vs_50():
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    n50 = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(
        ResNet(depth=50).init(jax.random.key(0), x)))
    n101 = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(
        ResNet(depth=101).init(jax.random.key(0), x)))
    # R50 backbone ≈ 23.5M, R101 ≈ 42.5M
    assert 22e6 < n50 < 26e6, n50
    assert 40e6 < n101 < 46e6, n101
    assert STAGE_BLOCKS[101][2] == 23


def test_stem_im2col_matches_conv():
    """StemConv's im2col+matmul re-expression is numerically the conv it
    replaces (same f32-accumulated products; PERF.md sink #3)."""
    import jax
    import jax.numpy as jnp

    from uwcv_tpu.models.resnet import StemConv

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)), jnp.float32)
    m_conv = StemConv(dtype=jnp.float32, im2col=False)
    m_i2c = StemConv(dtype=jnp.float32, im2col=True)
    params = m_conv.init(jax.random.key(0), x)
    want = m_conv.apply(params, x)
    got = m_i2c.apply(params, x)
    assert got.shape == want.shape == (2, 32, 48, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # odd input sizes hit the same output-shape formula as the conv
    x_odd = jnp.asarray(rng.normal(size=(1, 37, 51, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(m_i2c.apply(params, x_odd)),
        np.asarray(m_conv.apply(params, x_odd)), rtol=1e-5, atol=1e-5)
