"""Fused inference trunk + bottleneck kernel vs the flax ResNet."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spec_tpu.models import backbones as B
from spec_tpu.models.backbones.fused_resnet import fused_resnet_apply
from spec_tpu.ops.pallas.bottleneck import (
    fold_bn,
    fused_bottleneck_chain,
    fused_identity_bottleneck,
)


def _ref_identity_block(x, w1, b1, w2, b2, w3, b3):
    M = w1.shape[1]
    h1 = jax.nn.relu(jnp.einsum('bhwc,cm->bhwm', x, w1) + b1)
    h2 = jax.lax.conv_general_dilated(
        h1, w2.reshape(3, 3, M, M), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    h2 = jax.nn.relu(h2 + b2)
    return jax.nn.relu(jnp.einsum('bhwm,mc->bhwc', h2, w3) + b3 + x)


def _rand_block_weights(rng, C, M):
    return (jnp.asarray(rng.randn(C, M).astype('f4') * 0.05),
            jnp.asarray(rng.randn(M).astype('f4') * 0.1),
            jnp.asarray(rng.randn(9, M, M).astype('f4') * 0.05),
            jnp.asarray(rng.randn(M).astype('f4') * 0.1),
            jnp.asarray(rng.randn(M, C).astype('f4') * 0.05),
            jnp.asarray(rng.randn(C).astype('f4') * 0.1))


def _rand_vars(rng, model, shape):
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros(shape))
    # randomize BN stats so folding is actually exercised
    def rnd(tree):
        return jax.tree.map(
            lambda a: jnp.asarray(
                rng.rand(*a.shape).astype('f4') * 0.5 + 0.5), tree)
    stats = rnd(variables['batch_stats'])
    return {'params': variables['params'], 'batch_stats': stats}


def test_fused_bottleneck_kernel_matches_conv(rng):
    Bn, H, W, C, M = 2, 16, 24, 256, 64
    x = jnp.asarray(rng.randn(Bn, H, W, C).astype('f4') * 0.5)
    w1 = jnp.asarray(rng.randn(C, M).astype('f4') * 0.05)
    b1 = jnp.asarray(rng.randn(M).astype('f4') * 0.1)
    w2 = jnp.asarray(rng.randn(9, M, M).astype('f4') * 0.05)
    b2 = jnp.asarray(rng.randn(M).astype('f4') * 0.1)
    w3 = jnp.asarray(rng.randn(M, C).astype('f4') * 0.05)
    b3 = jnp.asarray(rng.randn(C).astype('f4') * 0.1)

    h1 = jax.nn.relu(jnp.einsum('bhwc,cm->bhwm', x, w1) + b1)
    h2 = jax.lax.conv_general_dilated(
        h1, w2.reshape(3, 3, M, M), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    h2 = jax.nn.relu(h2 + b2)
    ref = jax.nn.relu(jnp.einsum('bhwm,mc->bhwc', h2, w3) + b3 + x)

    out = fused_identity_bottleneck(x, w1, b1, w2, b2, w3, b3,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize('k,rt,hw', [(2, 16, (16, 24)), (3, 8, (24, 11)),
                                     (2, 8, (13, 24))])
def test_fused_chain_matches_sequential_blocks(rng, k, rt, hw):
    """K chained blocks == K sequential conv blocks, incl. the border
    masking of intermediate halo rows (odd H exercises uneven tiles)."""
    Bn, (H, W), C, M = 2, hw, 256, 64
    x = jnp.asarray(rng.randn(Bn, H, W, C).astype('f4') * 0.5)
    ws = tuple(_rand_block_weights(rng, C, M) for _ in range(k))
    ref = x
    for w in ws:
        ref = _ref_identity_block(ref, *w)
    out = fused_bottleneck_chain(x, ws, interpret=True, row_tile=rt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-4)


def test_fold_bn_algebra(rng):
    k = jnp.asarray(rng.randn(3, 3, 8, 16).astype('f4'))
    scale = jnp.asarray(rng.rand(16).astype('f4') + 0.5)
    bias = jnp.asarray(rng.randn(16).astype('f4'))
    mean = jnp.asarray(rng.randn(16).astype('f4'))
    var = jnp.asarray(rng.rand(16).astype('f4') + 0.1)
    x = jnp.asarray(rng.randn(2, 10, 10, 8).astype('f4'))

    y_ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    y_ref = (y_ref - mean) * scale * jax.lax.rsqrt(var + 1e-5) + bias

    kf, bf = fold_bn(k, scale, bias, mean, var)
    y = jax.lax.conv_general_dilated(
        x, kf, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + bf
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)


def test_fused_trunk_matches_flax_resnet50(rng):
    model = B.get_backbone('resnet50')
    shape = (1, 64, 96, 3)
    variables = _rand_vars(rng, model, shape)
    x = jnp.asarray(rng.randn(2, *shape[1:]).astype('f4'))

    ref = model.apply(variables, x, train=False)
    out = fused_resnet_apply(variables, x, arch='resnet50',
                             compute_dtype=jnp.float32, interpret=True)
    assert out.shape == ref.shape == (2, 2, 3, 2048)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-4)


def test_fused_trunk_rejects_basicblock_archs():
    with pytest.raises(ValueError):
        fused_resnet_apply({}, jnp.zeros((1, 32, 32, 3)), arch='resnet34')
