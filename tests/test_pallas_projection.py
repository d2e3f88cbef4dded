"""Fused projection kernel vs geometry.perspective_projection."""

import numpy as np
import jax.numpy as jnp

from spec_tpu.core import geometry as G
from spec_tpu.core.geometry import rodrigues
from spec_tpu.ops.pallas.projection import project_points


def test_projection_kernel_matches_jnp(rng):
    B, V = 5, 700
    pts = jnp.asarray(rng.randn(B, V, 3).astype('f4'))
    R = rodrigues(jnp.asarray(rng.randn(B, 3).astype('f4') * 0.2))
    t = jnp.asarray(np.concatenate(
        [rng.randn(B, 2), rng.rand(B, 1) * 5 + 3], -1).astype('f4'))
    K = G.build_cam_intrinsics(
        jnp.asarray(rng.rand(B).astype('f4') * 1000 + 500),
        jnp.full((B,), 1920.0), jnp.full((B,), 1080.0))

    ref = np.asarray(G.perspective_projection(pts, R, t, K))
    out = np.asarray(project_points(pts, R, t, K, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=1e-5)


def test_projection_kernel_identity_cam(rng):
    B, V = 2, 100
    pts = jnp.asarray(
        np.concatenate([rng.randn(B, V, 2), np.full((B, V, 1), 4.0)],
                       -1).astype('f4'))
    R = jnp.tile(jnp.eye(3), (B, 1, 1))
    t = jnp.zeros((B, 3))
    K = G.build_cam_intrinsics(jnp.full((B,), 100.0),
                               jnp.full((B,), 200.0), jnp.full((B,), 200.0))
    out = np.asarray(project_points(pts, R, t, K, interpret=True))
    expect = np.asarray(pts)[..., :2] * 100.0 / 4.0 + 100.0
    np.testing.assert_allclose(out, expect, atol=1e-3)


def test_projection_kernel_batch_above_tile(rng):
    """B > 64 and not a multiple of the 64-row batch tile: the grid must
    cover the padded batch (regression: rows past the last full tile came
    back uninitialized)."""
    B, V = 80, 130
    pts = jnp.asarray(rng.randn(B, V, 3).astype('f4'))
    R = rodrigues(jnp.asarray(rng.randn(B, 3).astype('f4') * 0.2))
    t = jnp.asarray(np.concatenate(
        [rng.randn(B, 2), rng.rand(B, 1) * 5 + 3], -1).astype('f4'))
    K = G.build_cam_intrinsics(
        jnp.asarray(rng.rand(B).astype('f4') * 1000 + 500),
        jnp.full((B,), 1920.0), jnp.full((B,), 1080.0))
    ref = np.asarray(G.perspective_projection(pts, R, t, K))
    out = np.asarray(project_points(pts, R, t, K, interpret=True))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=1e-4)
