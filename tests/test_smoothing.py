"""One-Euro temporal smoothing (spec_tpu/utils/smoothing.py) — the
implemented version of the reference's dead --smooth flag
(scripts/spec_demo.py:138)."""

import numpy as np

from spec_tpu.utils.smoothing import one_euro, smooth_track_params


def test_one_euro_passthrough_cases():
    # T=1 and constant signals come back unchanged
    x1 = np.random.RandomState(0).rand(1, 5).astype(np.float32)
    np.testing.assert_array_equal(one_euro(x1, fps=30), x1)
    const = np.full((20, 3), 2.5, np.float32)
    np.testing.assert_allclose(one_euro(const, fps=30), const, atol=1e-6)


def test_one_euro_reduces_jitter_keeps_trend():
    """High-frequency noise is attenuated while the slow trend (and fast
    genuine motion, via the speed term) is preserved."""
    rng = np.random.RandomState(0)                  # pinned: thresholds
    t = np.arange(120) / 30.0                       # verified vs seed 0
    trend = np.sin(2 * np.pi * 0.25 * t)            # slow, real motion
    noise = 0.05 * rng.randn(120)                   # frame jitter
    x = (trend + noise)[:, None].astype(np.float64)
    y = one_euro(x, fps=30)[:, 0]

    def hf_energy(s):
        return float(np.mean(np.diff(s) ** 2))

    assert hf_energy(y) < 0.3 * hf_energy(x[:, 0])
    # no gross lag/attenuation of the underlying trend
    assert float(np.abs(y - trend).mean()) < 0.07
    # beta speed term: a step transition is tracked quickly
    step = np.concatenate([np.zeros(30), np.ones(30)])[:, None]
    ys = one_euro(step, fps=30)[:, 0]
    assert ys[35] > 0.9


def test_smooth_track_params_contract(rng):
    """Rotations stay orthonormal after 6D-space smoothing; betas become
    the track mean; cam is filtered."""
    import jax.numpy as jnp

    from spec_tpu.core import geometry as G

    T = 12
    base = G.rot6d_to_rotmat(jnp.asarray(rng.randn(24, 6).astype('f4')))
    # jitter the pose around a fixed body configuration
    pose = np.asarray(
        [np.asarray(G.euler_to_rotmat(jnp.asarray(
            rng.randn(24, 3).astype('f4') * 0.02))) @ np.asarray(base)
         for _ in range(T)], np.float32)
    betas = rng.randn(T, 10).astype(np.float32) * 0.1
    cam = np.stack([np.full(T, 0.9), rng.randn(T) * 0.01,
                    rng.randn(T) * 0.01], -1).astype(np.float32)

    sm = smooth_track_params(pose, betas, cam, fps=30)
    assert sm['pose'].shape == pose.shape
    RtR = np.einsum('tjab,tjcb->tjac', sm['pose'], sm['pose'])
    np.testing.assert_allclose(
        RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5)
    dets = np.linalg.det(sm['pose'].reshape(-1, 3, 3))
    np.testing.assert_allclose(dets, 1.0, atol=1e-5)
    # betas: constant, equal to the mean
    np.testing.assert_allclose(sm['betas'][0], betas.mean(0), atol=1e-6)
    np.testing.assert_allclose(sm['betas'].std(0), 0.0, atol=1e-7)
    # smoothing reduced frame-to-frame pose jitter
    def jitter(p):
        return float(np.mean((p[1:] - p[:-1]) ** 2))
    assert jitter(sm['pose']) < jitter(pose)


def test_one_euro_gap_aware_timestamps():
    """Across a track gap (occlusion bridged by the tracker) the filter
    must use theTRUE elapsed time: a large dt means little low-pass memory,
    so the output at the rejoin hugs the raw sample more than the
    uniform-1/fps assumption would."""
    rng = np.random.RandomState(0)
    x = np.zeros((4, 1), np.float64)
    x[3] = 5.0                       # jump after a 7-frame gap
    t_idx = np.array([0, 1, 2, 10])  # frames 3..9 occluded
    y_gap = one_euro(x, fps=30, t_idx=t_idx)[3, 0]
    y_uni = one_euro(x, fps=30)[3, 0]
    assert abs(y_gap - 5.0) < abs(y_uni - 5.0)
    # constant signal stays exact regardless of spacing
    const = np.full((5, 2), 3.25)
    np.testing.assert_allclose(
        one_euro(const, fps=30, t_idx=np.array([0, 1, 5, 6, 20])),
        const, atol=1e-6)
    del rng


def test_one_euro_t_idx_validation():
    x = np.zeros((3, 1))
    with np.testing.assert_raises(ValueError):
        one_euro(x, fps=30, t_idx=np.array([0, 2, 2]))
    with np.testing.assert_raises(ValueError):
        one_euro(x, fps=30, t_idx=np.array([0, 1]))


def test_smooth_track_params_accepts_frames():
    rng = np.random.RandomState(1)
    T = 6
    import jax.numpy as jnp
    from spec_tpu.core import geometry as G
    r6 = rng.standard_normal((T * 24, 6)).astype(np.float32)
    pose = np.asarray(G.rot6d_to_rotmat(jnp.asarray(r6))).reshape(
        T, 24, 3, 3)
    out = smooth_track_params(
        pose, rng.standard_normal((T, 10)).astype(np.float32),
        rng.standard_normal((T, 3)).astype(np.float32), fps=30,
        frames=np.array([0, 1, 2, 9, 10, 11]))
    assert out['pose'].shape == (T, 24, 3, 3)
    # still valid rotations after gap-aware smoothing
    eye = np.einsum('tjab,tjcb->tjac', out['pose'], out['pose'])
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3),
                               (T, 24, 3, 3)), atol=1e-5)
