"""Tests for the CamCalib bin tables and decoders against an independent
scipy/numpy reconstruction of the reference semantics."""

import numpy as np
import jax.numpy as jnp
import torch

from spec_tpu.core import bins as B


class TestBinTables:
    def test_uniform_tables(self):
        assert B.VFOV_EDGES.shape == (255,)
        np.testing.assert_allclose(float(B.VFOV_EDGES[0]), 0.2617, rtol=1e-6)
        np.testing.assert_allclose(float(B.VFOV_EDGES[-1]), 2.1, rtol=1e-6)
        np.testing.assert_allclose(float(B.PITCH_EDGES[0]), -0.6, rtol=1e-6)
        np.testing.assert_allclose(float(B.ROLL_EDGES[-1]), 0.6, rtol=1e-6)

    def test_centers_last_equals_edge(self):
        assert B.VFOV_CENTERS.shape == (256,)
        np.testing.assert_allclose(float(B.VFOV_CENTERS[-1]),
                                   float(B.VFOV_EDGES[-1]))
        # Interior centers are midpoints.
        e = np.asarray(B.PITCH_EDGES)
        c = np.asarray(B.PITCH_CENTERS)
        np.testing.assert_allclose(c[:-2], (e[:-1] + e[1:]) / 2, atol=1e-6)

    def test_legacy_roll_against_scipy(self):
        """Recompute with scipy.stats.norm exactly as the reference does."""
        from scipy.stats import norm
        x = np.linspace(-np.pi / 6, np.pi / 6, 255)
        pdf = norm(0, 0.5).pdf(x)
        pdf /= pdf.max()
        pdf *= 0.04
        pdf = pdf.max() * 1.1 - pdf
        cumsum = np.cumsum(pdf)
        cumsum = cumsum / cumsum.max() * np.pi
        cumsum -= cumsum[pdf.size // 2]
        np.testing.assert_allclose(np.asarray(B.LEGACY_ROLL_EDGES), cumsum,
                                   atol=1e-6)

    def test_legacy_roll_denser_near_zero(self):
        e = np.asarray(B.LEGACY_ROLL_EDGES)
        d = np.diff(e)
        assert d[len(d) // 2] < d[0]  # finer bins at center


class TestSoftargmax:
    def test_matches_torch_softmax_expectation(self):
        torch.manual_seed(0)
        logits = torch.randn(8, 256)
        probs = torch.softmax(logits, dim=-1)
        idx = torch.arange(256, dtype=torch.float32)
        expected = (probs * idx).sum(-1) / 255 * 2 - 1
        got = np.asarray(B.softargmax1d(jnp.asarray(logits.numpy())))
        np.testing.assert_allclose(got, expected.numpy(), atol=1e-5)

    def test_peaked_logits_recover_index(self):
        logits = np.full((1, 256), -50.0, np.float32)
        logits[0, 100] = 50.0
        got = float(B.softargmax1d(jnp.asarray(logits))[0])
        np.testing.assert_allclose(got, 100 / 255 * 2 - 1, atol=1e-4)


class TestDecode:
    def test_argmax_decode(self):
        logits = np.zeros((2, 256), np.float32)
        logits[0, 0] = 10.0
        logits[1, 255] = 10.0
        v = np.asarray(B.bins2vfov(jnp.asarray(logits)))
        np.testing.assert_allclose(v[0], float(B.VFOV_CENTERS[0]))
        np.testing.assert_allclose(v[1], float(B.VFOV_CENTERS[255]))

    def test_soft_idx_round_trip(self):
        angles = np.linspace(0.3, 2.0, 7)
        idx = B.vfov2soft_idx(angles)
        back = B.soft_idx_to_angle(idx, 0.2617, 2.1)
        np.testing.assert_allclose(back, angles, rtol=1e-6)

    def test_convert_preds_softargmax_path(self):
        rng = np.random.RandomState(1)
        logits = [jnp.asarray(rng.randn(4, 256).astype(np.float32))
                  for _ in range(3)]
        vfov, pitch, roll = B.convert_preds_to_angles(
            *logits, loss_type='softargmax_biased_l2')
        assert vfov.shape == (4,)
        v = np.asarray(vfov)
        assert (v >= 0.2617 - 1e-5).all() and (v <= 2.1 + 1e-5).all()
        r = np.asarray(roll)
        assert (r >= -0.6 - 1e-5).all() and (r <= 0.6 + 1e-5).all()

    def test_convert_preds_ce_path(self):
        rng = np.random.RandomState(2)
        logits = [jnp.asarray(rng.randn(4, 256).astype(np.float32))
                  for _ in range(3)]
        vfov, pitch, roll = B.convert_preds_to_angles(*logits, loss_type='ce')
        # ce decode of roll uses the legacy warped table.
        centers = np.asarray(B.LEGACY_ROLL_CENTERS)
        assert np.isin(np.asarray(roll), centers).all()

    def test_digitize_targets(self):
        edges = np.asarray(B.PITCH_EDGES)
        t = B.angle_to_bin_index(np.array([-1.0, 0.0, 1.0]), edges)
        assert t[0] == 0          # below range
        assert t[2] == 255        # above range
        assert 0 < t[1] < 255
