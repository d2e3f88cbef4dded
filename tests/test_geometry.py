"""Unit tests for spec_tpu.core.geometry.

Property-based: round-trips, orthogonality, known closed-form values, and
cross-checks against independent scipy/torch constructions.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spec_tpu.core import geometry as G


def random_rotmats(rng, n):
    """Independent ground-truth rotations via scipy-free QR construction."""
    A = rng.randn(n, 3, 3)
    Q, R = np.linalg.qr(A)
    # Fix sign so det = +1.
    Q = Q * np.sign(np.diagonal(R, axis1=-2, axis2=-1))[:, None, :]
    det = np.linalg.det(Q)
    Q[det < 0, :, 2] *= -1
    return Q.astype(np.float32)


class TestRot6d:
    def test_round_trip(self, rng):
        R = random_rotmats(rng, 32)
        six = G.rotmat_to_rot6d(jnp.asarray(R))
        R2 = G.rot6d_to_rotmat(six)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)

    def test_orthonormal_output(self, rng):
        x = jnp.asarray(rng.randn(16, 6).astype(np.float32))
        R = np.asarray(G.rot6d_to_rotmat(x))
        eye = np.einsum('bij,bkj->bik', R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)),
                                   atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


class TestRodrigues:
    def test_against_closed_form(self):
        # 90 deg about z.
        aa = jnp.asarray([[0.0, 0.0, np.pi / 2]])
        R = np.asarray(G.rodrigues(aa))[0]
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        np.testing.assert_allclose(R, expected, atol=1e-6)

    def test_zero_angle(self):
        R = np.asarray(G.rodrigues(jnp.zeros((4, 3))))
        np.testing.assert_allclose(R, np.tile(np.eye(3), (4, 1, 1)), atol=1e-7)

    def test_tiny_angle_stable(self):
        aa = jnp.full((2, 3), 1e-6)
        R = np.asarray(G.rodrigues(aa))
        assert np.isfinite(R).all()
        np.testing.assert_allclose(R, np.tile(np.eye(3), (2, 1, 1)), atol=1e-5)

    def test_round_trip_aa(self, rng):
        aa = rng.randn(64, 3).astype(np.float32)
        # Keep angles within (0, pi) for uniqueness.
        norm = np.linalg.norm(aa, axis=-1, keepdims=True)
        aa = aa / norm * (rng.rand(64, 1).astype(np.float32) * 3.0 + 0.01)
        R = G.rodrigues(jnp.asarray(aa))
        aa2 = np.asarray(G.rotmat_to_aa(R))
        R2 = np.asarray(G.rodrigues(jnp.asarray(aa2)))
        np.testing.assert_allclose(R2, np.asarray(R), atol=1e-4)

    def test_matches_torch_cross_impl(self, rng):
        """Cross-check against an independent torch matrix_exp construction."""
        import torch
        aa = rng.randn(16, 3).astype(np.float32)
        R_jax = np.asarray(G.rodrigues(jnp.asarray(aa)))
        K = torch.zeros(16, 3, 3)
        t = torch.from_numpy(aa)
        K[:, 0, 1], K[:, 0, 2] = -t[:, 2], t[:, 1]
        K[:, 1, 0], K[:, 1, 2] = t[:, 2], -t[:, 0]
        K[:, 2, 0], K[:, 2, 1] = -t[:, 1], t[:, 0]
        R_torch = torch.matrix_exp(K).numpy()
        np.testing.assert_allclose(R_jax, R_torch, atol=1e-5)


class TestEuler:
    def test_pitch_only(self):
        pitch = 0.3
        R = np.asarray(G.euler_to_rotmat(jnp.asarray([[pitch, 0.0, 0.0]])))[0]
        c, s = np.cos(pitch), np.sin(pitch)
        expected = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
        np.testing.assert_allclose(R, expected, atol=1e-6)

    def test_composition_order(self):
        """R = Rx(pitch) @ Ry(yaw) @ Rz(roll) — pitch outermost."""
        R = np.asarray(
            G.euler_to_rotmat(jnp.asarray([[0.2, 0.0, 0.1]])))[0]
        Rp = np.asarray(G.euler_to_rotmat(jnp.asarray([[0.2, 0.0, 0.0]])))[0]
        Rr = np.asarray(G.euler_to_rotmat(jnp.asarray([[0.0, 0.0, 0.1]])))[0]
        np.testing.assert_allclose(R, Rp @ Rr, atol=1e-6)

    def test_matches_pare_quaternion_construction(self):
        """Cross-check against an independent torch reconstruction of the
        reference's batch_euler2matrix (PARE: euler -> quaternion
        qx ⊗ qy ⊗ qz -> matrix). The composition order is the observable
        reference contract for every camera rotation (consumed at
        spec/utils/cam_params.py:37, cam_dataset.py:637-639)."""
        import torch

        def euler_to_quaternion(r):
            x, y, z = r[..., 0] / 2, r[..., 1] / 2, r[..., 2] / 2
            cz, sz = torch.cos(z), torch.sin(z)
            cy, sy = torch.cos(y), torch.sin(y)
            cx, sx = torch.cos(x), torch.sin(x)
            q = torch.zeros_like(r.repeat(1, 2))[..., :4]
            q[..., 0] += cx * cy * cz - sx * sy * sz
            q[..., 1] += cz * sx * cy + sz * cx * sy
            q[..., 2] += cz * cx * sy - sz * sx * cy
            q[..., 3] += cx * cy * sz + sx * cz * sy
            return q

        def quat_to_rotmat(quat):
            q = quat / quat.norm(p=2, dim=1, keepdim=True)
            w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
            B = quat.size(0)
            return torch.stack([
                w * w + x * x - y * y - z * z, 2 * x * y - 2 * w * z,
                2 * w * y + 2 * x * z,
                2 * w * z + 2 * x * y, w * w - x * x + y * y - z * z,
                2 * y * z - 2 * w * x,
                2 * x * z - 2 * w * y, 2 * w * x + 2 * y * z,
                w * w - x * x - y * y + z * z], dim=1).reshape(B, 3, 3)

        angles = np.array([[0.2, 0.0, 0.1],
                           [0.1, 0.3, -0.2],
                           [-0.35, 0.05, 0.25]], np.float32)
        ref = quat_to_rotmat(
            euler_to_quaternion(torch.from_numpy(angles))).numpy()
        ours = np.asarray(G.euler_to_rotmat(jnp.asarray(angles)))
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_rodrigues_small_angle_linear_term(self):
        """Taylor branch: R ~ I + [aa]_x with unit-slope gradients —
        regression for the extra-theta bug (gradients vanished at
        theta -> 0, breaking e.g. differentiable pose fitting)."""
        import jax

        aa = jnp.asarray([[[5e-5, -3e-5, 2e-5]]])
        R = np.asarray(G.rodrigues(aa))[0, 0]
        np.testing.assert_allclose(R[2, 1], 5e-5, rtol=1e-3)
        np.testing.assert_allclose(R[0, 2], -3e-5, rtol=1e-3)

        g = jax.grad(
            lambda a: G.rodrigues(a)[0, 0, 2, 1])(aa)
        np.testing.assert_allclose(float(np.asarray(g)[0, 0, 0]), 1.0,
                                   atol=1e-3)
        # Continuity across the branch threshold.
        lo = np.asarray(G.rodrigues(jnp.asarray([[[9.9e-5, 0, 0]]])))
        hi = np.asarray(G.rodrigues(jnp.asarray([[[1.01e-4, 0, 0]]])))
        np.testing.assert_allclose(lo, hi, atol=1e-5)

    def test_rodrigues_gradient_finite_at_exact_zero(self):
        """grad through rodrigues at aa == 0 exactly (identity-pose init,
        the standard starting point for pose fitting) must be finite:
        norm() is non-differentiable at 0 and its NaN leaks through the
        unselected where-branch unless theta is computed from a masked
        input."""
        import jax

        g = jax.grad(lambda a: G.rodrigues(a).sum())(jnp.zeros((1, 1, 3)))
        assert np.isfinite(np.asarray(g)).all(), np.asarray(g)
        # d(R[2,1])/d(aa_x) = 1 at the origin (linear term)
        g21 = jax.grad(lambda a: G.rodrigues(a)[0, 0, 2, 1])(
            jnp.zeros((1, 1, 3)))
        np.testing.assert_allclose(np.asarray(g21)[0, 0],
                                   [1.0, 0.0, 0.0], atol=1e-6)


class TestProjection:
    def test_identity_cam_center_point(self):
        pts = jnp.asarray([[[0.0, 0.0, 5.0]]])
        K = G.build_cam_intrinsics(jnp.asarray([1000.0]), jnp.asarray([640.0]),
                                   jnp.asarray([480.0]))
        eye = jnp.eye(3)[None]
        t = jnp.zeros((1, 3))
        uv = np.asarray(G.perspective_projection(pts, eye, t, K))
        np.testing.assert_allclose(uv[0, 0], [320.0, 240.0], atol=1e-4)

    def test_focal_scaling(self):
        pts = jnp.asarray([[[0.1, 0.2, 2.0]]])
        K = G.build_cam_intrinsics(jnp.asarray([500.0]), jnp.asarray([640.0]),
                                   jnp.asarray([480.0]))
        uv = np.asarray(G.perspective_projection(
            pts, jnp.eye(3)[None], jnp.zeros((1, 3)), K))
        np.testing.assert_allclose(
            uv[0, 0], [320 + 500 * 0.1 / 2.0, 240 + 500 * 0.2 / 2.0],
            atol=1e-4)

    def test_weak_persp_consistency(self):
        """Full-image translation must reproduce weak-perspective placement
        when bbox is centered at the principal point."""
        B = 4
        rng = np.random.RandomState(0)
        s = rng.rand(B).astype(np.float32) + 0.5
        cam = np.stack([s, rng.randn(B).astype(np.float32) * 0.1,
                        rng.randn(B).astype(np.float32) * 0.1], axis=1)
        img_w = np.full(B, 640.0, np.float32)
        img_h = np.full(B, 480.0, np.float32)
        center = np.stack([img_w / 2, img_h / 2], axis=1)
        scale = np.full(B, 1.12, np.float32)
        f = np.full(B, 1000.0, np.float32)
        t = np.asarray(G.weak_perspective_to_full_translation(
            jnp.asarray(cam), jnp.asarray(center), jnp.asarray(scale),
            jnp.asarray(img_w), jnp.asarray(img_h), jnp.asarray(f)))
        # Project the origin: perspective gives f * t_xy / t_z + principal.
        expected_x = f * t[:, 0] / t[:, 2] + img_w / 2
        # Weak perspective: crop pixel = s * tx * (b/2) + crop center; in
        # full-image pixels that is center_x + s * tx * b / 2.
        b = scale * 200.0
        np.testing.assert_allclose(
            expected_x, center[:, 0] + s * cam[:, 1] * b / 2, rtol=1e-4)

    def test_vfov_focal_round_trip(self):
        vfov = jnp.asarray([0.8, 1.2])
        h = jnp.asarray([480.0, 1080.0])
        f = G.focal_length_from_vfov(vfov, h)
        np.testing.assert_allclose(
            np.asarray(G.vfov_from_focal_length(f, h)), np.asarray(vfov),
            rtol=1e-6)


class TestProcrustes:
    def test_exact_recovery(self, rng):
        """S2 = s R S1 + t must be recovered exactly."""
        S1 = rng.randn(8, 14, 3).astype(np.float32)
        R = random_rotmats(rng, 8)
        s = (rng.rand(8, 1, 1).astype(np.float32) + 0.5)
        t = rng.randn(8, 1, 3).astype(np.float32)
        S2 = s * np.einsum('bij,bnj->bni', R, S1) + t
        S1_hat = np.asarray(G.procrustes_align(jnp.asarray(S1),
                                               jnp.asarray(S2)))
        np.testing.assert_allclose(S1_hat, S2, atol=1e-4)

    def test_reduces_error(self, rng):
        S1 = rng.randn(4, 14, 3).astype(np.float32)
        S2 = S1 + rng.randn(4, 14, 3).astype(np.float32) * 0.1
        S1_hat = np.asarray(G.procrustes_align(jnp.asarray(S1),
                                               jnp.asarray(S2)))
        err_before = np.linalg.norm(S1 - S2, axis=-1).mean()
        err_after = np.linalg.norm(S1_hat - S2, axis=-1).mean()
        assert err_after <= err_before + 1e-6

    def test_reflection_guard(self, rng):
        """Aligned output must never be a reflection."""
        S1 = rng.randn(4, 14, 3).astype(np.float32)
        S2 = S1.copy()
        S2[..., 0] *= -1  # mirrored target
        S1_hat = np.asarray(G.procrustes_align(jnp.asarray(S1),
                                               jnp.asarray(S2)))
        assert np.isfinite(S1_hat).all()
