"""Tests for the SMPL functional forward.

Correctness is established against an independent per-sample torch LBS
written here from the SMPL paper equations (loop-based, no batching) — a
deliberately different code path from the vectorized JAX implementation.
"""

import numpy as np
import jax.numpy as jnp
import torch

from spec_tpu.core import constants as C
from spec_tpu.core import smpl as S
from spec_tpu.core.geometry import rodrigues


def reference_lbs_torch(assets, betas, rotmats):
    """Naive loop-based SMPL forward in torch (independent cross-check)."""
    v_template = torch.from_numpy(np.asarray(assets.v_template))
    V = v_template.shape[0]
    shapedirs = torch.from_numpy(np.asarray(assets.shapedirs))  # (10, V*3)
    posedirs = torch.from_numpy(np.asarray(assets.posedirs))    # (207, V*3)
    j_reg = torch.from_numpy(np.asarray(assets.j_regressor))
    weights = torch.from_numpy(np.asarray(assets.lbs_weights))
    parents = assets.parents

    out_v, out_j = [], []
    for b in range(betas.shape[0]):
        beta = torch.from_numpy(betas[b])
        R = torch.from_numpy(rotmats[b])
        v_shaped = v_template + (beta @ shapedirs).reshape(V, 3)
        J = j_reg @ v_shaped  # (24, 3)
        pose_feat = (R[1:] - torch.eye(3)).reshape(-1)
        v_posed = v_shaped + (pose_feat @ posedirs).reshape(V, 3)

        # Global transforms.
        G = [None] * 24
        for j in range(24):
            T = torch.eye(4)
            T[:3, :3] = R[j]
            if parents[j] < 0:
                T[:3, 3] = J[j]
                G[j] = T
            else:
                T[:3, 3] = J[j] - J[parents[j]]
                G[j] = G[parents[j]] @ T
        joints_posed = torch.stack([G[j][:3, 3] for j in range(24)])

        verts = torch.zeros(V, 3)
        for j in range(24):
            A = G[j].clone()
            A[:3, 3] = A[:3, 3] - A[:3, :3] @ J[j]
            vj = (A[:3, :3] @ v_posed.T).T + A[:3, 3]
            verts += weights[:, j : j + 1] * vj
        out_v.append(verts)
        out_j.append(joints_posed)
    return torch.stack(out_v).numpy(), torch.stack(out_j).numpy()


class TestLBS:
    def setup_method(self):
        self.assets = S.create_test_assets(num_vertices=512)

    def test_rest_pose_matches_template_shape(self):
        B = 2
        betas = np.zeros((B, 10), np.float32)
        rotmats = np.tile(np.eye(3, dtype=np.float32), (B, 24, 1, 1))
        verts, joints, _ = S.lbs(self.assets, jnp.asarray(betas),
                                 jnp.asarray(rotmats))
        np.testing.assert_allclose(
            np.asarray(verts[0]), np.asarray(self.assets.v_template),
            atol=1e-5)

    def test_matches_naive_torch(self, rng):
        B = 4
        betas = rng.randn(B, 10).astype(np.float32)
        aa = rng.randn(B, 24, 3).astype(np.float32) * 0.3
        rotmats = np.asarray(rodrigues(jnp.asarray(aa)))
        verts, joints, _ = S.lbs(self.assets, jnp.asarray(betas),
                                 jnp.asarray(rotmats))
        ref_v, ref_j = reference_lbs_torch(self.assets, betas, rotmats)
        np.testing.assert_allclose(np.asarray(verts), ref_v, atol=2e-5)
        np.testing.assert_allclose(np.asarray(joints), ref_j, atol=2e-5)

    def test_shape_blendshape_direction(self):
        betas0 = np.zeros((1, 10), np.float32)
        betas1 = np.zeros((1, 10), np.float32)
        betas1[0, 0] = 2.0
        rot = np.tile(np.eye(3, dtype=np.float32), (1, 24, 1, 1))
        v0, _, _ = S.lbs(self.assets, jnp.asarray(betas0), jnp.asarray(rot))
        v1, _, _ = S.lbs(self.assets, jnp.asarray(betas1), jnp.asarray(rot))
        delta = np.asarray(v1 - v0).reshape(-1)
        expected = 2.0 * np.asarray(self.assets.shapedirs)[0]
        np.testing.assert_allclose(delta, expected, atol=1e-5)

    def test_global_orient_rotates_everything(self, rng):
        betas = np.zeros((1, 10), np.float32)
        rot = np.tile(np.eye(3, dtype=np.float32), (1, 24, 1, 1))
        aa_root = np.array([[0.0, 0.0, np.pi / 2]], np.float32)
        R_root = np.asarray(rodrigues(jnp.asarray(aa_root)))[0]
        rot_rooted = rot.copy()
        rot_rooted[0, 0] = R_root
        v0, j0, _ = S.lbs(self.assets, jnp.asarray(betas), jnp.asarray(rot))
        v1, j1, _ = S.lbs(self.assets, jnp.asarray(betas),
                          jnp.asarray(rot_rooted))
        # The root joint is the rotation pivot.
        pivot = np.asarray(j0)[0, 0]
        expected = (np.asarray(v0)[0] - pivot) @ R_root.T + pivot
        np.testing.assert_allclose(np.asarray(v1)[0], expected, atol=1e-4)


class TestSMPLForward:
    def setup_method(self):
        self.assets = S.create_test_assets(num_vertices=512)

    def test_joint_sets(self, rng):
        B = 3
        betas = rng.randn(B, 10).astype(np.float32) * 0.5
        body_pose = rng.randn(B, 23, 3).astype(np.float32) * 0.2
        glob = rng.randn(B, 1, 3).astype(np.float32) * 0.2
        out_native = S.smpl_forward(self.assets, jnp.asarray(betas),
                                    jnp.asarray(body_pose), jnp.asarray(glob),
                                    joint_set='native')
        assert out_native.joints.shape == (B, 24, 3)
        out54 = S.smpl_forward(self.assets, jnp.asarray(betas),
                               jnp.asarray(body_pose), jnp.asarray(glob),
                               joint_set='smpl54')
        assert out54.joints.shape == (B, 54, 3)
        out49 = S.smpl_forward(self.assets, jnp.asarray(betas),
                               jnp.asarray(body_pose), jnp.asarray(glob),
                               joint_set='spin49')
        assert out49.joints.shape == (B, 49, 3)
        # 49-joint set selects from the 54: OP MidHip (idx 8) = smpl joint 0.
        np.testing.assert_allclose(np.asarray(out49.joints[:, 8]),
                                   np.asarray(out54.joints[:, 0]))

    def test_rotmat_input_path(self, rng):
        B = 2
        betas = rng.randn(B, 10).astype(np.float32) * 0.5
        aa_body = rng.randn(B, 23, 3).astype(np.float32) * 0.2
        aa_glob = rng.randn(B, 1, 3).astype(np.float32) * 0.2
        out_aa = S.smpl_forward(self.assets, jnp.asarray(betas),
                                jnp.asarray(aa_body), jnp.asarray(aa_glob))
        R_body = rodrigues(jnp.asarray(aa_body))
        R_glob = rodrigues(jnp.asarray(aa_glob))
        out_rm = S.smpl_forward(self.assets, jnp.asarray(betas), R_body,
                                R_glob, pose2rot=False)
        np.testing.assert_allclose(np.asarray(out_aa.vertices),
                                   np.asarray(out_rm.vertices), atol=1e-5)

    def test_transl(self, rng):
        B = 2
        betas = np.zeros((B, 10), np.float32)
        pose = np.zeros((B, 23, 3), np.float32)
        glob = np.zeros((B, 1, 3), np.float32)
        t = rng.randn(B, 3).astype(np.float32)
        out0 = S.smpl_forward(self.assets, jnp.asarray(betas),
                              jnp.asarray(pose), jnp.asarray(glob))
        out1 = S.smpl_forward(self.assets, jnp.asarray(betas),
                              jnp.asarray(pose), jnp.asarray(glob),
                              transl=jnp.asarray(t))
        np.testing.assert_allclose(
            np.asarray(out1.vertices), np.asarray(out0.vertices) + t[:, None],
            atol=1e-6)

    def test_h36m_regression(self, rng):
        B = 2
        betas = rng.randn(B, 10).astype(np.float32) * 0.5
        pose = np.zeros((B, 23, 3), np.float32)
        glob = np.zeros((B, 1, 3), np.float32)
        out = S.smpl_forward(self.assets, jnp.asarray(betas),
                             jnp.asarray(pose), jnp.asarray(glob))
        j14 = S.regress_h36m_joints(self.assets, out.vertices)
        assert j14.shape == (B, 14, 3)
        j17 = S.regress_h36m_joints(self.assets, out.vertices, subset='j17')
        assert j17.shape == (B, 17, 3)

    def test_jit_and_grad(self, rng):
        import jax
        B = 2
        betas = jnp.asarray(rng.randn(B, 10).astype(np.float32) * 0.5)
        pose = jnp.asarray(rng.randn(B, 23, 3).astype(np.float32) * 0.1)
        glob = jnp.zeros((B, 1, 3))

        @jax.jit
        def loss_fn(betas):
            out = S.smpl_forward(self.assets, betas, pose, glob)
            return jnp.sum(out.vertices ** 2)

        g = jax.grad(loss_fn)(betas)
        assert np.isfinite(np.asarray(g)).all()
