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


# ---------------------------------------------------------------------------
# Real asset loading (chumpy-format .pkl / .npz / directory resolution)
# ---------------------------------------------------------------------------
#
# The released SMPL files are licensed and absent from this sandbox, so the
# loader path every real deployment hits first (core/smpl.py
# load_smpl_assets; reference asset contract spec/config.py:35-38 +
# prepare_data.sh) is exercised against a synthetic pickle that reproduces
# the real file's OBJECT GRAPH: chumpy.ch.Ch wrappers around the dense
# arrays, a scipy.sparse csc J_regressor, uint32 kintree_table with the
# 4294967295 root sentinel, and >10 shape betas to truncate.


def make_raw_smpl_arrays(seed=0, num_vertices=512, num_betas=12):
    """Raw numpy arrays in the REAL pkl's layouts (pre-flattening)."""
    rng = np.random.RandomState(seed)
    V, J = num_vertices, 24
    return {
        'v_template': rng.randn(V, 3).astype(np.float64) * 0.3,
        'shapedirs': rng.randn(V, 3, num_betas).astype(np.float64) * 0.01,
        'posedirs': rng.randn(V, 3, (J - 1) * 9).astype(np.float64) * 0.001,
        'J_regressor': np.abs(rng.rand(J, V)).astype(np.float64)
        / (V / 24.0),
        'weights': (rng.rand(V, J).astype(np.float64) ** 4),
        'kintree_table': np.stack([
            np.asarray(C.SMPL_PARENTS, np.int64), np.arange(J)]
        ).astype(np.uint32),   # real files: uint32, parents[0]=4294967295
        'f': rng.randint(0, V, size=(V * 2, 3)).astype(np.uint32),
    }


def write_synthetic_smpl_pkl(path, raw=None, seed=0, num_vertices=512):
    """Write a chumpy-format SMPL .pkl WITHOUT chumpy installed.

    A throwaway ``chumpy.ch.Ch`` class is registered in sys.modules just
    long enough to pickle, so the file's GLOBAL records point at the real
    chumpy module path — exactly what the released SMPL_*.pkl files
    contain and what the _ChumpyTolerantUnpickler must map to its stub.
    """
    import pickle
    import sys
    import types

    import scipy.sparse

    raw = raw if raw is not None else make_raw_smpl_arrays(
        seed=seed, num_vertices=num_vertices)
    w = raw['weights'] / raw['weights'].sum(axis=1, keepdims=True)
    jr = raw['J_regressor'] / raw['J_regressor'].sum(axis=1, keepdims=True)

    ch_mod = types.ModuleType('chumpy')
    ch_sub = types.ModuleType('chumpy.ch')

    class Ch:  # noqa: D401 — minimal stand-in for chumpy.Ch
        def __init__(self, x):
            self.x = x

    Ch.__module__ = 'chumpy.ch'
    Ch.__qualname__ = 'Ch'
    ch_sub.Ch = Ch
    ch_mod.ch = ch_sub
    ch_mod.Ch = Ch
    sys.modules['chumpy'] = ch_mod
    sys.modules['chumpy.ch'] = ch_sub
    try:
        data = {
            'v_template': Ch(raw['v_template']),
            'shapedirs': Ch(raw['shapedirs']),
            'posedirs': raw['posedirs'],
            'J_regressor': scipy.sparse.csc_matrix(jr),
            'weights': Ch(w),
            'kintree_table': raw['kintree_table'],
            'f': raw['f'],
            'bs_style': 'lbs',
        }
        with open(path, 'wb') as f:
            pickle.dump(data, f, protocol=2)
    finally:
        del sys.modules['chumpy'], sys.modules['chumpy.ch']
    raw_norm = dict(raw, weights=w, J_regressor=jr)
    return raw_norm


class TestAssetLoading:
    def test_chumpy_pkl_roundtrip(self, tmp_path):
        raw = write_synthetic_smpl_pkl(tmp_path / 'SMPL_NEUTRAL.pkl')
        assets = S.load_smpl_assets(str(tmp_path / 'SMPL_NEUTRAL.pkl'))
        V = raw['v_template'].shape[0]
        np.testing.assert_allclose(np.asarray(assets.v_template),
                                   raw['v_template'], atol=1e-6)
        # 12 betas in the file -> truncated to NUM_BETAS, flattened (B, V*3).
        expect_sd = raw['shapedirs'][:, :, :C.NUM_BETAS].reshape(V * 3, -1).T
        np.testing.assert_allclose(np.asarray(assets.shapedirs), expect_sd,
                                   atol=1e-6)
        expect_pd = raw['posedirs'].reshape(V * 3, -1).T
        np.testing.assert_allclose(np.asarray(assets.posedirs), expect_pd,
                                   atol=1e-6)
        # sparse csc J_regressor densified
        np.testing.assert_allclose(np.asarray(assets.j_regressor),
                                   raw['J_regressor'], atol=1e-6)
        np.testing.assert_allclose(np.asarray(assets.lbs_weights),
                                   raw['weights'], atol=1e-6)
        assert assets.parents == tuple(int(p) for p in C.SMPL_PARENTS)
        assert assets.faces.shape == raw['f'].shape

        # Loaded assets drive the forward against the independent torch LBS.
        rng = np.random.RandomState(3)
        betas = rng.randn(2, 10).astype(np.float32) * 0.5
        aa = rng.randn(2, 24, 3).astype(np.float32) * 0.2
        rotmats = np.asarray(rodrigues(jnp.asarray(aa)))
        verts, joints, _ = S.lbs(assets, jnp.asarray(betas),
                                 jnp.asarray(rotmats))
        ref_v, ref_j = reference_lbs_torch(assets, betas, rotmats)
        np.testing.assert_allclose(np.asarray(verts), ref_v, atol=2e-5)
        np.testing.assert_allclose(np.asarray(joints), ref_j, atol=2e-5)

    def test_uint32_root_sentinel(self, tmp_path):
        """Real files store parents[0] = 4294967295 (uint32 -1); the loader
        must produce parents[0] == -1 regardless."""
        raw = make_raw_smpl_arrays(num_vertices=64)
        raw['kintree_table'] = raw['kintree_table'].copy()
        raw['kintree_table'][0, 0] = np.uint32(4294967295)
        write_synthetic_smpl_pkl(tmp_path / 'SMPL_NEUTRAL.pkl', raw=raw)
        assets = S.load_smpl_assets(str(tmp_path / 'SMPL_NEUTRAL.pkl'))
        assert assets.parents[0] == -1

    def test_directory_gender_resolution(self, tmp_path):
        write_synthetic_smpl_pkl(tmp_path / 'SMPL_NEUTRAL.pkl', seed=0,
                                 num_vertices=64)
        raw_m = write_synthetic_smpl_pkl(tmp_path / 'SMPL_MALE.pkl', seed=7,
                                         num_vertices=64)
        a_m = S.load_smpl_assets(str(tmp_path), gender='male')
        a_n = S.load_smpl_assets(str(tmp_path), gender='neutral')
        np.testing.assert_allclose(np.asarray(a_m.v_template),
                                   raw_m['v_template'], atol=1e-6)
        assert not np.allclose(np.asarray(a_n.v_template),
                               np.asarray(a_m.v_template))

    def test_directory_npz_fallback(self, tmp_path):
        """gender with no .pkl falls back to SMPL_{G}.npz."""
        raw = make_raw_smpl_arrays(num_vertices=64)
        w = raw['weights'] / raw['weights'].sum(axis=1, keepdims=True)
        jr = raw['J_regressor'] / raw['J_regressor'].sum(
            axis=1, keepdims=True)
        np.savez(tmp_path / 'SMPL_FEMALE.npz',
                 v_template=raw['v_template'], shapedirs=raw['shapedirs'],
                 posedirs=raw['posedirs'], J_regressor=jr, weights=w,
                 kintree_table=raw['kintree_table'], f=raw['f'])
        assets = S.load_smpl_assets(str(tmp_path), gender='female')
        np.testing.assert_allclose(np.asarray(assets.v_template),
                                   raw['v_template'], atol=1e-6)

    def test_load_assets_or_test_registry(self, tmp_path, monkeypatch,
                                          capsys):
        """load_assets_or_test: registry dir + extra regressors -> real
        load with the spin49 path live; empty registry -> synthetic
        fallback with a warning (the serving/demo first-run path)."""
        monkeypatch.setenv('SPEC_DATA_ROOT', str(tmp_path))
        assets = S.load_assets_or_test(tag='t')
        assert assets.num_vertices == C.NUM_SMPL_VERTICES  # synthetic
        assert 'WARNING' in capsys.readouterr().out

        smpl_dir = tmp_path / 'body_models' / 'smpl'
        smpl_dir.mkdir(parents=True)
        V = 512
        write_synthetic_smpl_pkl(smpl_dir / 'SMPL_NEUTRAL.pkl',
                                 num_vertices=V)
        rng = np.random.RandomState(1)
        jre = rng.rand(9, V).astype(np.float32)
        np.save(tmp_path / 'J_regressor_extra.npy',
                jre / jre.sum(1, keepdims=True))
        jrh = rng.rand(17, V).astype(np.float32)
        np.save(tmp_path / 'J_regressor_h36m.npy',
                jrh / jrh.sum(1, keepdims=True))
        assets = S.load_assets_or_test(tag='t')
        assert assets.num_vertices == V
        assert assets.j_regressor_extra is not None
        out = S.smpl_forward(
            assets, jnp.zeros((1, 10)), jnp.zeros((1, 23, 3)),
            jnp.zeros((1, 1, 3)), joint_set='spin49')
        assert out.joints.shape == (1, 49, 3)
