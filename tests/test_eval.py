"""Eval metric tests: batched on-device Procrustes vs an independent
per-sample numpy implementation, protocol selectors, and the offline
compute_error pass on synthetic self-consistent data."""

import numpy as np
import jax.numpy as jnp

from spec_tpu.core import smpl as S
from spec_tpu.core.geometry import rodrigues
from spec_tpu.eval import (
    compute_error,
    eval_joints_24,
    eval_mesh_j14,
    mpjpe,
    pa_mpjpe,
    v2v_error,
)


def numpy_procrustes(S1, S2):
    """Independent per-sample similarity alignment (classical formulation)."""
    out = np.zeros_like(S1)
    for i in range(S1.shape[0]):
        X1 = S1[i].T.astype(np.float64)
        X2 = S2[i].T.astype(np.float64)
        mu1 = X1.mean(1, keepdims=True)
        mu2 = X2.mean(1, keepdims=True)
        X1c, X2c = X1 - mu1, X2 - mu2
        var1 = (X1c ** 2).sum()
        K = X1c @ X2c.T
        U, s, Vh = np.linalg.svd(K)
        V = Vh.T
        Z = np.eye(3)
        Z[-1, -1] *= np.sign(np.linalg.det(V @ U.T))
        R = V @ Z @ U.T
        scale = np.trace(R @ K) / var1
        t = mu2 - scale * (R @ mu1)
        out[i] = (scale * (R @ X1) + t).T
    return out


def test_pa_mpjpe_matches_numpy(rng):
    pred = rng.randn(16, 14, 3).astype('f4')
    gt = rng.randn(16, 14, 3).astype('f4')
    pa, pa_pj = pa_mpjpe(jnp.asarray(pred), jnp.asarray(gt))

    aligned = numpy_procrustes(pred, gt)
    ref_pj = np.sqrt(((aligned - gt) ** 2).sum(-1))
    np.testing.assert_allclose(np.asarray(pa_pj), ref_pj, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pa), ref_pj.mean(-1), atol=1e-4)


def test_pa_mpjpe_invariant_to_similarity(rng):
    """PA error of a rotated+scaled+shifted copy must be ~0."""
    gt = rng.randn(8, 24, 3).astype('f4')
    aa = rng.randn(8, 3).astype('f4')
    R = np.asarray(rodrigues(jnp.asarray(aa)))
    s = (rng.rand(8, 1, 1) * 2 + 0.5).astype('f4')
    t = rng.randn(8, 1, 3).astype('f4')
    pred = s * np.einsum('bij,bnj->bni', R, gt) + t
    pa, _ = pa_mpjpe(jnp.asarray(pred), jnp.asarray(gt))
    assert float(np.abs(np.asarray(pa)).max()) < 1e-4


def test_mpjpe_and_v2v(rng):
    gt = rng.randn(4, 14, 3).astype('f4')
    offset = np.zeros_like(gt)
    offset[..., 0] = 0.05
    err = np.asarray(mpjpe(jnp.asarray(gt + offset), jnp.asarray(gt)))
    np.testing.assert_allclose(err, 0.05, rtol=1e-5)
    v = np.asarray(v2v_error(jnp.asarray(gt + offset), jnp.asarray(gt)))
    np.testing.assert_allclose(v, 0.05, rtol=1e-5)


def test_eval_mesh_j14_structure(rng):
    V = 200
    pred_v = rng.randn(4, V, 3).astype('f4')
    gt_v = rng.randn(4, V, 3).astype('f4')
    jreg = rng.rand(17, V).astype('f4')
    jreg /= jreg.sum(1, keepdims=True)
    out = eval_mesh_j14(jnp.asarray(pred_v), jnp.asarray(gt_v),
                        jnp.asarray(jreg))
    assert out['mpjpe'].shape == (4,)
    assert out['per_joint_mpjpe'].shape == (4, 14)
    assert out['v2v'].shape == (4,)
    # identical meshes -> zero error
    out0 = eval_mesh_j14(jnp.asarray(gt_v), jnp.asarray(gt_v),
                         jnp.asarray(jreg))
    assert float(np.asarray(out0['mpjpe']).max()) < 1e-6


def test_compute_error_self_consistent(rng):
    """Feed predictions equal to the GT world mesh: W- metrics must be ~0;
    cam-frame metrics ~0 too when pred rotmat equals the GT rotation that
    relates the frames."""
    N, V = 10, 256
    assets = S.create_test_assets(num_vertices=V)
    gt_pose = (rng.randn(N, 72) * 0.2).astype('f4')
    gt_betas = (rng.randn(N, 10) * 0.3).astype('f4')

    out = S.smpl_forward(
        assets, jnp.asarray(gt_betas),
        jnp.asarray(gt_pose[:, 3:].reshape(-1, 23, 3)),
        jnp.asarray(gt_pose[:, :3].reshape(-1, 1, 3)), joint_set='native')
    pred_vertices = np.asarray(out.vertices)

    jreg = rng.rand(17, V).astype('f4')
    jreg /= jreg.sum(1, keepdims=True)

    # spec-syn protocol (j24, GT cam rotmat)
    aa = (rng.randn(N, 3) * 0.2).astype('f4')
    cam_R = np.asarray(rodrigues(jnp.asarray(aa)))
    res = compute_error(
        'spec-syn', pred_vertices,
        pred_cam_rotmat=np.tile(np.eye(3, dtype='f4'), (N, 1, 1)),
        gt_pose=gt_pose, gt_betas=gt_betas, assets=assets,
        j_regressor_h36m=jreg, gt_cam_rotmat=cam_R, chunk=4)
    assert res['protocol'] == 'j24'
    # The j24 protocol compares kinematic GT joints vs regressor-applied
    # predicted joints (reference compute_error.py:157-187) — identical for
    # real SMPL assets, but synthetically different here. Check the metric
    # equals that intrinsic gap instead of zero.
    pred_j24 = np.einsum('jv,bvc->bjc', np.asarray(assets.j_regressor),
                         pred_vertices)
    gt_j24 = np.asarray(out.joints_native)
    from spec_tpu.eval import eval_joints_24 as _ej24
    gap = float(np.asarray(_ej24(
        jnp.asarray(pred_j24), jnp.asarray(gt_j24))['mpjpe']).mean() * 1000)
    np.testing.assert_allclose(res['W-MPJPE'], gap, rtol=1e-3)
    np.testing.assert_allclose(res['MPJPE'], gap, rtol=1e-3)
    assert res['W-PVE'] < 1e-2  # the mesh itself is exact

    # 3dpw protocol: pose_cam equal to pose, pred rotmat identity -> ~0
    res2 = compute_error(
        '3dpw-test-cam', pred_vertices,
        pred_cam_rotmat=np.tile(np.eye(3, dtype='f4'), (N, 1, 1)),
        gt_pose=gt_pose, gt_betas=gt_betas, assets=assets,
        j_regressor_h36m=jreg, gt_pose_cam=gt_pose, chunk=8)
    assert res2['protocol'] == 'j14'
    assert res2['W-MPJPE'] < 1e-2 and res2['MPJPE'] < 1e-2

    # Perturbed prediction -> nonzero error
    res3 = compute_error(
        '3dpw-test-cam', pred_vertices + 0.05,
        pred_cam_rotmat=np.tile(np.eye(3, dtype='f4'), (N, 1, 1)),
        gt_pose=gt_pose, gt_betas=gt_betas, assets=assets,
        j_regressor_h36m=jreg, gt_pose_cam=gt_pose, chunk=8)
    # uniform offset cancels after pelvis centering; perturb per-vertex
    noise = (rng.randn(N, V, 3) * 0.02).astype('f4')
    res4 = compute_error(
        '3dpw-test-cam', pred_vertices + noise,
        pred_cam_rotmat=np.tile(np.eye(3, dtype='f4'), (N, 1, 1)),
        gt_pose=gt_pose, gt_betas=gt_betas, assets=assets,
        j_regressor_h36m=jreg, gt_pose_cam=gt_pose, chunk=8)
    assert res4['W-MPJPE'] > 1.0  # mm


def test_eval_joints_24(rng):
    gt = rng.randn(4, 24, 3).astype('f4')
    out = eval_joints_24(jnp.asarray(gt + 0.01), jnp.asarray(gt))
    assert out['mpjpe'].shape == (4,)
    # translation-only offset vanishes after pelvis centering
    assert float(np.asarray(out['mpjpe']).max()) < 1e-6
