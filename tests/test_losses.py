"""Loss tests: masked-JAX implementations vs independent torch constructions
of the same semantics (boolean indexing, torch reductions)."""

import numpy as np
import torch
import jax.numpy as jnp

from spec_tpu import losses as L
from spec_tpu.core.geometry import rodrigues


def _torch_smpl_param_loss(pred_rotmat, pred_betas, gt_pose, gt_betas,
                           has_smpl, pose_conf):
    """Torch replication of the reference semantics: scalar MSE over valid
    rows, multiplied by mean valid confidence."""
    valid = has_smpl.bool()
    gt_rotmat = torch.from_numpy(
        np.asarray(rodrigues(jnp.asarray(gt_pose.numpy().reshape(-1, 24, 3)))))
    pr = pred_rotmat[valid]
    gr = gt_rotmat[valid]
    conf = pose_conf[valid].unsqueeze(-1).unsqueeze(-1)
    if pr.shape[0] > 0:
        loss_pose = (conf * torch.nn.functional.mse_loss(pr, gr)).mean()
        loss_betas = torch.nn.functional.mse_loss(
            pred_betas[valid], gt_betas[valid]).mean()
    else:
        loss_pose = torch.zeros(())
        loss_betas = torch.zeros(())
    return loss_pose, loss_betas


def test_smpl_param_loss_matches_torch(rng):
    B = 8
    pred_rotmat = np.asarray(
        rodrigues(jnp.asarray(rng.randn(B, 24, 3).astype('f4') * 0.3)))
    pred_betas = rng.randn(B, 10).astype('f4')
    gt_pose = rng.randn(B, 72).astype('f4') * 0.3
    gt_betas = rng.randn(B, 10).astype('f4')
    has_smpl = (rng.rand(B) > 0.4).astype('f4')
    pose_conf = rng.rand(B, 24).astype('f4')

    lp, lb = L.smpl_param_loss(
        jnp.asarray(pred_rotmat), jnp.asarray(pred_betas),
        jnp.asarray(gt_pose), jnp.asarray(gt_betas),
        jnp.asarray(has_smpl), jnp.asarray(pose_conf))
    tlp, tlb = _torch_smpl_param_loss(
        torch.from_numpy(pred_rotmat), torch.from_numpy(pred_betas),
        torch.from_numpy(gt_pose), torch.from_numpy(gt_betas),
        torch.from_numpy(has_smpl), torch.from_numpy(pose_conf))
    np.testing.assert_allclose(float(lp), float(tlp), rtol=1e-5)
    np.testing.assert_allclose(float(lb), float(tlb), rtol=1e-5)


def test_smpl_param_loss_no_valid_rows(rng):
    B = 4
    lp, lb = L.smpl_param_loss(
        jnp.asarray(np.tile(np.eye(3, dtype='f4'), (B, 24, 1, 1))),
        jnp.zeros((B, 10)), jnp.zeros((B, 72)), jnp.zeros((B, 10)),
        jnp.zeros((B,)), jnp.ones((B, 24)))
    assert float(lp) == 0.0 and float(lb) == 0.0


def test_keypoint_3d_loss_matches_torch(rng):
    B = 6
    pred = rng.randn(B, 49, 3).astype('f4')
    gt = rng.randn(B, 24, 4).astype('f4')
    gt[..., 3] = rng.rand(B, 24)
    has = (rng.rand(B) > 0.3).astype('f4')

    out = float(L.keypoint_3d_loss(
        jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(has)))

    # torch replication
    p = torch.from_numpy(pred)[:, 25:, :]
    conf = torch.from_numpy(gt)[:, :, -1:].clone()
    g = torch.from_numpy(gt)[:, :, :-1].clone()
    m = torch.from_numpy(has) == 1
    g, conf, p = g[m], conf[m], p[m]
    if len(g) > 0:
        gp = (g[:, 2] + g[:, 3]) / 2
        pp = (p[:, 2] + p[:, 3]) / 2
        ref = (conf * torch.nn.functional.mse_loss(
            p - pp[:, None], g - gp[:, None], reduction='none')).mean()
    else:
        ref = torch.zeros(())
    np.testing.assert_allclose(out, float(ref), rtol=1e-5)


def test_shape_loss_matches_torch(rng):
    B, V = 5, 100
    pred = rng.randn(B, V, 3).astype('f4')
    gt = rng.randn(B, V, 3).astype('f4')
    has = np.array([1, 0, 1, 1, 0], 'f4')
    out = float(L.shape_loss(jnp.asarray(pred), jnp.asarray(gt),
                             jnp.asarray(has)))
    m = torch.from_numpy(has) == 1
    ref = torch.nn.functional.l1_loss(
        torch.from_numpy(pred)[m], torch.from_numpy(gt)[m])
    np.testing.assert_allclose(out, float(ref), rtol=1e-5)


def test_hmr_cam_loss_full(rng):
    """End-to-end loss structure: finite, returns all keys, total = sum*60."""
    B, V = 4, 128
    pred = {
        'pred_cam': jnp.asarray(
            rng.rand(B, 3).astype('f4') * 0.5 + 0.5),
        'pred_shape': jnp.asarray(rng.randn(B, 10).astype('f4')),
        'pred_pose': jnp.asarray(np.asarray(rodrigues(
            jnp.asarray(rng.randn(B, 24, 3).astype('f4') * 0.2)))),
        'smpl_joints3d': jnp.asarray(rng.randn(B, 49, 3).astype('f4')),
        'smpl_vertices': jnp.asarray(rng.randn(B, V, 3).astype('f4')),
        'smpl_joints2d': jnp.asarray(
            rng.rand(B, 49, 2).astype('f4') * 1000),
    }
    gt = {
        'pose': jnp.asarray(rng.randn(B, 72).astype('f4') * 0.2),
        'pose_conf': jnp.asarray(np.ones((B, 24), 'f4')),
        'betas': jnp.asarray(rng.randn(B, 10).astype('f4')),
        'pose_3d': jnp.asarray(rng.randn(B, 24, 4).astype('f4')),
        'vertices': jnp.asarray(rng.randn(B, V, 3).astype('f4')),
        'keypoints_orig': jnp.asarray(
            np.concatenate([rng.rand(B, 49, 2) * 1000,
                            np.ones((B, 49, 1))], -1).astype('f4')),
        'has_smpl': jnp.ones((B,)),
        'has_pose_3d': jnp.ones((B,)),
        'orig_shape': jnp.asarray(
            np.tile(np.array([[1080., 1920.]], 'f4'), (B, 1))),
        'scale': jnp.asarray(rng.rand(B).astype('f4') + 1.0),
    }
    total, d = L.hmr_cam_loss(pred, gt)
    assert np.isfinite(float(total))
    parts = sum(v for k, v in d.items() if k != 'loss/total_loss')
    np.testing.assert_allclose(float(total), float(parts) * 60.0, rtol=1e-6)


def test_camcalib_losses(rng):
    logits = rng.randn(8, 256).astype('f4')
    bins = rng.randint(0, 256, 8)
    ce = float(L.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(bins)))
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(bins))
    np.testing.assert_allclose(ce, float(ref), rtol=1e-5)
    # kl(one-hot) == ce
    kl = float(L.kl_one_hot_loss(jnp.asarray(logits), jnp.asarray(bins)))
    np.testing.assert_allclose(kl, ce)

    soft_t = rng.rand(8).astype('f4') * 2 - 1
    l2 = float(L.softargmax_l2_loss(jnp.asarray(logits), jnp.asarray(soft_t)))
    assert np.isfinite(l2)
    bl2 = float(L.softargmax_biased_l2_loss(
        jnp.asarray(logits), jnp.asarray(soft_t)))
    assert bl2 <= l2 + 1e-6  # biased variant only shrinks under-predictions

    total, d = L.camera_regressor_loss(
        jnp.asarray(logits), jnp.asarray(logits), jnp.asarray(logits),
        jnp.asarray(soft_t), jnp.asarray(soft_t), jnp.asarray(soft_t),
        loss_type='softargmax_biased_l2')
    np.testing.assert_allclose(
        float(total),
        float(d['vfov_loss'] + d['pitch_loss'] + d['roll_loss']), rtol=1e-6)


def test_joints_mse_loss_torch_parity(rng):
    """aux.joints_mse_loss vs the torch JointsMSELoss recipe (per-joint
    0.5*MSE of weighted heatmaps, averaged over joints)."""
    pred = rng.randn(4, 6, 16, 16).astype('f4')
    gt = rng.randn(4, 6, 16, 16).astype('f4')
    w = (rng.rand(4, 6) > 0.3).astype('f4')

    tp, tg = torch.from_numpy(pred), torch.from_numpy(gt)
    tw = torch.from_numpy(w)[..., None]
    crit = torch.nn.MSELoss()
    ref = 0.0
    for j in range(6):
        ref = ref + 0.5 * crit(tp[:, j].reshape(4, -1) * tw[:, j],
                               tg[:, j].reshape(4, -1) * tw[:, j])
    ref = float(ref) / 6

    got = float(L.joints_mse_loss(
        jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(w)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    # Unweighted path
    got_nw = float(L.joints_mse_loss(jnp.asarray(pred), jnp.asarray(gt)))
    ref_nw = float(0.5 * torch.nn.functional.mse_loss(tp, tg))
    np.testing.assert_allclose(got_nw, ref_nw, rtol=1e-5)


def test_pixelwise_cross_entropy_torch_parity(rng):
    logits = rng.randn(3, 5, 8, 8).astype('f4')
    target = rng.randint(0, 5, (3, 8, 8))
    target[0, :2, :2] = -1  # void pixels
    cw = rng.rand(5).astype('f4') + 0.5

    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(target),
        ignore_index=-1)
    got = float(L.pixelwise_cross_entropy(
        jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(got, float(ref), rtol=1e-5)

    ref_w = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(target),
        weight=torch.from_numpy(cw), ignore_index=-1)
    got_w = float(L.pixelwise_cross_entropy(
        jnp.asarray(logits), jnp.asarray(target),
        class_weights=jnp.asarray(cw)))
    np.testing.assert_allclose(got_w, float(ref_w), rtol=1e-5)
