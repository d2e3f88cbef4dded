"""In-graph SMPLify fitting (train/smplify.py)."""

import numpy as np
import jax.numpy as jnp

from spec_tpu.core import smpl as S
from spec_tpu.train.smplify import (
    SMPLifyResult,
    apply_smplify_update,
    angle_prior,
    gmof,
    smplify_fit,
)


def _project_np(joints, cam_t, R, K):
    pts = joints @ R.T + cam_t
    proj = pts @ K.T
    return proj[:, :2] / proj[:, 2:3]


def test_gmof_and_angle_prior():
    x = jnp.asarray([0.0, 1.0, 1e6])
    g = np.asarray(gmof(x, rho=100.0))
    assert g[0] == 0.0
    assert g[1] < 1.0 + 1e-6
    np.testing.assert_allclose(g[2], 100.0 ** 2, rtol=1e-3)  # saturates
    ap = angle_prior(jnp.zeros((2, 23, 3)))
    assert ap.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(ap), 1.0)  # exp(0)^2

    # SPIN sign convention: valid bending is cheap, hyper-extension is
    # expensive. Knees: positive x-rotation = bend. L-elbow: negative
    # y-rotation = bend; R-elbow: positive y-rotation = bend.
    def cost(j, c, val):
        p = jnp.zeros((1, 23, 3)).at[0, j - 1, c].set(val)
        return float(angle_prior(p).sum())

    assert cost(4, 0, -1.0) > cost(4, 0, 1.0)     # L knee
    assert cost(5, 0, -1.0) > cost(5, 0, 1.0)     # R knee
    assert cost(18, 1, 1.0) > cost(18, 1, -1.0)   # L elbow: +y is hyper
    assert cost(19, 1, -1.0) > cost(19, 1, 1.0)   # R elbow: -y is hyper


def test_smplify_recovers_perturbed_pose(rng):
    """Synthetic fitting problem: project GT joints to 2D, start from a
    perturbed init, and check the optimizer drives reprojection error
    way down and moves the mesh toward GT."""
    B, V = 4, 256
    assets = S.create_test_assets(num_vertices=V)
    gt_go = rng.randn(B, 1, 3).astype('f4') * 0.2
    gt_bp = rng.randn(B, 23, 3).astype('f4') * 0.2
    gt_betas = rng.randn(B, 10).astype('f4') * 0.5
    gt_t = np.tile(np.array([[0.0, 0.0, 5.0]], 'f4'), (B, 1))
    R = np.tile(np.eye(3, dtype='f4'), (B, 1, 1))
    K = np.tile(np.array([[1000.0, 0, 500], [0, 1000.0, 500],
                          [0, 0, 1]], 'f4'), (B, 1, 1))

    gt_out = S.smpl_forward(assets, jnp.asarray(gt_betas),
                            jnp.asarray(gt_bp), jnp.asarray(gt_go),
                            pose2rot=True, joint_set='spin49')
    kp = np.stack([
        np.concatenate([_project_np(np.asarray(gt_out.joints)[b],
                                    gt_t[b], R[b], K[b]),
                        np.ones((49, 1), 'f4')], -1)
        for b in range(B)])

    init_bp = gt_bp + rng.randn(*gt_bp.shape).astype('f4') * 0.15
    init_go = gt_go + rng.randn(*gt_go.shape).astype('f4') * 0.1
    init_t = gt_t + rng.randn(B, 3).astype('f4') * 0.2

    res = smplify_fit(
        assets, jnp.asarray(init_go), jnp.asarray(init_bp),
        jnp.zeros((B, 10)), jnp.asarray(init_t), jnp.asarray(kp),
        jnp.asarray(R), jnp.asarray(K), num_iters=150, lr=2e-2,
        pose_prior_weight=1.0, shape_prior_weight=1.0,
        angle_prior_weight=0.0)
    assert isinstance(res, SMPLifyResult)

    # initial reprojection loss for comparison
    init_out = S.smpl_forward(assets, jnp.zeros((B, 10)),
                              jnp.asarray(init_bp), jnp.asarray(init_go),
                              pose2rot=True, joint_set='spin49')
    init_err = np.stack([
        np.linalg.norm(_project_np(np.asarray(init_out.joints)[b],
                                   init_t[b], R[b], K[b]) - kp[b, :, :2],
                       axis=-1).mean() for b in range(B)])
    fit_joints = np.asarray(S.smpl_forward(
        assets, res.betas, res.body_pose, res.global_orient,
        pose2rot=True, joint_set='spin49').joints)
    fit_err = np.stack([
        np.linalg.norm(_project_np(fit_joints[b],
                                   np.asarray(res.cam_t)[b], R[b], K[b])
                       - kp[b, :, :2], axis=-1).mean() for b in range(B)])
    assert (fit_err < init_err * 0.35).all(), (init_err, fit_err)
    assert np.isfinite(np.asarray(res.reproj_loss)).all()


def test_apply_smplify_update():
    B = 4
    kp_conf = np.ones((B, 49, 1), 'f4')
    kp_conf[3] = 0.0  # sample 3: no visible keypoints at all
    batch = {
        'pose': np.zeros((B, 72), 'f4'),
        'betas': np.zeros((B, 10), 'f4'),
        'has_smpl': np.array([0.0, 1.0, 0.0, 0.0], 'f4'),
        'keypoints_orig': np.concatenate(
            [np.zeros((B, 49, 2), 'f4'), kp_conf], -1),
    }
    res = SMPLifyResult(
        global_orient=np.full((B, 1, 3), 0.5, 'f4'),
        body_pose=np.full((B, 23, 3), 0.25, 'f4'),
        betas=np.full((B, 10), 2.0, 'f4'),
        cam_t=np.zeros((B, 3), 'f4'),
        reproj_loss=np.array([49 * 5.0, 49 * 5.0, 49 * 500.0, 0.0], 'f4'),
        vertices=np.zeros((B, 8, 3), 'f4'))
    out = apply_smplify_update(batch, res, threshold=100.0)
    # 0: no GT + good fit -> accepted
    np.testing.assert_allclose(out['pose'][0, :3], 0.5)
    # 1: genuine GT is NEVER overwritten, even by a good fit
    np.testing.assert_allclose(out['pose'][1], 0.0)
    # 2: fit too poor (per-joint 500 > 100) -> rejected
    np.testing.assert_allclose(out['pose'][2], 0.0)
    assert out['has_smpl'][2] == 0.0
    # 3: zero keypoint evidence -> rejected despite zero loss
    #    (would be self-distillation on an unlabeled sample)
    np.testing.assert_allclose(out['pose'][3], 0.0)
    assert out['has_smpl'][3] == 0.0
    np.testing.assert_allclose(out['has_smpl'], [1.0, 1.0, 0.0, 0.0])
    # original batch untouched
    assert batch['has_smpl'][0] == 0.0


def test_trainer_run_smplify_hook(rng):
    """SpecTrainer._run_smplify: predict -> fit -> acceptance swap, on the
    trainer's real batch contract."""
    import jax
    import jax.numpy as jnp
    from spec_tpu.core import geometry as G
    from spec_tpu.models import HMR
    from spec_tpu.train.trainer import SpecTrainer
    from spec_tpu.utils.config import spec_default_config

    cfg = spec_default_config()
    cfg.LOGDIR = ''
    cfg.TRAINING.RUN_SMPLIFY = True
    cfg.TRAINING.NUM_SMPLIFY_ITERS = 3
    cfg.TRAINING.SMPLIFY_THRESHOLD = 1e9  # accept everything

    B, res = 4, 64
    assets = S.create_test_assets(num_vertices=128)
    model = HMR(backbone='resnet18', use_cam=True, use_cam_feats=False)
    images = jnp.asarray(rng.randn(B, res, res, 3).astype('f4'))
    R = G.euler_to_rotmat(jnp.asarray(rng.randn(B, 3).astype('f4') * 0.1))
    w = jnp.full((B,), 640.0)
    h = jnp.full((B,), 480.0)
    K = G.build_cam_intrinsics(jnp.full((B,), 800.0), w, h)
    center = jnp.asarray(rng.rand(B, 2).astype('f4') * 200 + 100)
    scale = jnp.asarray(rng.rand(B).astype('f4') + 1.0)
    variables = model.init(jax.random.PRNGKey(0), assets, images, R, K,
                           scale, center, w, h)

    trainer = SpecTrainer(
        cfg, model, {'neutral': assets}, np.asarray(assets.j_regressor_h36m),
        make_train_dataset=lambda e: None, make_val_loaders=lambda: {},
        init_variables=variables)

    dev = {
        'img': images,
        'pose': np.zeros((B, 72), 'f4'),
        'betas': np.zeros((B, 10), 'f4'),
        'has_smpl': np.zeros((B,), 'f4'),
        'keypoints_orig': np.concatenate(
            [rng.rand(B, 49, 2).astype('f4') * 400,
             np.ones((B, 49, 1), 'f4')], -1),
        'orig_shape': np.tile(np.array([[480.0, 640.0]], 'f4'), (B, 1)),
        'scale': scale, 'center': center,
        'cam_rotmat': R, 'cam_intrinsics': K,
    }
    out = trainer._run_smplify(dict(dev))
    # everything accepted -> supervision swapped to the fit
    np.testing.assert_allclose(out['has_smpl'], 1.0)
    assert not np.allclose(out['pose'], 0.0)
    assert np.isfinite(out['pose']).all()
    assert out['pose'].shape == (B, 72)


def test_validate_without_quantitative_metric_skips_ranked_pruning(rng):
    """With no val loaders (or only qualitative/ITW ones) validate() must
    NOT return a constant 0.0: every epoch would rank equal and the
    ascending (metric, step) sort would retain the 30 OLDEST checkpoints
    while deleting the newest (ADVICE r1). NaN makes _prune_ranked a
    no-op and recency retention applies instead."""
    import jax
    import jax.numpy as jnp
    from spec_tpu.models import HMR
    from spec_tpu.train.trainer import SpecTrainer
    from spec_tpu.utils.config import spec_default_config

    cfg = spec_default_config()
    cfg.LOGDIR = ''
    assets = S.create_test_assets(num_vertices=64)
    model = HMR(backbone='resnet18', use_cam=True)
    B = 1
    img = jnp.zeros((B, 64, 64, 3))
    eye = jnp.tile(jnp.eye(3), (B, 1, 1))
    one = jnp.ones((B,))
    variables = model.init(jax.random.PRNGKey(0), assets, img, eye, eye,
                           one, jnp.ones((B, 2)), one, one)
    trainer = SpecTrainer(
        cfg, model, {'neutral': assets},
        np.asarray(assets.j_regressor_h36m),
        lambda e: None, lambda: {}, init_variables=variables)

    v = trainer.validate(epoch=0, global_step=10)
    assert not np.isfinite(v)
    trainer._prune_ranked(v, step=10)
    assert trainer.best == []  # NaN never enters the ranking
    # finite metrics still rank: worst-of-3 evicted with keep=2
    trainer._prune_ranked(3.0, step=20, keep=2)
    trainer._prune_ranked(1.0, step=30, keep=2)
    trainer._prune_ranked(2.0, step=40, keep=2)
    assert [s for _, s, _ in trainer.best] == [30, 40]


def test_trainer_rejects_itw_val_without_images(rng):
    """An in-the-wild VAL_DS without TESTING.SAVE_IMAGES must fail at
    construction — the reference only catches it at validation time,
    i.e. AFTER a full trained epoch is lost."""
    import pytest
    import jax
    import jax.numpy as jnp
    from spec_tpu.models import HMR
    from spec_tpu.train.trainer import SpecTrainer
    from spec_tpu.utils.config import spec_default_config

    cfg = spec_default_config()
    cfg.LOGDIR = ''
    cfg.DATASET.VAL_DS = 'mpii'
    assets = S.create_test_assets(num_vertices=64)
    model = HMR(backbone='resnet18', use_cam=True)
    B = 1
    img = jnp.zeros((B, 64, 64, 3))
    eye = jnp.tile(jnp.eye(3), (B, 1, 1))
    one = jnp.ones((B,))
    variables = model.init(jax.random.PRNGKey(0), assets, img, eye, eye,
                           one, jnp.ones((B, 2)), one, one)
    with pytest.raises(SystemExit, match='in-the-wild'):
        SpecTrainer(cfg, model, {'neutral': assets},
                    np.asarray(assets.j_regressor_h36m),
                    lambda e: None, lambda: {}, init_variables=variables)
