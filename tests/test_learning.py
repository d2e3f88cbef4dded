"""End-to-end learnability: the training stack must actually LEARN.

Every other train test checks mechanics (sharding exactness, resume,
optimizer algebra) or same-batch memorization; this one checks the full
loop GENERALIZES on a synthetic-but-learnable task. CamCalib's job is
literally "read the horizon from the image" (reference
``camcalib/model.py``), so we render images whose only signal is a
pitch/roll-determined horizon (sky/ground two-tone + noise, geometry
from ``utils/vis.horizon_points`` = reference ``vis_utils.py:86-88``)
and require the trained net to beat the random-init pitch/roll MAE on a
HELD-OUT set by a wide margin.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spec_tpu.core import bins as B
from spec_tpu.data.pano_dataset import encode_targets
from spec_tpu.models import CameraRegressorNetwork
from spec_tpu.train import create_train_state, make_camcalib_train_step, make_optimizer
from spec_tpu.utils.config import camcalib_default_config

RES = 64
VFOV = 1.2  # fixed: vfov is not identifiable from a bare horizon line


def _render_horizon_batch(rng, n):
    """(n, RES, RES, 3) two-tone sky/ground images + (pitch, roll)."""
    from spec_tpu.datagen.synthetic import render_horizon_batch

    return render_horizon_batch(rng, n, res=RES, vfov=VFOV)


def _make_batch(imgs, pitch, roll):
    enc = encode_targets(np.full(len(pitch), VFOV, np.float32),
                         pitch, roll, 'ce')
    return {'img': jnp.asarray(imgs),
            'vfov': jnp.asarray(enc['vfov']),
            'pitch': jnp.asarray(enc['pitch']),
            'roll': jnp.asarray(enc['roll'])}


def _pitch_roll_mae(model, variables, imgs, pitch, roll):
    logits = model.apply(variables, jnp.asarray(imgs), train=False)
    _, p, r = B.convert_preds_to_angles(*logits, loss_type='ce')
    return (float(np.abs(np.asarray(p) - pitch).mean()),
            float(np.abs(np.asarray(r) - roll).mean()))


@pytest.mark.slow
def test_camcalib_learns_horizon_generalization(rng):
    cfg = camcalib_default_config()
    cfg.OPTIMIZER.LR = 3e-4
    model = CameraRegressorNetwork(backbone='resnet18')
    tx = make_optimizer(cfg.OPTIMIZER)

    imgs, pitch, roll = _render_horizon_batch(rng, 160)
    val_imgs, val_pitch, val_roll = _render_horizon_batch(rng, 64)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs[:2]))
    state = create_train_state(variables, tx)
    step = jax.jit(make_camcalib_train_step(model, tx, loss_type='ce'))

    mae0_p, mae0_r = _pitch_roll_mae(
        model, {'params': state.params, 'batch_stats': state.batch_stats},
        val_imgs, val_pitch, val_roll)

    BATCH = 32
    losses = []
    for epoch in range(8):
        order = rng.permutation(len(imgs))
        for s in range(0, len(imgs), BATCH):
            idx = order[s:s + BATCH]
            state, d = step(state, _make_batch(imgs[idx], pitch[idx],
                                               roll[idx]))
            losses.append(float(d['loss']))

    mae_p, mae_r = _pitch_roll_mae(
        model, {'params': state.params, 'batch_stats': state.batch_stats},
        val_imgs, val_pitch, val_roll)

    # train loss must collapse and HELD-OUT MAE must beat random init
    # by a wide margin (random decode over +-0.35 rad ~= 0.2+ rad MAE;
    # the horizon is fully determined by pitch/roll, so a conv net that
    # "learns" should land well under half of that).
    mean_early = np.mean(losses[:4])
    mean_late = np.mean(losses[-4:])
    print(f'[learning] loss {mean_early:.3f} -> {mean_late:.3f}; '
          f'val MAE pitch {mae0_p:.4f} -> {mae_p:.4f}, '
          f'roll {mae0_r:.4f} -> {mae_r:.4f} rad')
    assert mean_late < 0.6 * mean_early, (mean_early, mean_late)
    assert mae_p < 0.6 * mae0_p, (mae0_p, mae_p)
    assert mae_r < 0.6 * mae0_r, (mae0_r, mae_r)
    # absolute sanity: several degrees, not tens
    assert mae_p < 0.15 and mae_r < 0.15, (mae_p, mae_r)


@pytest.mark.slow
def test_spec_train_step_memorizes_fixed_batch(rng):
    """The full SPEC step (HMR + HMRCamLoss + Adam) must optimize: loss
    on a fixed synthetic batch decreases monotonically-ish over steps.
    (test_parallel_train checks sharding EXACTNESS; this checks the
    optimization direction end-to-end.)"""
    from spec_tpu.core import geometry as G
    from spec_tpu.core import smpl as S
    from spec_tpu.models import HMR
    from spec_tpu.train import adam, make_spec_train_step

    B, V = 4, 64
    assets = S.create_test_assets(num_vertices=V)
    model = HMR(backbone='resnet18', use_cam=True, use_cam_feats=True)

    images = jnp.asarray(rng.randn(B, 64, 64, 3).astype('f4'))
    cam_rotmat = G.euler_to_rotmat(
        jnp.asarray(rng.randn(B, 3).astype('f4') * 0.1))
    img_w = jnp.full((B,), 1920.0)
    img_h = jnp.full((B,), 1080.0)
    K = G.build_cam_intrinsics(jnp.full((B,), 1500.0), img_w, img_h)
    center = jnp.asarray(rng.rand(B, 2).astype('f4') * 800 + 300)
    scale = jnp.asarray(rng.rand(B).astype('f4') + 1.0)
    variables = model.init(jax.random.PRNGKey(0), assets, images,
                           cam_rotmat, K, scale, center, img_w, img_h)
    batch = {
        'img': images,
        'pose': jnp.asarray(rng.randn(B, 72).astype('f4') * 0.2),
        'betas': jnp.asarray(rng.randn(B, 10).astype('f4') * 0.3),
        'pose_conf': jnp.ones((B, 24)),
        'pose_3d': jnp.asarray(rng.randn(B, 24, 4).astype('f4')),
        'keypoints_orig': jnp.asarray(np.concatenate(
            [rng.rand(B, 49, 2) * 1000, np.ones((B, 49, 1))],
            -1).astype('f4')),
        'has_smpl': jnp.ones((B,)),
        'has_pose_3d': jnp.ones((B,)),
        'orig_shape': jnp.asarray(
            np.tile(np.array([[1080.0, 1920.0]], 'f4'), (B, 1))),
        'scale': scale,
        'center': center,
        'cam_rotmat': cam_rotmat,
        'cam_intrinsics': K,
    }
    tx = adam(2e-4)
    step = jax.jit(make_spec_train_step(model, assets, tx))
    state = create_train_state(variables, tx)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(8):
        state, d = step(state, batch, jax.random.fold_in(key, i))
        losses.append(float(d['loss/total_loss']))
    assert all(np.isfinite(l) for l in losses)
    assert np.mean(losses[-2:]) < 0.85 * np.mean(losses[:2]), losses
