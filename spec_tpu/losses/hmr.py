"""HMR / HMR-Cam training losses (pure JAX, masked static shapes).

Rebuild of reference ``spec/losses.py`` (``HMRLoss`` 26-141, ``HMRCamLoss``
144-271 and the helper functions 280-432). The torch code masks by boolean
indexing (dynamic shapes); here every mask is a multiplicative weight with a
safe normalizer so the whole loss is one static XLA graph.

Faithfully-preserved reference quirks (documented so parity holds):
  * ``smpl_losses`` (spec/losses.py:412-432) reduces the pose MSE to a
    scalar BEFORE multiplying by per-joint confidence, so the pose term is
    ``mse(valid) * mean(conf(valid))`` — not a per-joint weighted mean.
  * The 3D keypoint loss uses joints 25+ of the 49-joint set, pelvis =
    midpoint of GT-set joints 2 and 3 (R/L hip), confidences taken from the
    GT's 4th column (spec/losses.py:326-348).
  * The camera regularizer is ``mean(exp(-10 s)^2)`` (spec/losses.py:247).
  * The 2D loss in the cam variant is computed on FULL-IMAGE keypoints
    normalized to [-1, 1] by (W, H) and rescaled per sample by
    ``img_size / (bbox_scale * 200)`` to match crop-loss magnitudes
    (spec/losses.py:188-224).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from spec_tpu.core.geometry import rodrigues


def _safe_div(num, den):
    return num / jnp.maximum(den, 1.0)


def _masked_row_mean(per_elem: jnp.ndarray, row_mask: jnp.ndarray):
    """Mean over elements of the rows selected by ``row_mask`` — equals
    torch's ``tensor[mask].mean()`` for static shapes."""
    mask = row_mask.astype(per_elem.dtype).reshape(
        (-1,) + (1,) * (per_elem.ndim - 1))
    numel_per_row = float(math.prod(per_elem.shape[1:]))
    return _safe_div((per_elem * mask).sum(),
                     row_mask.astype(per_elem.dtype).sum() * numel_per_row)


def smpl_param_loss(
    pred_rotmat: jnp.ndarray,   # (B, 24, 3, 3)
    pred_betas: jnp.ndarray,    # (B, 10)
    gt_pose_aa: jnp.ndarray,    # (B, 72) axis-angle
    gt_betas: jnp.ndarray,      # (B, 10)
    has_smpl: jnp.ndarray,      # (B,)
    pose_conf: jnp.ndarray,     # (B, 24)
):
    """Pose/shape parameter losses (reference ``smpl_losses``)."""
    B = pred_rotmat.shape[0]
    gt_rotmat = rodrigues(gt_pose_aa.reshape(B, 24, 3))
    valid = has_smpl.astype(jnp.float32)

    mse_pose = _masked_row_mean((pred_rotmat - gt_rotmat) ** 2, valid)
    mean_conf = _safe_div((pose_conf.mean(axis=1) * valid).sum(), valid.sum())
    loss_pose = mse_pose * mean_conf

    loss_betas = _masked_row_mean((pred_betas - gt_betas) ** 2, valid)
    return loss_pose, loss_betas


def keypoint_3d_loss(
    pred_joints: jnp.ndarray,   # (B, 49, 3)
    gt_joints: jnp.ndarray,     # (B, 24, 4) xyz + conf
    has_pose_3d: jnp.ndarray,   # (B,)
):
    """Pelvis-centered 3D keypoint loss on the 24 GT-set joints
    (reference ``keypoint_3d_loss``)."""
    pred = pred_joints[:, 25:, :]
    conf = gt_joints[..., 3:4]
    gt = gt_joints[..., :3]
    gt_pelvis = (gt[:, 2:3] + gt[:, 3:4]) / 2.0
    pred_pelvis = (pred[:, 2:3] + pred[:, 3:4]) / 2.0
    per_elem = conf * (pred - pred_pelvis - (gt - gt_pelvis)) ** 2
    return _masked_row_mean(per_elem, has_pose_3d.astype(jnp.float32))


def shape_loss(
    pred_vertices: jnp.ndarray,  # (B, V, 3)
    gt_vertices: jnp.ndarray,
    has_smpl: jnp.ndarray,
):
    """L1 vertex loss over samples with SMPL GT (reference ``shape_loss``)."""
    return _masked_row_mean(
        jnp.abs(pred_vertices - gt_vertices), has_smpl.astype(jnp.float32))


def projected_keypoint_loss(
    pred_kp2d: jnp.ndarray,      # (B, 49, 2)
    gt_kp2d: jnp.ndarray,        # (B, 49, 3) xy + conf
    openpose_weight: float,
    gt_weight: float,
):
    """Confidence-weighted 2D MSE, unreduced (B, 49, 2) — first 25 joints
    get ``openpose_weight``, the remaining 24 ``gt_weight``."""
    conf = gt_kp2d[..., 2:3]
    w = jnp.concatenate([
        jnp.full((25, 1), openpose_weight, jnp.float32),
        jnp.full((24, 1), gt_weight, jnp.float32),
    ])[None]
    return conf * w * (pred_kp2d - gt_kp2d[..., :2]) ** 2


def gaussian_nll(pred_mean, pred_logvar, target):
    """Heteroscedastic Gaussian NLL: 0.5 (exp(-s) err^2 + s), mean-reduced
    (the aleatoric-uncertainty criterion behind the reference's
    ``estimate_var`` option, spec/losses.py:45-47,390-409)."""
    err2 = (pred_mean - target) ** 2
    return 0.5 * (jnp.exp(-pred_logvar) * err2 + pred_logvar).mean()


def smpl_param_loss_uncertainty(
    pred_pose6d: jnp.ndarray,        # (B, 144) rot6d means
    pred_pose6d_logvar: jnp.ndarray,  # (B, 144)
    pred_betas: jnp.ndarray,         # (B, 10)
    pred_betas_logvar: jnp.ndarray,  # (B, 10)
    gt_pose_aa: jnp.ndarray,         # (B, 72)
    gt_betas: jnp.ndarray,
    has_smpl: jnp.ndarray,
):
    """Uncertainty-weighted parameter loss (reference
    ``smpl_losses_uncertainty``, spec/losses.py:390-409: the GT pose is
    converted aa -> rotmat -> rot6d and compared in 6D space). Masked
    static-shape port; the NLL replaces the plain MSE."""
    from spec_tpu.core.geometry import rotmat_to_rot6d

    B = pred_pose6d.shape[0]
    gt_rot6d = rotmat_to_rot6d(
        rodrigues(gt_pose_aa.reshape(B, 24, 3))).reshape(B, 144)
    valid = has_smpl.astype(jnp.float32)

    nll_pose = 0.5 * (jnp.exp(-pred_pose6d_logvar)
                      * (pred_pose6d - gt_rot6d) ** 2 + pred_pose6d_logvar)
    nll_betas = 0.5 * (jnp.exp(-pred_betas_logvar)
                       * (pred_betas - gt_betas) ** 2 + pred_betas_logvar)
    return (_masked_row_mean(nll_pose, valid),
            _masked_row_mean(nll_betas, valid))


@dataclasses.dataclass(frozen=True)
class HMRLossConfig:
    """Weights (reference defaults, spec/losses.py:146-155 / spec/config.py
    HMR.*_LOSS_WEIGHT)."""

    shape_loss_weight: float = 0.0
    keypoint_loss_weight: float = 5.0
    pose_loss_weight: float = 1.0
    beta_loss_weight: float = 0.001
    openpose_train_weight: float = 0.0
    gt_train_weight: float = 1.0
    loss_weight: float = 60.0


def hmr_cam_loss(pred: dict, gt: dict, cfg: HMRLossConfig = HMRLossConfig()):
    """The SPEC training loss (reference ``HMRCamLoss.forward``).

    Required keys — pred: pred_cam, pred_shape, pred_pose (rotmats),
    smpl_joints3d, smpl_vertices, smpl_joints2d (full-image pixels);
    gt: pose (B,72 aa), pose_conf (B,24), betas, pose_3d (B,24,4),
    vertices, keypoints_orig (B,49,3 full-image pixels+conf),
    has_smpl (B,), has_pose_3d (B,), orig_shape (B,2 as (H,W)),
    scale (B,) bbox scale.
    Returns (total_loss, dict).
    """
    img_wh = gt['orig_shape'][:, ::-1].astype(jnp.float32)   # (B, 2) = (W,H)
    wh = img_wh[:, None, :]                                   # (B, 1, 2)

    pred_kp2d = 2.0 * pred['smpl_joints2d'][..., :2] / wh - 1.0
    gt_kp2d = gt['keypoints_orig']
    gt_kp2d = jnp.concatenate(
        [2.0 * gt_kp2d[..., :2] / wh - 1.0, gt_kp2d[..., 2:]], axis=-1)

    loss_pose, loss_betas = smpl_param_loss(
        pred['pred_pose'], pred['pred_shape'], gt['pose'], gt['betas'],
        gt['has_smpl'], gt['pose_conf'])

    kp_loss = projected_keypoint_loss(
        pred_kp2d, gt_kp2d, cfg.openpose_train_weight, cfg.gt_train_weight)
    # Rescale to crop-loss magnitude: img / bbox (reference 220-224).
    scale = img_wh / (gt['scale'][:, None].astype(jnp.float32) * 200.0)
    loss_keypoints = (kp_loss * scale[:, None, :]).mean()

    loss_keypoints_3d = keypoint_3d_loss(
        pred['smpl_joints3d'], gt['pose_3d'], gt['has_pose_3d'])
    loss_shape = shape_loss(
        pred['smpl_vertices'], gt['vertices'], gt['has_smpl'])

    loss_cam = _cam_regularizer(pred['pred_cam'])

    loss_dict = {
        'loss/loss_keypoints': loss_keypoints * cfg.keypoint_loss_weight,
        'loss/loss_keypoints_3d':
            loss_keypoints_3d * cfg.keypoint_loss_weight,
        'loss/loss_regr_pose': loss_pose * cfg.pose_loss_weight,
        'loss/loss_regr_betas': loss_betas * cfg.beta_loss_weight,
        'loss/loss_shape': loss_shape * cfg.shape_loss_weight,
        'loss/loss_cam': loss_cam,
    }
    total = sum(loss_dict.values()) * cfg.loss_weight
    loss_dict['loss/total_loss'] = total
    return total, loss_dict


def _cam_regularizer(pred_cam):
    """``mean(exp(-10 s)^2)`` (reference spec/losses.py:247), with s
    clamped at -4 purely to keep fp32 finite: below that the reference
    value overflows to inf and training is already divergent — the clamp
    only changes the divergent regime (exact for all s > -4, i.e. any
    plausible scale; pretrained starts sit at s ~ 0.9)."""
    s = jnp.maximum(pred_cam[:, 0], -4.0)
    return (jnp.exp(-s * 10.0) ** 2).mean()


def hmr_loss(pred: dict, gt: dict, cfg: HMRLossConfig = HMRLossConfig()):
    """Crop-frame HMR loss (reference ``HMRLoss.forward``): identical
    structure but the 2D term uses pre-normalized crop keypoints
    ``gt['keypoints']`` and no bbox rescaling."""
    loss_pose, loss_betas = smpl_param_loss(
        pred['pred_pose'], pred['pred_shape'], gt['pose'], gt['betas'],
        gt['has_smpl'], gt['pose_conf'])

    loss_keypoints = projected_keypoint_loss(
        pred['smpl_joints2d'], gt['keypoints'],
        cfg.openpose_train_weight, cfg.gt_train_weight).mean()

    loss_keypoints_3d = keypoint_3d_loss(
        pred['smpl_joints3d'], gt['pose_3d'], gt['has_pose_3d'])
    loss_shape = shape_loss(
        pred['smpl_vertices'], gt['vertices'], gt['has_smpl'])
    loss_cam = _cam_regularizer(pred['pred_cam'])

    loss_dict = {
        'loss/loss_keypoints': loss_keypoints * cfg.keypoint_loss_weight,
        'loss/loss_keypoints_3d':
            loss_keypoints_3d * cfg.keypoint_loss_weight,
        'loss/loss_regr_pose': loss_pose * cfg.pose_loss_weight,
        'loss/loss_regr_betas': loss_betas * cfg.beta_loss_weight,
        'loss/loss_shape': loss_shape * cfg.shape_loss_weight,
        'loss/loss_cam': loss_cam,
    }
    total = sum(loss_dict.values()) * cfg.loss_weight
    loss_dict['loss/total_loss'] = total
    return total, loss_dict
