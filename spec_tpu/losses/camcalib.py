"""CamCalib bin-classification losses (pure JAX).

Rebuild of reference ``camcalib/loss.py:24-125``: per-angle losses over the
256-logit bin heads — cross-entropy, KL(one-hot) (identical to CE up to the
batchmean reduction), softargmax-L2 on the continuous soft index, and the
"biased L2" that penalizes vfov over-prediction harder
(``where(pred > target, l2, l2 / (l2 + 1))``).

All functions take ``(B, 256)`` logits + targets and return scalars; the
combined :func:`camera_regressor_loss` mirrors the reference weighting and
the special-casing of vfov under ``softargmax_biased_l2``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spec_tpu.core.bins import softargmax1d


def cross_entropy_loss(logits: jnp.ndarray, target_bins: jnp.ndarray):
    """Mean CE with integer bin targets (torch ``nn.CrossEntropyLoss``)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(
        logp, target_bins[:, None].astype(jnp.int32), axis=-1)[:, 0]
    return -picked.mean()


def kl_one_hot_loss(logits: jnp.ndarray, target_bins: jnp.ndarray):
    """KL(one-hot || softmax(logits)) with batchmean reduction — numerically
    equal to CE because the one-hot entropy term vanishes (reference
    ``KLDivergence``, camcalib/loss.py:24-30)."""
    return cross_entropy_loss(logits, target_bins)


def softargmax_l2_loss(logits: jnp.ndarray, target_soft_idx: jnp.ndarray):
    """L2 between the normalized softargmax of the logits and the target
    soft index in [-1, 1] (reference ``SoftargmaxClsLoss('l2')``)."""
    pred = softargmax1d(logits)
    return ((target_soft_idx.astype(jnp.float32) - pred) ** 2).mean()


def softargmax_biased_l2_loss(
    logits: jnp.ndarray, target_soft_idx: jnp.ndarray
):
    """Biased L2: full quadratic penalty when over-predicting, saturating
    ``l2/(l2+1)`` when under-predicting (reference
    ``SoftargmaxClsLoss('biased_l2')``; used for vfov only)."""
    pred = softargmax1d(logits)
    t = target_soft_idx.astype(jnp.float32)
    l2 = (t - pred) ** 2
    return jnp.where(pred > t, l2, l2 / (l2 + 1.0)).mean()


def camera_regressor_loss(
    pred_vfov: jnp.ndarray,
    pred_pitch: jnp.ndarray,
    pred_roll: jnp.ndarray,
    gt_vfov: jnp.ndarray,
    gt_pitch: jnp.ndarray,
    gt_roll: jnp.ndarray,
    loss_type: str = 'softargmax_biased_l2',
    vfov_loss_weight: float = 1.0,
    pitch_loss_weight: float = 1.0,
    roll_loss_weight: float = 1.0,
):
    """Combined 3-head loss (reference ``CameraRegressorLoss``).

    GT targets are integer bin indices for 'ce'/'kl' and soft indices in
    [-1, 1] for the softargmax variants (how the datasets encode them,
    reference ``camcalib/pano_dataset.py:135-142``).

    Returns (total, dict of per-angle scalars).
    """
    if loss_type in ('ce', 'kl'):
        fn = cross_entropy_loss
        vfov_fn = fn
    elif loss_type == 'softargmax_l2':
        fn = softargmax_l2_loss
        vfov_fn = fn
    elif loss_type == 'softargmax_biased_l2':
        fn = softargmax_l2_loss
        vfov_fn = softargmax_biased_l2_loss
    else:
        raise ValueError(f'unknown loss_type: {loss_type}')

    vfov_loss = vfov_loss_weight * vfov_fn(pred_vfov, gt_vfov)
    pitch_loss = pitch_loss_weight * fn(pred_pitch, gt_pitch)
    roll_loss = roll_loss_weight * fn(pred_roll, gt_roll)
    total = vfov_loss + pitch_loss + roll_loss
    return total, {
        'loss': total,
        'vfov_loss': vfov_loss,
        'pitch_loss': pitch_loss,
        'roll_loss': roll_loss,
    }
