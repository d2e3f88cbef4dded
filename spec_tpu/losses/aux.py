"""Auxiliary dense-supervision losses (pure JAX).

Rebuild of the ``pare.losses`` surface the reference imports at
``spec/losses.py:21-22`` (``JointsMSELoss`` from ``pare.losses.keypoints``,
``CrossEntropy`` from ``pare.losses.segmentation``). Those imports are
unused in the reference's active loss paths (SURVEY §2.2) but are part of
its dependency surface: they supervise keypoint *heatmaps* and body-part
*segmentation maps* for PARE-style heads. Provided here so a PARE-style
dense head can be trained in this framework without any torch dependency.

TPU notes: both losses are plain fused elementwise+reduce graphs (no
gathers); masks are static-shape multiplies so they jit cleanly under
``pjit`` with batch sharding.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def joints_mse_loss(
    pred_heatmaps: jnp.ndarray,
    gt_heatmaps: jnp.ndarray,
    target_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Heatmap MSE with per-joint visibility weighting.

    Equivalent of torch ``JointsMSELoss`` (HRNet/PARE dialect): per joint,
    ``0.5 * mse(pred * w, gt * w)`` where the MSE is a mean over batch and
    pixels, averaged over joints.

    Args:
      pred_heatmaps: (B, J, H, W) predicted heatmaps.
      gt_heatmaps: (B, J, H, W) target heatmaps.
      target_weight: optional (B, J) or (B, J, 1) per-joint weights
        (typically visibility in {0, 1}).

    Returns: scalar loss.
    """
    B, J = pred_heatmaps.shape[:2]
    pred = pred_heatmaps.reshape(B, J, -1).astype(jnp.float32)
    gt = gt_heatmaps.reshape(B, J, -1).astype(jnp.float32)
    if target_weight is not None:
        w = target_weight.reshape(B, J, 1).astype(jnp.float32)
        pred = pred * w
        gt = gt * w
    # mean over (batch, pixels) per joint, then mean over joints; the 0.5
    # matches the torch implementation's per-joint 0.5 * MSELoss.
    per_joint = 0.5 * jnp.mean((pred - gt) ** 2, axis=(0, 2))
    return per_joint.mean()


def pixelwise_cross_entropy(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    ignore_index: int = -1,
    class_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-pixel softmax cross-entropy for part-segmentation maps.

    Equivalent of the segmentation ``CrossEntropy`` (torch
    ``nn.CrossEntropyLoss`` over an (B, C, H, W) score map): mean NLL of the
    target class per pixel, skipping ``ignore_index`` pixels, with optional
    per-class weights (torch semantics: weighted sum / sum of weights at
    the selected pixels).

    Args:
      logits: (B, C, H, W) unnormalized class scores.
      target: (B, H, W) integer class map; ``ignore_index`` marks void.
      ignore_index: label value excluded from the loss.
      class_weights: optional (C,) rescaling weights.

    Returns: scalar loss.
    """
    B, C = logits.shape[:2]
    logp = jax.nn.log_softmax(
        logits.astype(jnp.float32).reshape(B, C, -1), axis=1)  # (B, C, P)
    tgt = target.reshape(B, -1).astype(jnp.int32)              # (B, P)
    valid = (tgt != ignore_index)
    # Clamp void labels to a legal index; their contribution is masked out.
    safe = jnp.where(valid, tgt, 0)
    # One-hot matmul instead of take_along_axis: gathers fused into large
    # graphs lower to serial loops on TPU (see ops/preprocess.py rationale).
    onehot = jax.nn.one_hot(safe, C, dtype=jnp.float32)        # (B, P, C)
    nll = -jnp.einsum('bcp,bpc->bp', logp, onehot)
    w = valid.astype(jnp.float32)
    if class_weights is not None:
        w = w * jnp.take(class_weights.astype(jnp.float32), safe)
    denom = jnp.maximum(w.sum(), 1e-12)
    return (nll * w).sum() / denom
