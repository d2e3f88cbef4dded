"""Evaluation metrics, fully batched on device.

Rebuild of the metric math the reference spreads across
``spec/trainer.py:230-364`` (in-loop diagnostics), the external
``pare.utils.eval_utils`` (``reconstruction_error`` — per-sample numpy
Procrustes on the CPU — and ``compute_error_verts``), and
``spec/utils/compute_error.py:33-86`` (``eval_single`` / ``eval_j_24``).
Everything here is one jit-safe graph: the Procrustes alignment runs as a
batched 3x3 SVD on device instead of a per-sample numpy loop.

All distances are in the input unit (meters for SMPL); callers scale by
1000 for mm (the reference multiplies at the aggregation site,
``spec/utils/compute_error.py:83-86``).
"""

from __future__ import annotations

import jax.numpy as jnp

from spec_tpu.core import constants as C
from spec_tpu.core.geometry import fp32_matmuls, procrustes_align


def per_joint_error(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distance per joint: (B, J, 3) x2 -> (B, J)."""
    return jnp.sqrt(((pred - gt) ** 2).sum(-1))


def mpjpe(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Mean per-joint position error, per sample: -> (B,)."""
    return per_joint_error(pred, gt).mean(-1)


def pa_mpjpe(pred: jnp.ndarray, gt: jnp.ndarray):
    """Procrustes-aligned MPJPE (the reference's ``reconstruction_error``).

    Returns (per_sample (B,), per_joint (B, J)).
    """
    aligned = procrustes_align(pred, gt)
    pj = per_joint_error(aligned, gt)
    return pj.mean(-1), pj


def v2v_error(pred_verts: jnp.ndarray, gt_verts: jnp.ndarray) -> jnp.ndarray:
    """Per-vertex error, per sample (``compute_error_verts``): -> (B,)."""
    return jnp.sqrt(((pred_verts - gt_verts) ** 2).sum(-1)).mean(-1)


@fp32_matmuls
def regress_h36m(vertices: jnp.ndarray, j_regressor_h36m: jnp.ndarray):
    """(B, V, 3), (17, V) -> (B, 17, 3)."""
    return jnp.einsum('jv,bvc->bjc', j_regressor_h36m, vertices)


def eval_mesh_j14(
    pred_vertices: jnp.ndarray,
    gt_vertices: jnp.ndarray,
    j_regressor_h36m: jnp.ndarray,
    subset: str = 'j14',
) -> dict:
    """The 14-joint H36M-regressor protocol (reference ``eval_single``,
    spec/utils/compute_error.py:52-86): joints from the mesh, pelvis =
    H36M joint 0, J14 selection, pelvis-centered V2V.

    Returns per-sample dict: mpjpe, pa_mpjpe (B,), v2v (B,),
    per_joint_mpjpe / per_joint_pa (B, 14).
    """
    sel = jnp.asarray(
        C.H36M_TO_J17 if subset == 'j17' else C.H36M_TO_J14)
    pj = regress_h36m(pred_vertices, j_regressor_h36m)
    gj = regress_h36m(gt_vertices, j_regressor_h36m)
    p_pelvis = pj[:, 0:1]
    g_pelvis = gj[:, 0:1]
    pj = pj[:, sel] - p_pelvis
    gj = gj[:, sel] - g_pelvis

    err = per_joint_error(pj, gj)
    pa, pa_pj = pa_mpjpe(pj, gj)
    v2v = v2v_error(pred_vertices - p_pelvis, gt_vertices - g_pelvis)
    return {
        'mpjpe': err.mean(-1),
        'pa_mpjpe': pa,
        'v2v': v2v,
        'per_joint_mpjpe': err,
        'per_joint_pa': pa_pj,
    }


def eval_joints_24(
    pred_joints24: jnp.ndarray, gt_joints24: jnp.ndarray
) -> dict:
    """The 24-native-SMPL-joint protocol (reference ``eval_j_24``,
    spec/utils/compute_error.py:33-49): pelvis = joint 0 of each set."""
    pj = pred_joints24 - pred_joints24[:, 0:1]
    gj = gt_joints24 - gt_joints24[:, 0:1]
    err = per_joint_error(pj, gj)
    pa, pa_pj = pa_mpjpe(pj, gj)
    return {
        'mpjpe': err.mean(-1),
        'pa_mpjpe': pa,
        'per_joint_mpjpe': err,
        'per_joint_pa': pa_pj,
    }


@fp32_matmuls
def rotate_points(rotmat: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """(B, 3, 3), (B, N, 3) -> (B, N, 3) — world->cam frame rotation used to
    produce the C-prefixed metrics (reference compute_error.py:186-190)."""
    return jnp.einsum('bij,bnj->bni', rotmat, points)
