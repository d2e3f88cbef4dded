"""Batched in-graph SMPLify: fit SMPL pose/shape/translation to 2D keypoints.

The reference carries the SPIN in-the-loop fitting knobs as config stubs
(``TRAINING.RUN_SMPLIFY`` / ``NUM_SMPLIFY_ITERS`` / ``SMPLIFY_THRESHOLD``,
reference ``spec/config.py:131-133``) but ships no fitting code — SPIN's
SMPLify lives outside the repo. This is the TPU-native implementation:
the whole optimization is ONE jitted graph (``lax.fori_loop`` over Adam
steps, gradients through the differentiable LBS + full-perspective
projection), so a batch of people fits in parallel on the MXU with no
host round-trips per iteration.

Objective (SPIN/SMPLify energy, simplified priors):
  * GMoF-robustified reprojection error of the 49-joint superset against
    confidence-weighted 2D keypoints (Geman-McClure
    ``rho^2 * x^2 / (x^2 + rho^2)``),
  * angle prior pushing knees/elbows toward anatomically valid bending,
  * L2 shape prior on betas,
  * L2 pose-deviation prior anchoring the fit to its initialization
    (stands in for SPIN's GMM pose prior — the GMM mixture weights are
    training data we do not ship; deviation-from-regressor keeps the
    fitted pose in-distribution the same way).

``smplify_fit`` returns fitted params plus per-sample final reprojection
loss; callers implement the SPIN acceptance rule (take the fit where its
loss beats the threshold / the current supervision).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from spec_tpu.core.geometry import perspective_projection
from spec_tpu.core.smpl import smpl_forward


# SMPL kinematic joint indices for elbows/knees in the 23-joint body pose.
# SPIN convention (smplify angle prior): x-rotation of the knees and
# y-rotation of the elbows, signs [-1, -1, +1, -1] for
# [L-knee-x, R-knee-x, L-elbow-y, R-elbow-y] — exp(sign*theta) is small in
# the valid bending direction and large under hyper-extension.
_BEND_JOINTS = (4, 5, 18, 19)   # knees L/R, elbows L/R (SMPL joint ids)
_BEND_SIGNS = (-1.0, -1.0, 1.0, -1.0)


def gmof(x: jnp.ndarray, rho: float) -> jnp.ndarray:
    """Geman-McClure robust error."""
    sq = x * x
    return (rho * rho) * sq / (sq + rho * rho)


def angle_prior(body_pose_aa: jnp.ndarray) -> jnp.ndarray:
    """Penalize hyper-extension of knees and elbows.

    ``body_pose_aa``: (B, 23, 3). Uses the classic SMPLify term
    ``exp(sign * theta_bend)`` on the bending component of each joint.
    """
    comps = []
    for j, sign in zip(_BEND_JOINTS, _BEND_SIGNS):
        # knees bend about x (component 0), elbows about y (component 1)
        c = 0 if j in (4, 5) else 1
        comps.append(jnp.exp(body_pose_aa[:, j - 1, c] * sign))
    return jnp.stack(comps, -1) ** 2


class SMPLifyResult(NamedTuple):
    global_orient: jnp.ndarray   # (B, 1, 3) axis-angle
    body_pose: jnp.ndarray       # (B, 23, 3) axis-angle
    betas: jnp.ndarray           # (B, 10)
    cam_t: jnp.ndarray           # (B, 3) camera-frame translation
    reproj_loss: jnp.ndarray     # (B,) final per-sample reprojection loss
    vertices: jnp.ndarray        # (B, V, 3) fitted mesh


def _project(joints3d, cam_t, cam_rotmat, K):
    """Projection via geometry.perspective_projection — fp32_matmuls
    guarded (CLAUDE.md precision rule; a bare einsum here would run the
    rotation/K matmuls as bf16 passes on TPU through all fitting
    iterations AND their gradients)."""
    return perspective_projection(joints3d, cam_rotmat, cam_t, K)


@functools.partial(
    jax.jit,
    static_argnames=('num_iters', 'joint_set'))
def smplify_fit(
    assets,
    init_global_orient: jnp.ndarray,   # (B, 1, 3) aa
    init_body_pose: jnp.ndarray,       # (B, 23, 3) aa
    init_betas: jnp.ndarray,           # (B, 10)
    init_cam_t: jnp.ndarray,           # (B, 3)
    keypoints_2d: jnp.ndarray,         # (B, 49, 3) pixel x, y, conf
    cam_rotmat: jnp.ndarray,           # (B, 3, 3)
    cam_intrinsics: jnp.ndarray,       # (B, 3, 3)
    num_iters: int = 100,
    lr: float = 1e-2,
    sigma: float = 100.0,
    pose_prior_weight: float = 4.78,
    shape_prior_weight: float = 5.0,
    angle_prior_weight: float = 15.2,
    joint_set: str = 'spin49',
) -> SMPLifyResult:
    """Fit SMPL params to 2D keypoints; one compiled graph per (B, iters).

    Returns fitted axis-angle params, translation, per-sample final
    reprojection loss (confidence-weighted GMoF, summed over joints —
    comparable against ``TRAINING.SMPLIFY_THRESHOLD``), and vertices.
    """
    conf = keypoints_2d[..., 2]
    target = keypoints_2d[..., :2]

    def unpack(params):
        return (params['go'], params['bp'], params['betas'], params['ct'])

    def energy(params):
        go, bp, betas, cam_t = unpack(params)
        out = smpl_forward(assets, betas, bp, go, pose2rot=True,
                           joint_set=joint_set)
        pix = _project(out.joints, cam_t, cam_rotmat, cam_intrinsics)
        reproj = (conf * gmof(pix - target, sigma).sum(-1)).sum(-1)  # (B,)
        e_pose = ((bp - init_body_pose) ** 2).sum((-1, -2))
        e_shape = (betas ** 2).sum(-1)
        e_angle = angle_prior(bp).sum(-1)
        total = (reproj
                 + pose_prior_weight ** 2 * e_pose
                 + shape_prior_weight ** 2 * e_shape
                 + angle_prior_weight ** 2 * e_angle)
        return total.sum(), reproj

    params0 = {'go': init_global_orient.astype(jnp.float32),
               'bp': init_body_pose.astype(jnp.float32),
               'betas': init_betas.astype(jnp.float32),
               'ct': init_cam_t.astype(jnp.float32)}
    tx = optax.adam(lr)
    opt0 = tx.init(params0)

    def step(_, carry):
        params, opt = carry
        grads, _ = jax.grad(energy, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt

    params, _ = jax.lax.fori_loop(0, num_iters, step, (params0, opt0))

    go, bp, betas, cam_t = unpack(params)
    out = smpl_forward(assets, betas, bp, go, pose2rot=True,
                      joint_set=joint_set)
    pix = _project(out.joints, cam_t, cam_rotmat, cam_intrinsics)
    reproj = (conf * gmof(pix - target, sigma).sum(-1)).sum(-1)
    return SMPLifyResult(go, bp, betas, cam_t, reproj, out.vertices)


def apply_smplify_update(batch: dict, result: SMPLifyResult,
                         threshold: float,
                         min_visible: float = 6.0) -> dict:
    """Acceptance rule for in-the-loop fitting: fill in SMPL supervision
    from the fit where (a) the sample has NO genuine GT (``has_smpl`` is
    0 — mocap/scan annotations are never overwritten by a fit), (b) the
    fit's per-visible-joint reprojection loss beats ``threshold``, and
    (c) at least ``min_visible`` keypoint confidence mass exists —
    without real 2D evidence the "fit" is just the network's own
    prediction pulled by priors, and accepting it would self-distill on
    unlabeled samples.

    (SPIN additionally compares against the loss of previously-fitted
    params kept in a persistent per-sample dictionary; the never-
    overwrite-GT + threshold + visibility gates are the stateless
    equivalent.)

    ``batch`` uses the trainer contract: ``pose`` (B, 72 aa), ``betas``
    (B, 10), ``has_smpl`` (B,), ``keypoints_orig`` (B, 49, 3). Returns a
    new dict (inputs untouched).
    """
    import numpy as np

    conf_mass = np.asarray(batch['keypoints_orig'])[..., 2].sum(-1)
    n_vis = np.maximum(conf_mass, 1.0)
    per_joint = np.asarray(result.reproj_loss) / n_vis
    accept = ((per_joint < threshold)
              & (np.asarray(batch['has_smpl']) < 0.5)
              & (conf_mass >= min_visible))

    pose_fit = np.concatenate(
        [np.asarray(result.global_orient).reshape(-1, 3),
         np.asarray(result.body_pose).reshape(len(accept), -1)], -1)
    out = dict(batch)
    m = accept[:, None].astype(np.float32)
    out['pose'] = m * pose_fit + (1 - m) * np.asarray(batch['pose'])
    out['betas'] = (m * np.asarray(result.betas)
                    + (1 - m) * np.asarray(batch['betas']))
    out['has_smpl'] = np.maximum(
        np.asarray(batch['has_smpl']), accept.astype(np.float32))
    return out
