"""SMPL projection heads (pure functions over :class:`SMPLAssets`).

Equivalents of the external ``pare.models.head.SMPLHead`` / ``SMPLCamHead``
consumed at reference ``spec/models/hmr.py:66-74,100-121``. Unlike the
reference (stateful nn.Modules owning an SMPL submodule), these are pure
functions: SMPL tensors come in as an immutable pytree, so the whole
model stays jit/pjit-transparent and the SMPL constants are shared across
heads without duplication in HBM.

Output dict keys mirror the reference contract consumed by
``spec/losses.py:171-191`` and ``spec/tester.py:153-167``:
``smpl_vertices`` (B, 6890, 3), ``smpl_joints3d`` (B, 49, 3),
``smpl_joints2d`` (B, 49, 2), ``pred_cam_t`` (B, 3).
"""

from __future__ import annotations

import jax.numpy as jnp

from spec_tpu.core import geometry as G
from spec_tpu.core.smpl import SMPLAssets, smpl_forward


def smpl_cam_head(
    assets: SMPLAssets,
    rotmat: jnp.ndarray,
    shape: jnp.ndarray,
    cam: jnp.ndarray,
    cam_rotmat: jnp.ndarray,
    cam_intrinsics: jnp.ndarray,
    bbox_scale: jnp.ndarray,
    bbox_center: jnp.ndarray,
    img_w: jnp.ndarray,
    img_h: jnp.ndarray,
    crop_res: int = 224,
    normalize_joints2d: bool = False,
) -> dict:
    """Camera-conditioned SMPL head: lift the crop-frame weak-perspective
    camera into the full image and project joints with the estimated
    camera (the SPEC path, reference ``spec/models/hmr.py:100-113``).

    Args:
      rotmat: (B, 24, 3, 3) predicted pose rotations.
      shape: (B, 10) betas.
      cam: (B, 3) crop weak-perspective (s, tx, ty).
      cam_rotmat: (B, 3, 3) camera rotation (CamCalib-pitch/roll or GT).
      cam_intrinsics: (B, 3, 3) full-image K.
      bbox_scale: (B,) bbox scale (side = scale * 200).
      bbox_center: (B, 2) bbox center, full-image pixels.
      img_w, img_h: (B,) image size.
    """
    out = smpl_forward(
        assets,
        betas=shape,
        body_pose=rotmat[:, 1:],
        global_orient=rotmat[:, 0:1],
        pose2rot=False,
        joint_set='spin49',
    )
    focal = cam_intrinsics[:, 0, 0]
    cam_t = G.weak_perspective_to_full_translation(
        cam, bbox_center, bbox_scale, img_w, img_h, focal, crop_res=crop_res)
    joints2d = G.perspective_projection(
        out.joints, rotation=cam_rotmat, translation=cam_t,
        cam_intrinsics=cam_intrinsics)
    if normalize_joints2d:
        joints2d = joints2d / (crop_res / 2.0)
    return {
        'smpl_vertices': out.vertices,
        'smpl_joints3d': out.joints,
        'smpl_joints2d': joints2d,
        'pred_cam_t': cam_t,
    }


def smpl_head(
    assets: SMPLAssets,
    rotmat: jnp.ndarray,
    shape: jnp.ndarray,
    cam: jnp.ndarray,
    focal_length: float = 5000.0,
    img_res: int = 224,
    normalize_joints2d: bool = True,
) -> dict:
    """Crop-frame SMPL head (non-cam HMR baseline path, reference
    ``spec/models/hmr.py:114-121``): weak-perspective placement at fixed
    focal length, joints2d normalized to [-1, 1] in the crop."""
    out = smpl_forward(
        assets,
        betas=shape,
        body_pose=rotmat[:, 1:],
        global_orient=rotmat[:, 0:1],
        pose2rot=False,
        joint_set='spin49',
    )
    joints2d = G.weak_perspective_projection(
        out.joints, cam, focal_length=focal_length, img_res=img_res)
    if not normalize_joints2d:
        joints2d = (joints2d + 1.0) * (img_res / 2.0)
    cam_t = G.weak_perspective_cam_t(cam, focal_length, img_res)
    return {
        'smpl_vertices': out.vertices,
        'smpl_joints3d': out.joints,
        'smpl_joints2d': joints2d,
        'pred_cam_t': cam_t,
    }
