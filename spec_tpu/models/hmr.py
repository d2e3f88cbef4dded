"""SPEC's camera-conditioned HMR model (flax).

Rebuild of reference ``spec/models/hmr.py:28-122``: backbone -> HMRHead
(optionally conditioned on the CamCalib camera) -> SMPL(Cam) projection
head. One jitted graph end-to-end; the SMPL tensors ride along as a pytree
argument so the module stays stateless w.r.t. the body model.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from spec_tpu.core.smpl import SMPLAssets
from spec_tpu.models import backbones as B
from spec_tpu.models.heads.hmr_head import (
    HMRHead,
    convert_torch_hmr_head_params,
)
from spec_tpu.models.heads.smpl_head import smpl_cam_head, smpl_head


class HMR(nn.Module):
    """Composite SPEC network.

    Attributes:
      backbone: resnet50 (default) / hrnet_w32-conv / ... (reference
        ``spec/models/hmr.py:44-53``).
      use_cam: project with the full estimated camera (SMPLCamHead path).
      use_cam_feats: feed (cam_rotmat, vfov) into the HMR head.
      focal_length / img_res: crop-camera constants for the non-cam path.
    """

    backbone: str = 'resnet50'
    use_cam: bool = True
    use_cam_feats: bool = False
    focal_length: float = 5000.0
    img_res: int = 224
    dtype: Any = jnp.float32
    mean_params: Optional[dict] = None
    # Rematerialize backbone blocks in the backward pass (TRAINING.REMAT):
    # a memory knob for fitting larger batches/trunks, numerically
    # identical. Measured on-chip as a THROUGHPUT NEGATIVE at the B=128
    # sweet spot (the step is HBM-bandwidth-bound; see CLAUDE.md) — use
    # only when memory-capacity-bound.
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        smpl_assets: SMPLAssets,
        images: jnp.ndarray,
        cam_rotmat: Optional[jnp.ndarray] = None,
        cam_intrinsics: Optional[jnp.ndarray] = None,
        bbox_scale: Optional[jnp.ndarray] = None,
        bbox_center: Optional[jnp.ndarray] = None,
        img_w: Optional[jnp.ndarray] = None,
        img_h: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> dict:
        """Args:
          images: (B, 224, 224, 3) normalized person crops (NHWC).
          cam_rotmat: (B, 3, 3); cam_intrinsics: (B, 3, 3);
          bbox_scale: (B,); bbox_center: (B, 2); img_w/img_h: (B,) —
          required when ``use_cam`` or ``use_cam_feats``.
        Returns:
          dict with pred_pose (B,24,3,3), pred_shape, pred_cam,
          smpl_vertices, smpl_joints3d, smpl_joints2d, pred_cam_t.
        """
        trunk = B.get_backbone(self.backbone, dtype=self.dtype,
                               remat=self.remat)
        features = trunk(images, train=train)

        head = HMRHead(
            use_cam_feats=self.use_cam_feats,
            dtype=self.dtype,
            mean_params=self.mean_params,
            name='head',
        )
        if self.use_cam_feats:
            # vfov from intrinsics: 2 atan(H / 2 fx) — fx, matching the
            # reference (spec/models/hmr.py:95, cam_intrinsics[:,0,0]).
            # fy would be the geometrically correct vertical FOV when
            # fx != fy, but released SPEC checkpoints were trained with
            # the fx-derived conditioning input, so checkpoint parity
            # wins (ADVICE r1).
            cam_vfov = 2.0 * jnp.arctan(
                img_h.astype(jnp.float32)
                / (2.0 * cam_intrinsics[:, 0, 0]))
            hmr_out = head(features, cam_rotmat=cam_rotmat,
                           cam_vfov=cam_vfov, train=train)
        else:
            hmr_out = head(features, train=train)

        if self.use_cam:
            smpl_out = smpl_cam_head(
                smpl_assets,
                rotmat=hmr_out['pred_pose'],
                shape=hmr_out['pred_shape'],
                cam=hmr_out['pred_cam'],
                cam_rotmat=cam_rotmat,
                cam_intrinsics=cam_intrinsics,
                bbox_scale=bbox_scale,
                bbox_center=bbox_center,
                img_w=img_w,
                img_h=img_h,
                crop_res=self.img_res,
                normalize_joints2d=False,
            )
        else:
            smpl_out = smpl_head(
                smpl_assets,
                rotmat=hmr_out['pred_pose'],
                shape=hmr_out['pred_shape'],
                cam=hmr_out['pred_cam'],
                focal_length=self.focal_length,
                img_res=self.img_res,
                normalize_joints2d=True,
            )
        smpl_out.update(hmr_out)
        return smpl_out


def convert_torch_hmr_params(
    state_dict: dict, backbone: str = 'resnet50', prefix: str = ''
) -> dict:
    """Convert a torch SPEC/HMR state_dict to flax variables.

    Handles the reference's checkpoint dialects (SURVEY.md §5.4): lightning
    ``model.``-prefixed keys (pass ``prefix='model.'``), plain
    ``backbone.* / head.*`` layouts, and SPIN ``model_checkpoint.pt['model']``
    contents passed directly.
    """
    sd = {k[len(prefix):]: np.asarray(v) for k, v in state_dict.items()
          if k.startswith(prefix)}

    # SPIN model_checkpoint.pt stores the HMR flat: torchvision resnet
    # keys and fc1/fc2/dec* head keys with NO backbone./head. prefixes.
    # Detect and synthesize the prefixes so one code path handles all
    # dialects.
    if not any(k.startswith(('backbone.', 'head.')) for k in sd):
        head_names = ('fc1.', 'fc2.', 'decpose.', 'decshape.', 'deccam.',
                      'drop1.', 'drop2.', 'init_pose', 'init_shape',
                      'init_cam')
        sd = {(('head.' if k.startswith(head_names) else 'backbone.') + k): v
              for k, v in sd.items()}

    arch = backbone.split('-')[0]
    if arch.startswith('hrnet'):
        trunk_vars = B.convert_torch_hrnet_params(
            sd, arch=arch, prefix='backbone.')
        trunk_name = 'HRNet_0'
    else:
        trunk_vars = B.convert_torch_resnet_params(
            sd, arch=arch, prefix='backbone.')
        trunk_name = 'ResNet_0'
    head_params = convert_torch_hmr_head_params(sd, prefix='head.')

    return {
        'params': {trunk_name: trunk_vars['params'], 'head': head_params},
        'batch_stats': {trunk_name: trunk_vars['batch_stats']},
    }
