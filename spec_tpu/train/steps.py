"""Jitted train/eval step factories for SPEC and CamCalib.

Replaces the Lightning ``training_step`` hooks (reference
``spec/trainer.py:141-176``, ``camcalib/trainer.py:60-82``) with pure
functions ``state, batch -> state, metrics`` compiled once under pjit.
GT SMPL meshes are produced inside the step on device (the reference runs
GT SMPL on the GPU per training step at ``spec/trainer.py:149-155`` and on
the CPU per *sample* during eval — the single biggest throughput bug the
TPU rebuild removes, SURVEY.md §3.3).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from spec_tpu.core.smpl import SMPLAssets, smpl_forward
from spec_tpu.losses import HMRLossConfig, camera_regressor_loss, hmr_cam_loss
# Eager top-level import: loss_fn below references this inside a jitted
# body, and a first import under the trace would leak any module-level
# jnp constants as tracers (CLAUDE.md; bins.py bit this).
from spec_tpu.ops.preprocess import device_jitter_normalize
from spec_tpu.train.state import TrainState


def make_spec_train_step(
    model,
    assets: SMPLAssets,
    tx: optax.GradientTransformation,
    loss_cfg: HMRLossConfig = HMRLossConfig(),
) -> Callable:
    """Build the SPEC training step.

    Batch contract (all device arrays, leading dim B):
      img (B,224,224,3 NHWC normalized), pose (B,72 aa), betas (B,10),
      pose_conf (B,24), pose_3d (B,24,4), keypoints_orig (B,49,3),
      has_smpl (B,), has_pose_3d (B,), orig_shape (B,2 H,W), scale (B,),
      center (B,2), cam_rotmat (B,3,3), cam_intrinsics (B,3,3).
    Training teacher-forces the GT camera (reference
    ``spec/trainer.py:164``).
    """

    def loss_fn(params, batch_stats, batch, rng):
        variables = {'params': params, 'batch_stats': batch_stats}
        img_h = batch['orig_shape'][:, 0].astype(jnp.float32)
        img_w = batch['orig_shape'][:, 1].astype(jnp.float32)

        # GT mesh on device, inside the step (one batched LBS).
        gt_out = smpl_forward(
            assets,
            betas=batch['betas'],
            body_pose=batch['pose'][:, 3:].reshape(-1, 23, 3),
            global_orient=batch['pose'][:, :3].reshape(-1, 1, 3),
            pose2rot=True,
        )

        out, new_model_state = model.apply(
            variables, assets, batch['img'],
            batch['cam_rotmat'], batch['cam_intrinsics'],
            batch['scale'], batch['center'], img_w, img_h,
            train=True, mutable=['batch_stats'],
            rngs={'dropout': rng},
        )
        gt = dict(batch, vertices=gt_out.vertices)
        total, loss_dict = hmr_cam_loss(out, gt, loss_cfg)
        return total, (loss_dict, new_model_state['batch_stats'])

    def train_step(state: TrainState, batch: dict, rng) -> tuple:
        (total, (loss_dict, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return new_state, loss_dict

    return train_step


def make_camcalib_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_type: str = 'softargmax_biased_l2',
    vfov_loss_weight: float = 1.0,
    pitch_loss_weight: float = 1.0,
    roll_loss_weight: float = 1.0,
) -> Callable:
    """CamCalib training step. Batch: img (B,H,W,3), vfov/pitch/roll targets
    (bin indices for ce/kl, soft indices for softargmax losses — reference
    ``camcalib/pano_dataset.py:135-142``). Per-angle loss weights mirror
    MODEL.LOSS_{VFOV,PITCH,ROLL}_WEIGHT (reference camcalib/config.py:84-86;
    the released recipe trains with all three at 10.0)."""

    def loss_fn(params, batch_stats, batch):
        img = batch['img']
        if 'jitter_A' in batch:
            # DATASET.DEVICE_JITTER: raw uint8 frames + per-image
            # ColorJitter affines — jitter/clip/normalize fuse into the
            # conv input processing on device (4x less upload; the pad
            # mask is rebuilt on device from true_shape, 8 bytes/sample)
            img = device_jitter_normalize(
                img, batch['jitter_A'], batch['jitter_b'],
                batch.get('true_shape'))
        out, new_model_state = model.apply(
            {'params': params, 'batch_stats': batch_stats},
            img, train=True, mutable=['batch_stats'])
        vfov_logits, pitch_logits, roll_logits = out
        total, loss_dict = camera_regressor_loss(
            vfov_logits, pitch_logits, roll_logits,
            batch['vfov'], batch['pitch'], batch['roll'],
            loss_type=loss_type,
            vfov_loss_weight=vfov_loss_weight,
            pitch_loss_weight=pitch_loss_weight,
            roll_loss_weight=roll_loss_weight)
        return total, (loss_dict, new_model_state['batch_stats'])

    def train_step(state: TrainState, batch: dict) -> tuple:
        (_, (loss_dict, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_state = TrainState(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return new_state, loss_dict

    return train_step
