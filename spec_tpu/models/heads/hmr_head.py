"""HMR/SPIN iterative SMPL-parameter regressor head (flax).

Re-derivation of the external ``pare.models.head.HMRHead`` consumed by the
reference at ``spec/models/hmr.py:22,57-64,94-98``. Semantics (from the call
sites + the published SPIN/HMR architecture the PARE head extends):

  * input: backbone feature map, global-avgpooled to a (B, C) vector;
  * learned initial estimate buffers ``init_pose`` (1, 144 = 24 joints x 6D
    rotation), ``init_shape`` (1, 10), ``init_cam`` (1, 3) — loaded from the
    SMPL mean-params file or patched into checkpoints (reference
    ``scripts/spec_train.py:86-90``);
  * ``n_iter`` refinement steps: concat [features, pose, shape, cam
    (+ flattened 3x3 camera rotmat and vfov scalar when ``use_cam_feats``,
    reference ``spec/models/hmr.py:94-96``)] -> fc1(1024) -> dropout ->
    fc2(1024) -> dropout -> three linear decoders emitting additive deltas;
  * output: ``pred_pose`` as (B, 24, 3, 3) rotmats via 6D->rotmat,
    ``pred_shape`` (B, 10), ``pred_cam`` (B, 3), plus the raw 6D pose.

TPU notes: the 3-step refinement is a static Python loop (unrolls into one
XLA graph — three fused (B, ~2200) x (2200, 1024) matmuls); everything is
batched; dropout is driven by an explicit rng for determinism.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from spec_tpu.core.geometry import rot6d_to_rotmat

NPOSE = 24 * 6


def default_init_params() -> dict:
    """Identity-rotation mean params used when no mean-params file is given.

    Real runs should load the SPIN ``smpl_mean_params.npz`` via
    :func:`load_smpl_mean_params` (the reference ships it in ``data/``);
    converted checkpoints carry the trained buffers anyway.
    """
    pose = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), 24)[None]
    return {
        'init_pose': pose,                                   # (1, 144)
        'init_shape': np.zeros((1, 10), np.float32),
        'init_cam': np.array([[0.9, 0.0, 0.0]], np.float32),
    }


def load_smpl_mean_params(path: str) -> dict:
    """Read the SPIN-format mean params npz: pose (144,) 6D, shape (10,),
    cam (3,)."""
    data = np.load(path)
    return {
        'init_pose': np.asarray(data['pose'], np.float32).reshape(1, NPOSE),
        'init_shape': np.asarray(
            data['shape'], np.float32).reshape(1, 10),
        'init_cam': np.asarray(data['cam'], np.float32).reshape(1, 3),
    }


class HMRHead(nn.Module):
    """Iterative regressor head.

    Attributes:
      use_cam_feats: condition on (cam_rotmat, cam_vfov) — the SPEC variant.
      n_iter: refinement iterations (3, the SPIN/HMR standard).
      hidden_dim: width of the two FC layers.
      dropout_rate: train-time dropout on both FC layers.
      mean_params: optional dict overriding the init buffers at init time.
    """

    use_cam_feats: bool = False
    estimate_var: bool = False
    n_iter: int = 3
    hidden_dim: int = 1024
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32
    mean_params: Optional[dict] = None

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,
        cam_rotmat: Optional[jnp.ndarray] = None,
        cam_vfov: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> dict:
        """Args:
          features: (B, H, W, C) backbone map or pre-pooled (B, C).
          cam_rotmat: (B, 3, 3), required when ``use_cam_feats``.
          cam_vfov: (B,), required when ``use_cam_feats``.
        """
        if features.ndim == 4:
            xf = jnp.mean(features, axis=(1, 2))  # global average pool
        else:
            xf = features
        xf = xf.astype(self.dtype)
        B = xf.shape[0]

        mean = self.mean_params or default_init_params()
        init_pose = self.param(
            'init_pose', lambda _: jnp.asarray(mean['init_pose']))
        init_shape = self.param(
            'init_shape', lambda _: jnp.asarray(mean['init_shape']))
        init_cam = self.param(
            'init_cam', lambda _: jnp.asarray(mean['init_cam']))

        fc1 = nn.Dense(self.hidden_dim, dtype=self.dtype,
                       param_dtype=jnp.float32, name='fc1')
        fc2 = nn.Dense(self.hidden_dim, dtype=self.dtype,
                       param_dtype=jnp.float32, name='fc2')
        # Decoder init = xavier_uniform(gain=0.01), the reference's
        # (SPIN/PARE hmr_head) nn.init.xavier_uniform_(w, gain=0.01):
        # the iterative residual updates must start NEAR ZERO so a
        # random-init model predicts ~the mean params. Flax's default
        # lecun init makes iteration-0 cam offsets O(1), which drives
        # s negative and overflows the exp(-10 s)^2 cam regularizer
        # (observed: loss 4e35, frozen training). gain g -> variance
        # scale g^2 under fan_avg/uniform.
        dec_init = nn.initializers.variance_scaling(
            1e-4, 'fan_avg', 'uniform')
        decpose = nn.Dense(NPOSE, dtype=self.dtype,
                           param_dtype=jnp.float32, name='decpose',
                           kernel_init=dec_init)
        decshape = nn.Dense(10, dtype=self.dtype,
                            param_dtype=jnp.float32, name='decshape',
                            kernel_init=dec_init)
        deccam = nn.Dense(3, dtype=self.dtype,
                          param_dtype=jnp.float32, name='deccam',
                          kernel_init=dec_init)
        drop1 = nn.Dropout(self.dropout_rate, name='drop1')
        drop2 = nn.Dropout(self.dropout_rate, name='drop2')

        pred_pose = jnp.broadcast_to(init_pose, (B, NPOSE))
        pred_shape = jnp.broadcast_to(init_shape, (B, 10))
        pred_cam = jnp.broadcast_to(init_cam, (B, 3))

        cam_feats = None
        if self.use_cam_feats:
            assert cam_rotmat is not None and cam_vfov is not None, (
                'use_cam_feats requires cam_rotmat and cam_vfov')
            cam_feats = jnp.concatenate(
                [cam_rotmat.reshape(B, 9),
                 cam_vfov.reshape(B, 1)], axis=-1).astype(self.dtype)

        # Static unroll: n_iter is 3 — one fused graph, no scan overhead.
        for _ in range(self.n_iter):
            xc = jnp.concatenate([xf, pred_pose, pred_shape, pred_cam],
                                 axis=-1)
            if cam_feats is not None:
                xc = jnp.concatenate([xc, cam_feats], axis=-1)
            xc = drop1(fc1(xc), deterministic=not train)
            xc = drop2(fc2(xc), deterministic=not train)
            pred_pose = decpose(xc) + pred_pose
            pred_shape = decshape(xc) + pred_shape
            pred_cam = deccam(xc) + pred_cam

        pred_rotmat = rot6d_to_rotmat(
            pred_pose.astype(jnp.float32).reshape(B, 24, 6))

        extra = {}
        if self.estimate_var:
            # Aleatoric-uncertainty branch (reference HMR estimate_var,
            # spec/models/hmr.py:37-39 + spec/losses.py:390-409): per-param
            # log-variances regressed from the final refinement features.
            extra['pred_pose_logvar'] = nn.Dense(
                NPOSE, dtype=self.dtype, param_dtype=jnp.float32,
                name='decpose_var')(xc).astype(jnp.float32)
            extra['pred_shape_logvar'] = nn.Dense(
                10, dtype=self.dtype, param_dtype=jnp.float32,
                name='decshape_var')(xc).astype(jnp.float32)

        return {
            **extra,
            'pred_pose': pred_rotmat,               # (B, 24, 3, 3)
            'pred_pose_6d': pred_pose.astype(jnp.float32),
            'pred_shape': pred_shape.astype(jnp.float32),
            'pred_cam': pred_cam.astype(jnp.float32),
        }


def convert_torch_hmr_head_params(
    state_dict: dict, prefix: str = '',
    mean_params: Optional[dict] = None,
) -> dict:
    """Convert a PARE/SPIN-format head state_dict to this module's params.

    Expected torch keys (optionally under ``prefix``): ``fc1/fc2/decpose/
    decshape/deccam .weight|.bias`` and the ``init_pose/init_shape/init_cam``
    buffers. Old checkpoints lack the init buffers — the reference patches
    them in before resume (``add_init_smpl_params_to_dict``,
    ``scripts/spec_train.py:86-90``); here the same fallback fills them from
    ``mean_params`` (or :func:`default_init_params`) so the converted tree
    is always complete.
    """
    sd = {k[len(prefix):]: np.asarray(v) for k, v in state_dict.items()
          if k.startswith(prefix)}
    params = {}
    for name in ('fc1', 'fc2', 'decpose', 'decshape', 'deccam'):
        params[name] = {
            'kernel': jnp.asarray(sd[f'{name}.weight'].T),
            'bias': jnp.asarray(sd[f'{name}.bias']),
        }
    fallback = mean_params or default_init_params()
    for buf in ('init_pose', 'init_shape', 'init_cam'):
        params[buf] = jnp.asarray(sd[buf] if buf in sd else fallback[buf])
    return params
