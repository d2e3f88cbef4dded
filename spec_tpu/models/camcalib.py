"""CamCalib: single-image camera regressor (flax).

TPU-native rebuild of the reference's ``CameraRegressorNetwork``
(``camcalib/model.py:24-81``): a ResNet trunk, global average pooling, and
three parallel FC stacks emitting 256 logits each for the vfov / pitch /
roll bin distributions (decoded by :mod:`spec_tpu.core.bins`).

Differences from the reference are deliberate TPU choices: NHWC layout,
batched jit inference (the reference demo runs batch 1 per image,
``scripts/camcalib_demo.py:95-100``), and decode-on-device.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from spec_tpu.models import backbones as B


class CameraRegressorNetwork(nn.Module):
    """Backbone + avgpool + 3 parallel bin heads.

    Attributes:
      backbone: resnet18/34/50/... (reference default resnet34 for training
        cfg ``camcalib/config.py:45``; the released ckpt is resnet50,
        ``scripts/camcalib_demo.py:74-78``).
      num_fc_layers: 1 = a single Linear per head (init N(0, 0.01), bias 0);
        >1 = a stack Linear(C->num_fc_channels) ... Linear(->256).
      num_fc_channels: hidden width of multi-layer heads.
      num_out_channels: logits per head (256 bins).
    """

    backbone: str = 'resnet50'
    num_fc_layers: int = 1
    num_fc_channels: int = 1024
    num_out_channels: int = 256
    dtype: Any = jnp.float32

    def _head(self, name: str):
        layers = []
        kinit = nn.initializers.normal(stddev=0.01)
        if self.num_fc_layers == 1:
            return [nn.Dense(
                self.num_out_channels, kernel_init=kinit,
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                param_dtype=jnp.float32, name=f'{name}_0')]
        for i in range(self.num_fc_layers):
            width = (self.num_out_channels if i == self.num_fc_layers - 1
                     else self.num_fc_channels)
            layers.append(nn.Dense(
                width, dtype=self.dtype, param_dtype=jnp.float32,
                name=f'{name}_{i}'))
        return layers

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        """Args:
          images: (B, H, W, 3) ImageNet-normalized.
        Returns:
          (vfov_logits, pitch_logits, roll_logits), each (B, 256).
        """
        trunk = B.get_backbone(self.backbone, dtype=self.dtype)
        feats = trunk(images, train=train)          # (B, h, w, C)
        x = jnp.mean(feats, axis=(1, 2))             # adaptive avgpool (1,1)

        outs = []
        for name in ('fc_vfov', 'fc_pitch', 'fc_roll'):
            y = x
            for layer in self._head(name):
                y = layer(y)
            outs.append(y.astype(jnp.float32))
        return tuple(outs)


def convert_torch_camcalib_params(
    state_dict: dict, backbone: str = 'resnet50', num_fc_layers: int = 1,
    prefix: str = '',
) -> dict:
    """Convert a torch CameraRegressorNetwork state_dict (optionally
    lightning ``model.``-prefixed; reference ckpt loading
    ``scripts/camcalib_demo.py:80-81``) to flax variables.

    Torch layout: ``backbone.*`` (torchvision resnet keys) and
    ``fc_{vfov,pitch,roll}.weight/.bias`` (1 layer) or
    ``fc_{vfov,pitch,roll}.{i}.weight/.bias`` (Sequential).
    """
    sd = {k[len(prefix):]: np.asarray(v) for k, v in state_dict.items()
          if k.startswith(prefix)}

    trunk_vars = B.convert_torch_resnet_params(
        sd, arch=backbone.split('-')[0], prefix='backbone.')

    # flax nests the (anonymous) backbone submodule under its class-derived
    # name: the first child module instantiated in __call__.
    trunk_name = 'ResNet_0'
    params = {trunk_name: trunk_vars['params']}
    stats = {trunk_name: trunk_vars['batch_stats']}

    detected = 1 if 'fc_vfov.weight' in sd else 0
    for head in ('fc_vfov', 'fc_pitch', 'fc_roll'):
        if f'{head}.weight' in sd:  # single Linear
            params[f'{head}_0'] = {
                'kernel': jnp.asarray(sd[f'{head}.weight'].T),
                'bias': jnp.asarray(sd[f'{head}.bias']),
            }
        else:  # Sequential stack
            i = 0
            while f'{head}.{i}.weight' in sd:
                params[f'{head}_{i}'] = {
                    'kernel': jnp.asarray(sd[f'{head}.{i}.weight'].T),
                    'bias': jnp.asarray(sd[f'{head}.{i}.bias']),
                }
                i += 1
            if head == 'fc_vfov':
                detected = i
    # The head layout is DETECTED from the checkpoint keys;
    # num_fc_layers only cross-checks the caller's expectation.
    if detected and detected != num_fc_layers:
        print(f'[camcalib] NOTE: checkpoint has {detected} fc layer(s) '
              f'per head; caller requested num_fc_layers={num_fc_layers} '
              '— using the checkpoint layout')
    return {'params': params, 'batch_stats': stats}
