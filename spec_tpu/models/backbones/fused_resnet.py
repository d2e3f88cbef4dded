"""Inference-fused ResNet trunk (Bottleneck archs) for TPU.

Functional twin of :class:`spec_tpu.models.backbones.resnet.ResNet`
`.apply(..., train=False)` that consumes the SAME flax variables but
executes the bandwidth-bound identity blocks through the fused Pallas
kernel (:mod:`spec_tpu.ops.pallas.bottleneck`) and folds every
BatchNorm into its conv. Stem, stride-2 and projection blocks stay on
XLA convs (their traffic is small and XLA schedules them well).

This exists as a separate functional path (rather than a flag inside the
flax module) so the training graph stays pure flax and the inference
engine is independently parity-tested against it
(``tests/test_fused_resnet.py``).

Reference scope: the backbones the reference pulls from PARE at
``spec/models/hmr.py:44-53`` / ``camcalib/model.py:33-37``; ResNet-50 is
both released checkpoints' trunk.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from spec_tpu.ops.pallas.bottleneck import fold_bn, fused_bottleneck_chain

_STAGES = {
    'resnet50': (3, 4, 6, 3),
    'resnet101': (3, 4, 23, 3),
    'resnet152': (3, 8, 36, 3),
}

# Per-stage fusion policy: (max chain length, row tile). Measured on a
# v5e chip at the bench shape (B=128, 512x672, bf16):
#   * XLA's conv emitter runs the flax blocks at ~90% HBM utilization;
#     the Pallas chain only wins standalone at stage 0 (M=64,
#     bandwidth-bound: chain(2) 11.9 ms vs 15.2 ms) and loses at deeper
#     compute-bound stages (layer2 chain(3) 17.6 ms vs 11.1 ms).
#   * In-graph, XLA lays conv activations out as {3,0,2,1} (batch on
#     sublanes) while Mosaic custom-calls require default {3,2,1,0};
#     each kernel boundary costs two full-tensor relayout copies, which
#     erases the stage-0 margin.
# Net: every stage defaults to the folded-XLA path (identical speed to
# the flax trunk, 76 ms). The chain kernel stays available for shapes
# where fusion pays (set a stage to (K, rt) to re-enable).
_POLICY = {0: (0, 16), 1: (0, 16), 2: (0, 8), 3: (0, 16)}


def _conv(x, kernel, bias, stride, pad, dtype):
    """Folded conv+bias in the compute dtype (bf16 epilogue like flax's
    BatchNorm-in-bf16 path — fp32 epilogues materialize fp32 copies of
    the full activation map, measured +10ms on the 512x672 trunk)."""
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), (stride, stride),
        ((pad, pad), (pad, pad)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y + bias.astype(dtype)


def _folded(params, stats, conv_name, bn_name, eps=1e-5):
    return fold_bn(
        params[conv_name]['conv']['kernel'],
        params[bn_name]['scale'], params[bn_name]['bias'],
        stats[bn_name]['mean'], stats[bn_name]['var'], eps)


def fused_resnet_apply(
    variables: dict,
    x: jnp.ndarray,
    arch: str = 'resnet50',
    compute_dtype: Any = jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """ResNet trunk forward, inference only. -> (B, H/32, W/32, C_out).

    Args:
      variables: the flax ResNet variables ({'params', 'batch_stats'}).
      x: (B, H, W, 3) normalized images (fp32 or bf16).
      interpret: run the Pallas blocks in interpret mode (CPU tests).
    """
    if arch not in _STAGES:
        raise ValueError(
            f'fused trunk supports Bottleneck archs {sorted(_STAGES)}, '
            f'got {arch!r}')
    params = variables['params']
    stats = variables['batch_stats']
    dt = compute_dtype

    # Stem: 7x7/2 + folded BN + relu + 3x3/2 maxpool.
    k, b = _folded(params, stats, 'conv1', 'bn1')
    y = jax.nn.relu(_conv(x, k, b, 2, 3, dt)).astype(dt)
    y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                constant_values=-jnp.inf)
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), 'VALID')

    for stage, num_blocks in enumerate(_STAGES[arch]):
        stride = 1 if stage == 0 else 2
        max_chain, row_tile = _POLICY[stage]

        # Projection block: three XLA convs + projection shortcut.
        p = params[f'layer{stage + 1}_0']
        s = stats[f'layer{stage + 1}_0']
        k1, b1 = _folded(p, s, 'conv1', 'bn1')
        k2, b2 = _folded(p, s, 'conv2', 'bn2')
        k3, b3 = _folded(p, s, 'conv3', 'bn3')
        kd, bd = _folded(p, s, 'downsample_conv', 'downsample_bn')
        h = jax.nn.relu(_conv(y, k1, b1, 1, 0, dt))
        h = jax.nn.relu(_conv(h, k2, b2, stride, 1, dt))
        h = _conv(h, k3, b3, 1, 0, dt)
        idn = _conv(y, kd, bd, stride, 0, dt)
        y = jax.nn.relu(h + idn).astype(dt)

        # Identity blocks: folded weights, chained through the Pallas
        # kernel in VMEM-sized groups (or XLA when the policy says 0).
        folded = []
        for blk in range(1, num_blocks):
            p = params[f'layer{stage + 1}_{blk}']
            s = stats[f'layer{stage + 1}_{blk}']
            k1, b1 = _folded(p, s, 'conv1', 'bn1')
            k2, b2 = _folded(p, s, 'conv2', 'bn2')
            k3, b3 = _folded(p, s, 'conv3', 'bn3')
            m = k1.shape[-1]
            folded.append((k1.reshape(-1, m), b1, k2.reshape(9, m, m), b2,
                           k3.reshape(m, -1), b3))
        if max_chain == 0:
            for (k1, b1, k2, b2, k3, b3) in folded:
                m = k1.shape[-1]
                h = jax.nn.relu(_conv(y, k1.reshape(1, 1, -1, m),
                                      b1, 1, 0, dt))
                h = jax.nn.relu(_conv(h, k2.reshape(3, 3, m, m),
                                      b2, 1, 1, dt))
                h = _conv(h, k3.reshape(1, 1, m, -1), b3, 1, 0, dt)
                y = jax.nn.relu(h + y).astype(dt)
        else:
            for i in range(0, len(folded), max_chain):
                chain = tuple(folded[i:i + max_chain])
                y = fused_bottleneck_chain(
                    y.astype(dt), chain, interpret=interpret,
                    row_tile=row_tile)
    return y
