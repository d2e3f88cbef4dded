"""HRNet-W32/W48 backbones (flax, NHWC).

Rebuild of the PARE HRNet variants the reference selects with
``backbone='hrnet_w32-conv' / 'hrnet_w48-interp'`` (reference
``spec/models/hmr.py:44-51``): the official HRNet classification trunk
(stem -> bottleneck layer1 -> 3 multi-resolution stages with exchange
fusion), returning the four branch maps concatenated at 1/32 resolution —
480 channels for W32 (32+64+128+256), 720 for W48 — matching
``get_backbone_info`` (SURVEY.md §2.2 row 1).

``downsample`` flavors (the ``-conv`` / ``-interp`` suffix):
  * interp: bilinear-resize every branch to the lowest resolution, concat;
  * conv: chains of stride-2 3x3 conv+BN+ReLU per branch, then concat.

The graph matches the official torch HRNet (same block structure, fuse
layers with 1x1-conv+upsample upward and repeated 3x3-stride-2 downward),
so :func:`convert_torch_hrnet_params` maps official state_dicts
one-to-one. Fusion upsampling uses nearest-neighbor like the original.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from spec_tpu.models.backbones.resnet import (
    BasicBlock,
    Bottleneck,
    TorchConv,
    _bn,
)

HRNET_CONFIGS = {
    'hrnet_w32': {
        'stage2': dict(num_modules=1, num_branches=2, num_blocks=(4, 4),
                       num_channels=(32, 64)),
        'stage3': dict(num_modules=4, num_branches=3, num_blocks=(4, 4, 4),
                       num_channels=(32, 64, 128)),
        'stage4': dict(num_modules=3, num_branches=4,
                       num_blocks=(4, 4, 4, 4),
                       num_channels=(32, 64, 128, 256)),
    },
    'hrnet_w48': {
        'stage2': dict(num_modules=1, num_branches=2, num_blocks=(4, 4),
                       num_channels=(48, 96)),
        'stage3': dict(num_modules=4, num_branches=3, num_blocks=(4, 4, 4),
                       num_channels=(48, 96, 192)),
        'stage4': dict(num_modules=3, num_branches=4,
                       num_blocks=(4, 4, 4, 4),
                       num_channels=(48, 96, 192, 384)),
    },
}


def _upsample_nearest(x, factor):
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (B, H, factor, W, factor, C))
    return x.reshape(B, H * factor, W * factor, C)


class FuseLayer(nn.Module):
    """Exchange unit input j -> output i."""

    i: int
    j: int
    channels: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        i, j = self.i, self.j
        if j == i:
            return x
        if j > i:  # upsample: 1x1 conv to C_i, then nearest x2^(j-i)
            x = TorchConv(self.channels[i], 1, 1, 0, dtype=self.dtype,
                          name='conv')(x)
            x = _bn(self.dtype, 'bn')(x, use_running_average=not train)
            return _upsample_nearest(x, 2 ** (j - i))
        # j < i: (i - j) stride-2 3x3 convs; ReLU between, none after last.
        for k in range(i - j):
            last = k == i - j - 1
            out_ch = self.channels[i] if last else self.channels[j]
            x = TorchConv(out_ch, 3, 2, 1, dtype=self.dtype,
                          name=f'conv{k}')(x)
            x = _bn(self.dtype, f'bn{k}')(x, use_running_average=not train)
            if not last:
                x = nn.relu(x)
        return x


class HighResolutionModule(nn.Module):
    num_branches: int
    num_blocks: Sequence[int]
    channels: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train=False):
        # Per-branch residual blocks.
        feats = []
        for b in range(self.num_branches):
            x = inputs[b]
            for k in range(self.num_blocks[b]):
                x = BasicBlock(self.channels[b], 1, False, self.dtype,
                               name=f'branch{b}_block{k}')(x, train=train)
            feats.append(x)
        # Full exchange.
        outs = []
        for i in range(self.num_branches):
            acc = None
            for j in range(self.num_branches):
                y = FuseLayer(i, j, self.channels, self.dtype,
                              name=f'fuse_{i}_{j}')(feats[j], train=train)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


class Transition(nn.Module):
    """Adapt the previous stage's branches to the next stage's widths and
    spawn the new lowest-resolution branch."""

    prev_channels: Sequence[int]
    channels: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train=False):
        outs = []
        for i, c in enumerate(self.channels):
            if i < len(inputs):
                if inputs[i].shape[-1] != c:
                    x = TorchConv(c, 3, 1, 1, dtype=self.dtype,
                                  name=f't{i}_conv')(inputs[i])
                    x = _bn(self.dtype, f't{i}_bn')(
                        x, use_running_average=not train)
                    outs.append(nn.relu(x))
                else:
                    outs.append(inputs[i])
            else:
                x = TorchConv(c, 3, 2, 1, dtype=self.dtype,
                              name=f't{i}_conv')(inputs[-1])
                x = _bn(self.dtype, f't{i}_bn')(
                    x, use_running_average=not train)
                outs.append(nn.relu(x))
        return outs


class HRNet(nn.Module):
    arch: str = 'hrnet_w32'
    use_conv_downsample: bool = False
    dtype: Any = jnp.float32
    # Rematerialize each exchange module in the backward pass — a MEMORY
    # knob (TRAINING.REMAT), numerically identical; see ResNet.remat.
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = HRNET_CONFIGS[self.arch]
        module_cls = HighResolutionModule
        if self.remat:
            module_cls = nn.remat(HighResolutionModule, static_argnums=(2,))
        x = x.astype(self.dtype)

        # Stem: two stride-2 3x3 convs.
        x = TorchConv(64, 3, 2, 1, dtype=self.dtype, name='conv1')(x)
        x = _bn(self.dtype, 'bn1')(x, use_running_average=not train)
        x = nn.relu(x)
        x = TorchConv(64, 3, 2, 1, dtype=self.dtype, name='conv2')(x)
        x = _bn(self.dtype, 'bn2')(x, use_running_average=not train)
        x = nn.relu(x)

        # layer1: 4 bottlenecks, 64 -> 256.
        for k in range(4):
            x = Bottleneck(64, 1, downsample=(k == 0), dtype=self.dtype,
                           name=f'layer1_{k}')(x, train=train)

        feats = [x]
        prev_channels = [256]
        for stage_name in ('stage2', 'stage3', 'stage4'):
            scfg = cfg[stage_name]
            feats = Transition(prev_channels, scfg['num_channels'],
                               self.dtype, name=f'transition_{stage_name}')(
                feats, train=train)
            for m in range(scfg['num_modules']):
                feats = module_cls(
                    scfg['num_branches'], scfg['num_blocks'],
                    scfg['num_channels'], self.dtype,
                    name=f'{stage_name}_m{m}')(feats, train)
            prev_channels = list(scfg['num_channels'])

        # Downsample head: everything to the lowest (1/32) resolution.
        target_hw = feats[-1].shape[1:3]
        outs = []
        for b, f in enumerate(feats):
            steps = int(np.log2(f.shape[1] // target_hw[0]))
            if steps == 0:
                outs.append(f)
            elif self.use_conv_downsample:
                y = f
                for k in range(steps):
                    y = TorchConv(f.shape[-1], 3, 2, 1, dtype=self.dtype,
                                  name=f'down{b}_conv{k}')(y)
                    y = _bn(self.dtype, f'down{b}_bn{k}')(
                        y, use_running_average=not train)
                    y = nn.relu(y)
                outs.append(y)
            else:
                # antialias=False matches torch F.interpolate(bilinear,
                # align_corners=False) downsampling.
                outs.append(jax.image.resize(
                    f, f.shape[:1] + target_hw + f.shape[-1:],
                    method='bilinear', antialias=False))
        return jnp.concatenate(outs, axis=-1)


def get_hrnet(name: str, use_conv: bool = False, dtype=None, **kwargs):
    if dtype is not None:
        kwargs['dtype'] = dtype
    return HRNet(arch=name, use_conv_downsample=use_conv, **kwargs)


# ---------------------------------------------------------------------------
# Torch checkpoint conversion (official HRNet classification naming)
# ---------------------------------------------------------------------------


def convert_torch_hrnet_params(state_dict: dict, arch: str = 'hrnet_w32',
                               prefix: str = '') -> dict:
    """Convert an official-naming HRNet state_dict to this module's
    variables. Trunk keys (conv1/bn1/conv2/bn2, layer1.{k}.*,
    transition{s}.{i}.*, stage{s}.{m}.branches.{b}.{k}.*,
    stage{s}.{m}.fuse_layers.{i}.{j}.*) map one-to-one; the PARE-specific
    conv-downsample head (not part of the official trunk) keeps this
    module's init when absent from the checkpoint."""
    from spec_tpu.models.backbones.resnet import _conv_w

    sd = {k[len(prefix):]: np.asarray(v) for k, v in state_dict.items()
          if k.startswith(prefix)}
    cfg = HRNET_CONFIGS[arch]
    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(leaf)

    def bn(tname, fpath):
        put(params, fpath + ('scale',), sd[f'{tname}.weight'])
        put(params, fpath + ('bias',), sd[f'{tname}.bias'])
        put(stats, fpath + ('mean',), sd[f'{tname}.running_mean'])
        put(stats, fpath + ('var',), sd[f'{tname}.running_var'])

    def conv(tname, fpath):
        put(params, fpath + ('conv', 'kernel'), _conv_w(sd[f'{tname}.weight']))

    conv('conv1', ('conv1',))
    bn('bn1', ('bn1',))
    conv('conv2', ('conv2',))
    bn('bn2', ('bn2',))

    for k in range(4):
        base = f'layer1.{k}'
        f = f'layer1_{k}'
        for ci in (1, 2, 3):
            conv(f'{base}.conv{ci}', (f, f'conv{ci}'))
            bn(f'{base}.bn{ci}', (f, f'bn{ci}'))
        if f'{base}.downsample.0.weight' in sd:
            conv(f'{base}.downsample.0', (f, 'downsample_conv'))
            bn(f'{base}.downsample.1', (f, 'downsample_bn'))

    for si, stage_name in enumerate(('stage2', 'stage3', 'stage4'),
                                    start=2):
        scfg = cfg[stage_name]
        tname = f'transition{si - 1}'
        fname = f'transition_{stage_name}'
        for i in range(scfg['num_branches']):
            # official: transition{s}.{i}.0 = conv, .1 = bn (new branch is
            # nested one deeper: .{i}.0.0 / .0.1)
            if f'{tname}.{i}.0.weight' in sd:
                conv(f'{tname}.{i}.0', (fname, f't{i}_conv'))
                bn(f'{tname}.{i}.1', (fname, f't{i}_bn'))
            elif f'{tname}.{i}.0.0.weight' in sd:
                conv(f'{tname}.{i}.0.0', (fname, f't{i}_conv'))
                bn(f'{tname}.{i}.0.1', (fname, f't{i}_bn'))

        for m in range(scfg['num_modules']):
            mbase = f'stage{si}.{m}'
            mname = f'{stage_name}_m{m}'
            for b in range(scfg['num_branches']):
                for k in range(scfg['num_blocks'][b]):
                    base = f'{mbase}.branches.{b}.{k}'
                    f = (mname, f'branch{b}_block{k}')
                    for ci in (1, 2):
                        conv(f'{base}.conv{ci}', f + (f'conv{ci}',))
                        bn(f'{base}.bn{ci}', f + (f'bn{ci}',))
            for i in range(scfg['num_branches']):
                for j in range(scfg['num_branches']):
                    if i == j:
                        continue
                    base = f'{mbase}.fuse_layers.{i}.{j}'
                    f = (mname, f'fuse_{i}_{j}')
                    if j > i:
                        conv(f'{base}.0', f + ('conv',))
                        bn(f'{base}.1', f + ('bn',))
                    else:
                        for k in range(i - j):
                            conv(f'{base}.{k}.0', f + (f'conv{k}',))
                            bn(f'{base}.{k}.1', f + (f'bn{k}',))

    return {'params': params, 'batch_stats': stats}
