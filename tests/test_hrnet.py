"""HRNet parity: flax implementation + converter vs an independent torch
construction of the official HRNet graph (random weights)."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax.numpy as jnp

from spec_tpu.models import backbones as B
from spec_tpu.models.backbones.hrnet import (
    HRNET_CONFIGS,
    convert_torch_hrnet_params,
)
from tests.test_backbones import TorchBasic, TorchBottleneck, \
    _randomize_bn_stats


def _bn(c):
    return nn.BatchNorm2d(c)


class TorchHRModule(nn.Module):
    def __init__(self, num_branches, num_blocks, channels):
        super().__init__()
        self.num_branches = num_branches
        self.branches = nn.ModuleList([
            nn.Sequential(*[TorchBasic(channels[b], channels[b])
                            for _ in range(num_blocks[b])])
            for b in range(num_branches)])
        fuse = []
        for i in range(num_branches):
            row = []
            for j in range(num_branches):
                if j == i:
                    row.append(nn.Identity())
                elif j > i:
                    row.append(nn.Sequential(
                        nn.Conv2d(channels[j], channels[i], 1, bias=False),
                        _bn(channels[i])))
                else:
                    steps = []
                    for k in range(i - j):
                        last = k == i - j - 1
                        out_c = channels[i] if last else channels[j]
                        mods = [nn.Conv2d(channels[j] if k == 0 else
                                          channels[j], out_c, 3, 2, 1,
                                          bias=False), _bn(out_c)]
                        if not last:
                            mods.append(nn.ReLU(inplace=False))
                        steps.append(nn.Sequential(*mods))
                    row.append(nn.Sequential(*steps))
            fuse.append(nn.ModuleList(row))
        self.fuse_layers = nn.ModuleList(fuse)

    def forward(self, xs):
        feats = [self.branches[b](xs[b]) for b in range(self.num_branches)]
        outs = []
        for i in range(self.num_branches):
            acc = None
            for j in range(self.num_branches):
                y = self.fuse_layers[i][j](feats[j])
                if j > i:
                    y = F.interpolate(y, scale_factor=2 ** (j - i),
                                      mode='nearest')
                acc = y if acc is None else acc + y
            outs.append(torch.relu(acc))
        return outs


class TorchHRNet(nn.Module):
    def __init__(self, arch='hrnet_w32'):
        super().__init__()
        cfg = HRNET_CONFIGS[arch]
        self.cfg = cfg
        self.conv1 = nn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = _bn(64)
        self.conv2 = nn.Conv2d(64, 64, 3, 2, 1, bias=False)
        self.bn2 = _bn(64)
        ds = nn.Sequential(nn.Conv2d(64, 256, 1, bias=False), _bn(256))
        self.layer1 = nn.Sequential(
            TorchBottleneck(64, 64, 1, ds),
            *[TorchBottleneck(256, 64) for _ in range(3)])

        prev = [256]
        for si, sname in enumerate(('stage2', 'stage3', 'stage4'), start=2):
            scfg = cfg[sname]
            trans = []
            for i, c in enumerate(scfg['num_channels']):
                if i < len(prev):
                    if prev[i] != c:
                        trans.append(nn.Sequential(
                            nn.Conv2d(prev[i], c, 3, 1, 1, bias=False),
                            _bn(c), nn.ReLU(inplace=False)))
                    else:
                        trans.append(nn.Identity())
                else:
                    trans.append(nn.Sequential(nn.Sequential(
                        nn.Conv2d(prev[-1], c, 3, 2, 1, bias=False),
                        _bn(c), nn.ReLU(inplace=False))))
            setattr(self, f'transition{si - 1}', nn.ModuleList(trans))
            setattr(self, f'stage{si}', nn.Sequential(*[
                TorchHRModule(scfg['num_branches'], scfg['num_blocks'],
                              scfg['num_channels'])
                for _ in range(scfg['num_modules'])]))
            prev = list(scfg['num_channels'])

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        feats = [x]
        for si in (2, 3, 4):
            trans = getattr(self, f'transition{si - 1}')
            scfg = self.cfg[f'stage{si}']
            new_feats = []
            for i in range(scfg['num_branches']):
                src = feats[i] if i < len(feats) else feats[-1]
                new_feats.append(trans[i](src))
            feats = self._run_stage(si, new_feats)
        # interp downsample head
        target = feats[-1].shape[-2:]
        outs = []
        for f in feats:
            if f.shape[-2:] == target:
                outs.append(f)
            else:
                outs.append(F.interpolate(f, size=target, mode='bilinear',
                                          align_corners=False))
        return torch.cat(outs, dim=1)

    def _run_stage(self, si, feats):
        for m in getattr(self, f'stage{si}'):
            feats = m(feats)
        return feats


def test_hrnet_w32_parity(rng):
    torch.manual_seed(0)
    tm = TorchHRNet('hrnet_w32').eval()
    with torch.no_grad():
        _randomize_bn_stats(tm, rng)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    variables = convert_torch_hrnet_params(sd, arch='hrnet_w32')
    model = B.get_backbone('hrnet_w32-interp')

    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    out = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                      train=False)
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    assert out.shape == ref.shape == (1, 480, 2, 2)
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-3)


def test_hrnet_conv_downsample_shapes(rng):
    import jax
    model = B.get_backbone('hrnet_w32-conv')
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 2, 2, 480)


def test_hrnet_info():
    assert B.get_backbone_info('hrnet_w48-interp')['n_output_channels'] == 720
