"""Parity tests for the flax ResNet backbones against an independent
torch construction of the same graph (random weights, converted via
``convert_torch_resnet_params``).

This validates the architecture AND the checkpoint converter at once —
the mechanism the framework relies on to load the reference's released
pretrained weights (SURVEY.md §5.4, §7.4 item 2).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import jax.numpy as jnp

from spec_tpu.models import backbones as B


# ---------------------------------------------------------------------------
# Independent torch ResNet (torchvision-compatible graph + key names)
# ---------------------------------------------------------------------------


class TorchBasic(nn.Module):
    expansion = 1

    def __init__(self, inp, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inp, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idt)


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inp, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inp, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + idt)


class TorchResNet(nn.Module):
    def __init__(self, block, layers):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0], 1)
        self.layer2 = self._make_layer(block, 128, layers[1], 2)
        self.layer3 = self._make_layer(block, 256, layers[2], 2)
        self.layer4 = self._make_layer(block, 512, layers[3], 2)

    def _make_layer(self, block, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1, stride,
                          bias=False),
                nn.BatchNorm2d(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


def _randomize_bn_stats(model, rng):
    """Give BN layers nontrivial running stats so parity actually tests
    the eval-mode normalization path."""
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(
                torch.from_numpy(rng.randn(m.num_features).astype('f4') * 0.1))
            m.running_var.copy_(torch.from_numpy(
                (rng.rand(m.num_features).astype('f4') * 0.5 + 0.75)))
            m.weight.data.copy_(
                torch.from_numpy(rng.randn(m.num_features).astype('f4') * 0.1
                                 + 1.0))
            m.bias.data.copy_(
                torch.from_numpy(rng.randn(m.num_features).astype('f4') * 0.1))


CASES = [
    ('resnet18', TorchBasic, (2, 2, 2, 2), 512),
    ('resnet50', TorchBottleneck, (3, 4, 6, 3), 2048),
]


@pytest.mark.parametrize('arch,tblock,layers,cout', CASES)
def test_resnet_parity(rng, arch, tblock, layers, cout):
    tm = TorchResNet(tblock, layers).eval()
    with torch.no_grad():
        _randomize_bn_stats(tm, rng)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    variables = B.convert_torch_resnet_params(sd, arch=arch)
    model = B.get_backbone(arch)

    x = rng.randn(2, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()  # NCHW

    out = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                      train=False)
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))

    assert out.shape == ref.shape == (2, cout, 2, 3)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_s2d_stem_exactness(rng):
    """The space-to-depth stem must compute EXACTLY the standard 7x7/s2
    stem (same params, fp32) — it is a pure kernel rewrite."""
    model = B.get_backbone('resnet18')
    s2d = B.get_backbone('resnet18', s2d_stem=True)

    x = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
    variables = model.init(__import__('jax').random.PRNGKey(0), x)

    ref = model.apply(variables, x, train=False)
    out = s2d.apply(variables, x, train=False)  # same variables!
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    # Param trees are interchangeable (same paths/shapes).
    vs = s2d.init(__import__('jax').random.PRNGKey(0), x)
    import jax
    assert (jax.tree_util.tree_structure(vs)
            == jax.tree_util.tree_structure(variables))


def test_conversion_covers_all_torch_keys(rng):
    """Every torch tensor must land somewhere in the flax tree (no silently
    dropped weights)."""
    tm = TorchResNet(TorchBasic, (2, 2, 2, 2))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = B.convert_torch_resnet_params(sd, arch='resnet18')

    import jax
    n_flax = len(jax.tree_util.tree_leaves(variables))
    n_torch = len([k for k in sd if 'num_batches_tracked' not in k])
    assert n_flax == n_torch


def test_backbone_info():
    assert B.get_backbone_info('resnet50')['n_output_channels'] == 2048
    assert B.get_backbone_info('resnet34')['n_output_channels'] == 512
    assert B.get_backbone_info('hrnet_w32-conv')['n_output_channels'] == 480
