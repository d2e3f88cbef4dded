"""ResNet feature extractors (flax.linen, NHWC, TPU-native).

Rebuild of the backbone family the reference pulls from PARE
(``pare.models.backbone.resnet*``; import sites: reference
``spec/models/hmr.py:21-24,44-53`` and ``camcalib/model.py:20-21,33-37``).
The architecture follows the torchvision ResNet graph exactly (7x7/2 stem,
3x3/2 maxpool, 4 stages of basic/bottleneck blocks, stride on the 3x3 conv of
each bottleneck) so that released PyTorch checkpoints convert one-to-one via
:func:`convert_torch_resnet_params` and produce identical activations.

TPU-first choices:
  * NHWC layout end-to-end (XLA's native conv layout on TPU — no transposes).
  * Explicit conv padding (torch semantics) instead of SAME, so converted
    weights are bit-compatible at every spatial size.
  * A ``compute_dtype`` knob: params stay fp32, activations can run bf16 on
    the MXU; BatchNorm statistics always accumulate in fp32.
  * Returns the pre-avgpool spatial feature map, like the PARE backbones
    (consumed by both CamCalib's avgpool+FC heads and the HMR head).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

ModuleDef = Any


class TorchConv(nn.Module):
    """Conv2D with torch-style explicit symmetric padding, NHWC."""

    features: int
    kernel_size: int
    strides: int = 1
    padding: int = 0
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.padding
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=((p, p), (p, p)),
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name='conv',
        )(x)


def _bn(dtype, name='bn', momentum=0.9, eps=1e-5):
    return nn.BatchNorm(
        use_running_average=None,  # set by call-time arg
        momentum=momentum,
        epsilon=eps,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/b, W/b, b*b*C), channel order (dy, dx, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // block, block, W // block, block, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // block, W // block, block * block * C)


def s2d_stem_kernel(k7: jnp.ndarray) -> jnp.ndarray:
    """Rewrite a 7x7/stride-2 stem kernel for a space-to-depth(2) input.

    (7, 7, C, O) -> (4, 4, 4C, O): pad the kernel to 8x8 with a zero
    leading row/col (the tap at input row 2i-4 that a stride-2 7x7 window
    starting at 2i-3 never reads), then fold each 2x2 tap block into the
    s2d channel axis with the same (dy, dx, c) order as
    :func:`space_to_depth`. The resulting 4x4/stride-1 conv over the s2d
    image computes EXACTLY the original stem (same taps, same zero
    padding) while presenting the MXU a 12-channel contraction instead of
    a 3-channel one — the standard TPU ResNet stem transform.
    """
    k8 = jnp.pad(k7, ((1, 0), (1, 0), (0, 0), (0, 0)))
    C, O = k8.shape[2], k8.shape[3]
    k = k8.reshape(4, 2, 4, 2, C, O)
    k = k.transpose(0, 2, 1, 3, 4, 5)
    return k.reshape(4, 4, 4 * C, O)


class _StemKernel(nn.Module):
    """Bare (7,7,C,64) kernel param at the same tree path as TorchConv's
    ``conv/kernel`` so checkpoints are interchangeable with the standard
    stem."""

    shape: Sequence[int]

    @nn.compact
    def __call__(self):
        return self.param('kernel', nn.initializers.lecun_normal(),
                          tuple(self.shape), jnp.float32)


class S2DStemConv(nn.Module):
    """Stem conv computed via space-to-depth; parameter-compatible with
    the standard ``conv1`` (same (7,7,C,64) kernel, transformed on the
    fly — the transform is linear, so training gradients flow)."""

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k7 = _StemKernel(shape=(7, 7, x.shape[-1], self.features),
                         name='conv')()
        ks = s2d_stem_kernel(k7)
        xs = space_to_depth(x, 2)
        return jax.lax.conv_general_dilated(
            xs.astype(self.dtype), ks.astype(self.dtype), (1, 1),
            ((2, 1), (2, 1)), dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def max_pool_3x3_s2(x):
    """torch ``MaxPool2d(3, stride=2, padding=1)`` in NHWC.

    Pads with -inf so border maxima match torch (zero-pad would corrupt
    negative activations — the stem ReLU makes it moot here, but keep exact).
    """
    return nn.max_pool(
        x, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class BasicBlock(nn.Module):
    """Two 3x3 convs; expansion 1 (ResNet-18/34)."""

    features: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = TorchConv(self.features, 3, self.strides, 1, dtype=self.dtype,
                      name='conv1')(x)
        y = _bn(self.dtype, 'bn1')(y, use_running_average=not train)
        y = nn.relu(y)
        y = TorchConv(self.features, 3, 1, 1, dtype=self.dtype,
                      name='conv2')(y)
        y = _bn(self.dtype, 'bn2')(y, use_running_average=not train)
        if self.downsample:
            identity = TorchConv(
                self.features * self.expansion, 1, self.strides, 0,
                dtype=self.dtype, name='downsample_conv')(x)
            identity = _bn(self.dtype, 'downsample_bn')(
                identity, use_running_average=not train)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 with expansion 4 (ResNet-50/101/152).

    Stride lives on the 3x3 conv (the torchvision convention the pretrained
    checkpoints assume)."""

    features: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = TorchConv(self.features, 1, 1, 0, dtype=self.dtype,
                      name='conv1')(x)
        y = _bn(self.dtype, 'bn1')(y, use_running_average=not train)
        y = nn.relu(y)
        y = TorchConv(self.features, 3, self.strides, 1, dtype=self.dtype,
                      name='conv2')(y)
        y = _bn(self.dtype, 'bn2')(y, use_running_average=not train)
        y = nn.relu(y)
        y = TorchConv(self.features * self.expansion, 1, 1, 0,
                      dtype=self.dtype, name='conv3')(y)
        y = _bn(self.dtype, 'bn3')(y, use_running_average=not train)
        if self.downsample:
            identity = TorchConv(
                self.features * self.expansion, 1, self.strides, 0,
                dtype=self.dtype, name='downsample_conv')(x)
            identity = _bn(self.dtype, 'downsample_bn')(
                identity, use_running_average=not train)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """ResNet trunk returning the final spatial feature map (NHWC).

    For a 224x224 input, output is (B, 7, 7, C_out) — the transpose of the
    reference backbones' (B, C_out, 7, 7).
    """

    block: ModuleDef
    stage_sizes: Sequence[int]
    dtype: Any = jnp.float32
    # Compute the stem via space-to-depth(2) + 4x4/s1 conv (numerically
    # identical; requires even H, W). Default OFF: measured on a v5e chip
    # at the stage-1 production shape (B=128, 512x672, bf16 ResNet-50)
    # the s2d relayout costs more than the 12-vs-3-channel MXU gain
    # (80.2 vs 78.3 ms/iter, -2.4%) — XLA's conv emitter already runs the
    # 3-channel stem near the bandwidth ceiling on this hardware. Kept as
    # a knob for shapes/generations where the classic transform pays.
    s2d_stem: bool = False
    # Rematerialize each residual block in the backward pass
    # (jax.checkpoint): saves only block inputs, recomputes internal
    # activations. A MEMORY knob (TRAINING.REMAT / bench --remat), not a
    # speed knob: the train step is HBM-bandwidth-bound and block
    # intermediates exceed VMEM, so recompute re-materializes them anyway
    # (measured on-chip: see CLAUDE.md round-4 notes). Numerically
    # identical to remat=False (tests/test_models.py).
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = self.block
        if self.remat:
            # train (arg index 2 counting the module) is a static python
            # bool; block I/O stays a single array pytree.
            block_cls = nn.remat(self.block, static_argnums=(2,))
        x = x.astype(self.dtype)
        if self.s2d_stem:
            x = S2DStemConv(dtype=self.dtype, name='conv1')(x)
        else:
            x = TorchConv(64, 7, 2, 3, dtype=self.dtype, name='conv1')(x)
        x = _bn(self.dtype, 'bn1')(x, use_running_average=not train)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)
        for stage, num_blocks in enumerate(self.stage_sizes):
            features = 64 * (2 ** stage)
            strides = 1 if stage == 0 else 2
            for blk in range(num_blocks):
                first = blk == 0
                needs_ds = first and (
                    strides != 1
                    or (stage == 0 and self.block is Bottleneck))
                x = block_cls(
                    features=features,
                    strides=strides if first else 1,
                    downsample=needs_ds,
                    dtype=self.dtype,
                    name=f'layer{stage + 1}_{blk}',
                )(x, train)
        return x


resnet18 = partial(ResNet, block=BasicBlock, stage_sizes=(2, 2, 2, 2))
resnet34 = partial(ResNet, block=BasicBlock, stage_sizes=(3, 4, 6, 3))
resnet50 = partial(ResNet, block=Bottleneck, stage_sizes=(3, 4, 6, 3))
resnet101 = partial(ResNet, block=Bottleneck, stage_sizes=(3, 4, 23, 3))
resnet152 = partial(ResNet, block=Bottleneck, stage_sizes=(3, 8, 36, 3))

_RESNETS = {
    'resnet18': (resnet18, 512),
    'resnet34': (resnet34, 512),
    'resnet50': (resnet50, 2048),
    'resnet101': (resnet101, 2048),
    'resnet152': (resnet152, 2048),
}


# ---------------------------------------------------------------------------
# PyTorch checkpoint conversion
# ---------------------------------------------------------------------------


def _conv_w(t: np.ndarray) -> np.ndarray:
    """torch OIHW conv kernel -> flax HWIO."""
    return np.ascontiguousarray(np.transpose(np.asarray(t), (2, 3, 1, 0)))


def convert_torch_resnet_params(
    state_dict: dict, arch: str = 'resnet50', prefix: str = ''
) -> dict:
    """Convert a torchvision/PARE-format ResNet state_dict to flax variables.

    Handles the key layouts the reference loads (torchvision names, optionally
    under a prefix like ``backbone.`` or lightning's ``model.backbone.``; cf.
    reference checkpoint taxonomy SURVEY.md §5.4). Unknown extra keys (fc
    head, etc.) are ignored.

    Args:
      state_dict: mapping name -> array-like (torch tensors or numpy).
      arch: one of resnet18/34/50/101/152.
      prefix: key prefix to strip (e.g. ``'backbone.'``).
    Returns:
      ``{'params': ..., 'batch_stats': ...}`` flax variable dict.
    """
    block_cls, _ = _RESNETS[arch]
    stage_sizes = block_cls.keywords['stage_sizes']
    is_bottleneck = block_cls.keywords['block'] is Bottleneck

    sd = {}
    for k, v in state_dict.items():
        if prefix and not k.startswith(prefix):
            continue
        sd[k[len(prefix):]] = np.asarray(v)

    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(leaf)

    def convert_bn(torch_name, flax_path):
        put(params, flax_path + ('scale',), sd[f'{torch_name}.weight'])
        put(params, flax_path + ('bias',), sd[f'{torch_name}.bias'])
        put(stats, flax_path + ('mean',), sd[f'{torch_name}.running_mean'])
        put(stats, flax_path + ('var',), sd[f'{torch_name}.running_var'])

    def convert_conv(torch_name, flax_path):
        put(params, flax_path + ('conv', 'kernel'),
            _conv_w(sd[f'{torch_name}.weight']))

    convert_conv('conv1', ('conv1',))
    convert_bn('bn1', ('bn1',))

    n_convs = 3 if is_bottleneck else 2
    for stage, num_blocks in enumerate(stage_sizes):
        for blk in range(num_blocks):
            t = f'layer{stage + 1}.{blk}'
            f = f'layer{stage + 1}_{blk}'
            for ci in range(1, n_convs + 1):
                convert_conv(f'{t}.conv{ci}', (f, f'conv{ci}'))
                convert_bn(f'{t}.bn{ci}', (f, f'bn{ci}'))
            if f'{t}.downsample.0.weight' in sd:
                convert_conv(f'{t}.downsample.0', (f, 'downsample_conv'))
                convert_bn(f'{t}.downsample.1', (f, 'downsample_bn'))

    return {'params': params, 'batch_stats': stats}
