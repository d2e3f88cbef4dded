"""Backbone registry (equivalent of ``pare.models.backbone`` +
``get_backbone_info``; reference import sites ``spec/models/hmr.py:21-24``,
``camcalib/model.py:20-21``)."""

from spec_tpu.models.backbones.resnet import (  # noqa: F401
    ResNet,
    BasicBlock,
    Bottleneck,
    convert_torch_resnet_params,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
)
from spec_tpu.models.backbones.hrnet import (  # noqa: F401
    convert_torch_hrnet_params,
)

_BACKBONE_INFO = {
    'resnet18': dict(n_output_channels=512, downsample_rate=4),
    'resnet34': dict(n_output_channels=512, downsample_rate=4),
    'resnet50': dict(n_output_channels=2048, downsample_rate=4),
    'resnet101': dict(n_output_channels=2048, downsample_rate=4),
    'resnet152': dict(n_output_channels=2048, downsample_rate=4),
    'hrnet_w32': dict(n_output_channels=480, downsample_rate=4),
    'hrnet_w48': dict(n_output_channels=720, downsample_rate=4),
}

_BACKBONE_FACTORY = {
    'resnet18': resnet18,
    'resnet34': resnet34,
    'resnet50': resnet50,
    'resnet101': resnet101,
    'resnet152': resnet152,
}


def get_backbone_info(backbone: str) -> dict:
    """Channel/stride metadata per backbone (PARE ``get_backbone_info``)."""
    return _BACKBONE_INFO[backbone.split('-')[0]]


def get_backbone(backbone: str, dtype=None, **kwargs):
    """Instantiate a backbone flax module by name.

    ``hrnet_w32-conv`` style suffixes (reference ``spec/models/hmr.py:44-51``)
    select the HRNet downsample flavor once HRNet lands.
    """
    name = backbone.split('-')[0]
    if name.startswith('hrnet'):
        from spec_tpu.models.backbones.hrnet import get_hrnet
        use_conv = backbone.endswith('-conv')
        return get_hrnet(name, use_conv=use_conv, dtype=dtype, **kwargs)
    factory = _BACKBONE_FACTORY[name]
    if dtype is not None:
        kwargs['dtype'] = dtype
    return factory(**kwargs)
