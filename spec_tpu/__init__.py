"""spec_tpu: TPU-native camera-aware 3D human pose & shape estimation.

A from-scratch JAX/XLA/Pallas rebuild of the SPEC two-stage pipeline
(CamCalib camera regression -> camera-conditioned HMR body regression;
see README.md / PARITY.md for the full component map).

Public surface (lazily imported — ``import spec_tpu`` stays cheap):

  SpecPredictor            persistent two-stage inference engine
  export_predictor, load_predictor   .specx AOT deployment artifacts
  HMR, CameraRegressorNetwork   the two model families
  load_smpl_assets, smpl_forward   SMPL body model
  smplify_fit              in-graph batched SMPLify fitting
  spec_default_config, camcalib_default_config, update_hparams  configs
"""

from __future__ import annotations

__version__ = '0.1.0'

_LAZY = {
    'SpecPredictor': ('spec_tpu.serving', 'SpecPredictor'),
    'export_predictor': ('spec_tpu.export', 'export_predictor'),
    'load_predictor': ('spec_tpu.export', 'load_predictor'),
    'HMR': ('spec_tpu.models', 'HMR'),
    'CameraRegressorNetwork': ('spec_tpu.models', 'CameraRegressorNetwork'),
    'load_smpl_assets': ('spec_tpu.core.smpl', 'load_smpl_assets'),
    'smpl_forward': ('spec_tpu.core.smpl', 'smpl_forward'),
    'smplify_fit': ('spec_tpu.train.smplify', 'smplify_fit'),
    'spec_default_config': ('spec_tpu.utils.config', 'spec_default_config'),
    'camcalib_default_config': ('spec_tpu.utils.config',
                                'camcalib_default_config'),
    'update_hparams': ('spec_tpu.utils.config', 'update_hparams'),
}

__all__ = sorted(_LAZY) + ['__version__']


def __getattr__(name):
    try:
        module, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
    import importlib

    return getattr(importlib.import_module(module), attr)


def __dir__():
    return __all__
