from spec_tpu.models.camcalib import (  # noqa: F401
    CameraRegressorNetwork,
    convert_torch_camcalib_params,
)
from spec_tpu.models.hmr import HMR, convert_torch_hmr_params  # noqa: F401
