from spec_tpu.models.heads.hmr_head import (  # noqa: F401
    HMRHead,
    convert_torch_hmr_head_params,
    default_init_params,
    load_smpl_mean_params,
)
from spec_tpu.models.heads.smpl_head import smpl_cam_head, smpl_head  # noqa: F401
