from spec_tpu.data.cam_dataset import AugmentationConfig, CamDataset  # noqa: F401
from spec_tpu.data.loader import DataLoader, collate, device_prefetch  # noqa: F401
from spec_tpu.data.mixed_dataset import (  # noqa: F401
    MixedCamDataset,
    parse_datasets_ratios,
)
from spec_tpu.data import transforms  # noqa: F401
