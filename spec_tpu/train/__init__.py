from spec_tpu.train.state import TrainState, adam, create_train_state  # noqa: F401
from spec_tpu.train.steps import (  # noqa: F401
    make_camcalib_train_step,
    make_spec_train_step,
)
