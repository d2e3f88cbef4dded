from spec_tpu.eval.metrics import (  # noqa: F401
    eval_joints_24,
    eval_mesh_j14,
    mpjpe,
    pa_mpjpe,
    per_joint_error,
    rotate_points,
    v2v_error,
)
from spec_tpu.eval.evaluator import (  # noqa: F401
    MetricAccumulator,
    compute_error,
)
