"""TPU-native optical flow stack (the reference's vendored mmflow, §2.5 of
SURVEY.md). Provides the RAFT estimator used to derive the per-clip
"motion score" (`flow_control`) conditioning input consumed by the UNet3D
(reference animatediff/models/unet.py:554-558), plus the op/loss/metric layer
that mmflow's test suite covers.

TPU-first design: all tensors NHWC, correlation volumes are one einsum on the
MXU, the GRU iteration loop is a `lax.scan` inside one jit, and bilinear
lookups are vectorized gathers (no mmcv CUDA `Correlation` op — reference
mmflow/mmflow/ops/builder.py:2).
"""

from followyourclick_tpu.flow.api import (
    compute_motion_score,
    inference_model,
    init_model,
)
from followyourclick_tpu.flow.losses import (
    multi_level_charbonnier_loss,
    multi_level_epe_loss,
    sequence_loss,
)
from followyourclick_tpu.flow.metrics import (
    end_point_error,
    end_point_error_map,
    eval_metrics,
    optical_flow_outliers,
)
from followyourclick_tpu.flow.ops import (
    bilinear_sample,
    coords_grid,
    corr_lookup,
    correlation_pyramid,
    flow_warp,
)
from followyourclick_tpu.flow.raft import RAFT, RAFTConfig

__all__ = [
    "RAFT",
    "RAFTConfig",
    "bilinear_sample",
    "compute_motion_score",
    "coords_grid",
    "corr_lookup",
    "correlation_pyramid",
    "end_point_error",
    "end_point_error_map",
    "eval_metrics",
    "flow_warp",
    "inference_model",
    "init_model",
    "multi_level_charbonnier_loss",
    "multi_level_epe_loss",
    "optical_flow_outliers",
    "sequence_loss",
]
