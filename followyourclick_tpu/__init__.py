"""Follow-Your-Click TPU: a TPU-native regional image-to-video generation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
mayuelala/FollowYourClick (arXiv 2403.08268): an AnimateDiff-style SD-1.5 UNet
inflated to 3D with temporal motion modules, conditioned on a click mask +
first-frame latent, an FPS / motion-score embedding, optional IP-Adapter image
prompts and camera-motion LoRA — compiled end-to-end with XLA, with Pallas
flash-attention on the hot paths and GSPMD sharding for multi-chip serving.

Reference behavior spec: /root/reference (see SURVEY.md). This package is an
independent TPU-first design, not a port.
"""

__version__ = "0.1.0"

from followyourclick_tpu.config import (  # noqa: F401
    MotionModuleConfig,
    NoiseScheduleConfig,
    UNet3DConfig,
)
