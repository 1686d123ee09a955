from followyourclick_tpu.models.unet3d import UNet3DConditionModel  # noqa: F401
from followyourclick_tpu.models.vae import AutoencoderKL  # noqa: F401
