"""TPU-native LaMa inpainting (the reference's vendored
``Inpaint-Anything/third_party/lama/``, SURVEY.md §2.4): the FFC
(Fast Fourier Convolution) ResNet generator used for click-to-remove, plus
the remove-anything composition (SAM mask → dilate → LaMa fill).

TPU-first: the FFT-domain convolutions are ``jnp.fft.rfft2``/``irfft2`` fused
into one jitted NHWC graph; padding is static so the whole generator is a
single XLA program.
"""

from followyourclick_tpu.inpaint.lama import (
    FFCResNetGenerator,
    LamaConfig,
    LamaInpainter,
)
from followyourclick_tpu.inpaint.remove import remove_anything

__all__ = [
    "FFCResNetGenerator",
    "LamaConfig",
    "LamaInpainter",
    "remove_anything",
]
