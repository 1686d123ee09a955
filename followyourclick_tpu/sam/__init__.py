"""TPU-native Segment-Anything (SAM) click→mask front-end.

Rebuild of the reference's vendored segment-anything
(``Inpaint-Anything/third_party/segment-anything/segment_anything/``,
SURVEY.md §2.4): ViT image encoder with windowed attention + decomposed
relative positions, random-Fourier prompt encoder, two-way-transformer mask
decoder, a ``SamPredictor`` with cached image embeddings (the reference
caches them per click session, app.py:42-50), and an automatic mask
generator. Produces the click masks consumed by the animation pipeline's
first-frame masked-latent conditioning.

TPU-first: the heavy ViT-H forward is one jitted NHWC graph (flash-attention
for the global blocks); the tiny prompt-encoder/decoder forward is a second
jit so interactive clicks re-use the cached embedding without re-encoding.
"""

from followyourclick_tpu.sam.amg import SamAutomaticMaskGenerator
from followyourclick_tpu.sam.image_encoder import ImageEncoderViT
from followyourclick_tpu.sam.mask_decoder import MaskDecoder
from followyourclick_tpu.sam.prompt_encoder import PromptEncoder
from followyourclick_tpu.sam.sam import Sam, SamConfig, sam_model_registry
from followyourclick_tpu.sam.predictor import SamPredictor

__all__ = [
    "ImageEncoderViT",
    "MaskDecoder",
    "PromptEncoder",
    "Sam",
    "SamAutomaticMaskGenerator",
    "SamConfig",
    "SamPredictor",
    "sam_model_registry",
]
