"""Host-side mask preprocessing toolchain.

Rebuild of the reference's ``brush_utils/`` (dilate/crop/paste,
SURVEY.md §2.1) and the click→mask orchestration of
``Inpaint-Anything/app.py`` / ``sam_segment.py`` (SURVEY.md §3.4). Pure
numpy/cv2 — this stage stays on the TPU-VM host and produces the mask images
consumed by the animation pipeline's first-frame masked-latent conditioning.
"""

from followyourclick_tpu.masking.brush import (
    crop_for_filling_post,
    crop_for_filling_pre,
    dilate_mask,
    erode_mask,
    paste_object,
    recover_size,
    resize_and_pad,
)
from followyourclick_tpu.masking.click import predict_masks_with_sam

__all__ = [
    "crop_for_filling_post",
    "crop_for_filling_pre",
    "dilate_mask",
    "erode_mask",
    "paste_object",
    "predict_masks_with_sam",
    "recover_size",
    "resize_and_pad",
]
