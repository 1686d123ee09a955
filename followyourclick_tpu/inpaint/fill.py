"""Fill-anything / replace-anything compositions.

Behavior spec: reference ``Inpaint-Anything/fill_anything.py`` (SAM click
mask → dilate → 512-crop around the mask → SD-inpaint the crop with the text
prompt → paste back under the mask) and ``replace_anything.py`` (keep the
object, repaint the INVERTED mask — background replacement — via
resize_and_pad / recover_size).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from followyourclick_tpu.masking.brush import (
    crop_for_filling_post,
    crop_for_filling_pre,
    dilate_mask,
    recover_size,
    resize_and_pad,
)
from followyourclick_tpu.masking.click import predict_masks_with_sam
from followyourclick_tpu.pipelines.inpaint import InpaintPipeline
from followyourclick_tpu.sam.predictor import SamPredictor


def fill_img_with_sd(
    img: np.ndarray, mask: np.ndarray, prompt: str,
    pipeline: InpaintPipeline, seed: int = 0, steps: int = 25,
) -> np.ndarray:
    """stable_diffusion_inpaint.py fill_img_with_sd: crop → inpaint → paste."""
    crop_img, crop_mask = crop_for_filling_pre(img, mask)
    filled = pipeline(crop_img, crop_mask, prompt, steps=steps, seed=seed)
    return crop_for_filling_post(img, mask, filled)


def replace_img_with_sd(
    img: np.ndarray, mask: np.ndarray, prompt: str,
    pipeline: InpaintPipeline, seed: int = 0, steps: int = 25,
    target_size: int = 512,
) -> np.ndarray:
    """stable_diffusion_inpaint.py replace_img_with_sd: repaint everything
    EXCEPT the mask (background replacement)."""
    padded_img, padded_mask, pads = resize_and_pad(img, mask, target_size)
    inverted = 255 - (padded_mask > 0).astype(np.uint8) * 255
    out = pipeline(padded_img, inverted, prompt, steps=steps, seed=seed)
    recovered, _ = recover_size(out, padded_mask, img.shape[:2], pads)
    return recovered


def fill_anything(
    img: np.ndarray,
    point_wh: Tuple[int, int],
    prompt: str,
    predictor: SamPredictor,
    pipeline: InpaintPipeline,
    dilate_kernel_size: Optional[int] = 15,
    seed: int = 0,
    steps: int = 25,
) -> List[dict]:
    """fill_anything.py: click → SAM masks → dilate → fill each candidate."""
    masks, scores, _ = predict_masks_with_sam(
        img, [[point_wh[0], point_wh[1]]], [1], predictor
    )
    masks = masks.astype(np.uint8) * 255
    out = []
    for i in range(masks.shape[0]):
        mask = masks[i]
        if dilate_kernel_size is not None:
            mask = dilate_mask(mask, dilate_kernel_size)
        out.append({
            "mask": mask,
            "score": float(scores[i]),
            "filled": fill_img_with_sd(img, mask, prompt, pipeline,
                                       seed=seed, steps=steps),
        })
    return out


def replace_anything(
    img: np.ndarray,
    point_wh: Tuple[int, int],
    prompt: str,
    predictor: SamPredictor,
    pipeline: InpaintPipeline,
    seed: int = 0,
    steps: int = 25,
    target_size: int = 512,
) -> List[dict]:
    """replace_anything.py: click → SAM masks → replace the background."""
    masks, scores, _ = predict_masks_with_sam(
        img, [[point_wh[0], point_wh[1]]], [1], predictor
    )
    masks = masks.astype(np.uint8) * 255
    return [
        {
            "mask": masks[i],
            "score": float(scores[i]),
            "replaced": replace_img_with_sd(img, masks[i], prompt, pipeline,
                                            seed=seed, steps=steps,
                                            target_size=target_size),
        }
        for i in range(masks.shape[0])
    ]
