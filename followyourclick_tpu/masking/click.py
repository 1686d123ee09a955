"""Click → mask orchestration (headless equivalent of the reference gradio
app).

Behavior spec: reference ``Inpaint-Anything/sam_segment.py:16-36``
(predict_masks_with_sam: single point prompt → 3 candidate masks) and
``Inpaint-Anything/app.py:53-96`` (get_masked_img: predict, dilate each
candidate, save). The SAM forward runs on TPU via
``followyourclick_tpu.sam``; everything else is host numpy.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from followyourclick_tpu.masking.brush import dilate_mask
from followyourclick_tpu.sam.predictor import SamPredictor


def predict_masks_with_sam(
    img: np.ndarray,
    point_coords: Sequence[Sequence[float]],
    point_labels: Sequence[int],
    predictor: SamPredictor,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(H, W, 3) RGB + clicks → (masks (3, H, W) bool, scores (3,), logits)
    — reference sam_segment.py:16-36."""
    predictor.set_image(img)
    return predictor.predict(
        point_coords=np.asarray(point_coords, dtype=np.float32),
        point_labels=np.asarray(point_labels, dtype=np.int32),
        multimask_output=True,
    )


def click_to_masks(
    img: np.ndarray,
    click_wh: Tuple[int, int],
    predictor: SamPredictor,
    dilate_kernel_size: Optional[int] = 15,
) -> List[np.ndarray]:
    """One click (w, h) → 3 dilated uint8 {0,255} candidate masks — the
    get_masked_img flow (app.py:53-96)."""
    masks, _, _ = predict_masks_with_sam(
        img, [[click_wh[0], click_wh[1]]], [1], predictor
    )
    masks = (masks.astype(np.uint8)) * 255
    if dilate_kernel_size is not None:
        masks = [dilate_mask(m, dilate_kernel_size) for m in masks]
    else:
        masks = list(masks)
    return masks
