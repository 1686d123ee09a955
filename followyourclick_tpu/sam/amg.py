"""Automatic mask generation: grid-prompt the whole image, filter, NMS.

Behavior spec: reference ``segment_anything/automatic_mask_generator.py``
(+ ``utils/amg.py`` helpers): 32x32 point grid, 64-point batches, quality
filters (predicted IoU ≥ 0.88, stability score ≥ 0.95 computed by double
thresholding the logits at ±stability_score_offset), box NMS at 0.7, optional
crop layers, small-region postprocessing hooks.

Host-side orchestration (numpy); all model forwards go through the
predictor's cached-embedding jit, so a full 1024-prompt sweep is
32 decoder batches on device with zero ViT re-encodes.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from followyourclick_tpu.sam.predictor import SamPredictor
from followyourclick_tpu.sam.sam import MASK_THRESHOLD


def build_point_grid(n_per_side: int) -> np.ndarray:
    """Uniform (n², 2) grid in [0,1]² (utils/amg.py build_point_grid)."""
    offset = 1 / (2 * n_per_side)
    pts = np.linspace(offset, 1 - offset, n_per_side)
    gx, gy = np.meshgrid(pts, pts)
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def calculate_stability_score(
    logits: np.ndarray, mask_threshold: float, offset: float
) -> np.ndarray:
    """IoU between the masks thresholded at threshold±offset
    (utils/amg.py calculate_stability_score)."""
    high = (logits > (mask_threshold + offset)).sum(axis=(-1, -2))
    low = (logits > (mask_threshold - offset)).sum(axis=(-1, -2))
    return high / np.maximum(low, 1)


def batched_mask_to_box(masks: np.ndarray) -> np.ndarray:
    """(..., H, W) bool → XYXY boxes; empty masks → [0,0,0,0]
    (utils/amg.py batched_mask_to_box)."""
    shape = masks.shape[:-2]
    h, w = masks.shape[-2:]
    masks = masks.reshape(-1, h, w)
    boxes = np.zeros((masks.shape[0], 4), dtype=np.float32)
    for i, m in enumerate(masks):
        ys, xs = np.nonzero(m)
        if len(ys):
            boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
    return boxes.reshape(*shape, 4)


def box_nms(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float) -> np.ndarray:
    """Greedy IoU NMS returning kept indices (replaces torchvision
    batched_nms used by the reference)."""
    order = np.argsort(-scores)
    keep: List[int] = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = (boxes[rest, 2] - boxes[rest, 0]) * (
            boxes[rest, 3] - boxes[rest, 1]
        )
        iou = inter / np.maximum(area_i + area_r - inter, 1e-6)
        order = rest[iou <= iou_thresh]
    return np.asarray(keep, dtype=np.int64)


class SamAutomaticMaskGenerator:
    """Whole-image mask proposals (automatic_mask_generator.py:35-371).
    Defaults match the reference."""

    def __init__(
        self,
        predictor: SamPredictor,
        points_per_side: int = 32,
        points_per_batch: int = 64,
        pred_iou_thresh: float = 0.88,
        stability_score_thresh: float = 0.95,
        stability_score_offset: float = 1.0,
        box_nms_thresh: float = 0.7,
        min_mask_region_area: int = 0,
    ):
        self.predictor = predictor
        self.point_grid = build_point_grid(points_per_side)
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.box_nms_thresh = box_nms_thresh
        self.min_mask_region_area = min_mask_region_area

    def generate(self, image: np.ndarray) -> List[Dict[str, Any]]:
        """image: (H, W, 3) RGB uint8 → list of mask records sorted by area
        (desc), each with segmentation/area/bbox/predicted_iou/
        stability_score/point_coords keys like the reference output."""
        self.predictor.set_image(image)
        h, w = image.shape[:2]
        points = self.point_grid * np.array([w, h])

        all_masks: List[np.ndarray] = []
        all_iou: List[float] = []
        all_stab: List[float] = []
        all_pts: List[np.ndarray] = []
        for start in range(0, len(points), self.points_per_batch):
            batch = points[start : start + self.points_per_batch]
            # each point is an independent prompt; one decoder call per batch
            masks, iou = self.predictor.predict_batch(
                point_coords=batch[:, None, :],
                point_labels=np.ones((len(batch), 1), dtype=np.int32),
                multimask_output=True,
                return_logits=True,
            )  # (B, 3, H, W), (B, 3)
            stab = calculate_stability_score(
                masks, MASK_THRESHOLD, self.stability_score_offset
            )
            keep = (iou >= self.pred_iou_thresh) & (
                stab >= self.stability_score_thresh
            )
            for b, k in zip(*np.nonzero(keep)):
                all_masks.append(masks[b, k] > MASK_THRESHOLD)
                all_iou.append(float(iou[b, k]))
                all_stab.append(float(stab[b, k]))
                all_pts.append(batch[b])
        if not all_masks:
            return []

        masks = np.stack(all_masks)
        boxes = batched_mask_to_box(masks)
        keep = box_nms(boxes, np.asarray(all_iou), self.box_nms_thresh)

        records = []
        for i in keep:
            seg = masks[i]
            if self.min_mask_region_area and seg.sum() < self.min_mask_region_area:
                continue
            records.append(
                {
                    "segmentation": seg,
                    "area": int(seg.sum()),
                    "bbox": [
                        float(boxes[i, 0]), float(boxes[i, 1]),
                        float(boxes[i, 2] - boxes[i, 0]),
                        float(boxes[i, 3] - boxes[i, 1]),
                    ],
                    "predicted_iou": all_iou[i],
                    "stability_score": all_stab[i],
                    "point_coords": [all_pts[i].tolist()],
                }
            )
        records.sort(key=lambda r: r["area"], reverse=True)
        return records
