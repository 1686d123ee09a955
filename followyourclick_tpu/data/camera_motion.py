"""Camera-motion augmentation: synthesize labelled camera moves from stills.

Behavior spec: reference ``animatediff/data/majic_transformes.py`` —
``TXAugmentation`` with 8 motion types (``MOTION_TYPES`` :153-162: pan
left/right/up/down, zoom in/out, rotate cw/ccw), implemented as a crop-window
path over a static frame (:198-308). The motion-type index becomes the
``camera_motion_type`` conditioning value (UNet camera_motion_embedding).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

MOTION_TYPES: Tuple[str, ...] = (
    "pan_left", "pan_right", "pan_up", "pan_down",
    "zoom_in", "zoom_out", "rotate_cw", "rotate_ccw",
)


def _crop(img: np.ndarray, cx: float, cy: float, size: float,
          angle: float, out_hw: Tuple[int, int]) -> np.ndarray:
    """Rotated square crop centered at (cx, cy) with side ``size``."""
    import cv2

    oh, ow = out_hw
    m = cv2.getRotationMatrix2D((cx, cy), angle, out_hw[1] / size)
    m[0, 2] += ow / 2 - cx
    m[1, 2] += oh / 2 - cy
    return cv2.warpAffine(img, m, (ow, oh), flags=cv2.INTER_LINEAR)


class CameraMotionAugmentation:
    """image (H, W, 3) → (frames (F, h, w, 3), motion_type_index)."""

    def __init__(self, num_frames: int = 16, out_size: int = 512,
                 pan_fraction: float = 0.2, zoom_fraction: float = 0.25,
                 max_rotation_deg: float = 12.0, seed: int | None = None):
        self.num_frames = num_frames
        self.out_size = out_size
        self.pan_fraction = pan_fraction
        self.zoom_fraction = zoom_fraction
        self.max_rotation_deg = max_rotation_deg
        self.rng = np.random.RandomState(seed)

    def __call__(self, image: np.ndarray,
                 motion_type: str | None = None) -> Tuple[np.ndarray, int]:
        if motion_type is None:
            motion_type = MOTION_TYPES[self.rng.randint(len(MOTION_TYPES))]
        idx = MOTION_TYPES.index(motion_type)
        h, w = image.shape[:2]
        f = self.num_frames
        base = min(h, w) * (1.0 - self.pan_fraction)
        cx0, cy0 = w / 2, h / 2
        t = np.linspace(0.0, 1.0, f)

        cxs = np.full(f, cx0)
        cys = np.full(f, cy0)
        sizes = np.full(f, base)
        angles = np.zeros(f)
        span_x = (w - base) / 2
        span_y = (h - base) / 2

        if motion_type == "pan_left":
            cxs = cx0 + span_x * (1 - 2 * t)
        elif motion_type == "pan_right":
            cxs = cx0 - span_x * (1 - 2 * t)
        elif motion_type == "pan_up":
            cys = cy0 + span_y * (1 - 2 * t)
        elif motion_type == "pan_down":
            cys = cy0 - span_y * (1 - 2 * t)
        elif motion_type == "zoom_in":
            sizes = base * (1.0 - self.zoom_fraction * t)
        elif motion_type == "zoom_out":
            sizes = base * (1.0 - self.zoom_fraction * (1 - t))
        elif motion_type == "rotate_cw":
            angles = -self.max_rotation_deg * t
        elif motion_type == "rotate_ccw":
            angles = self.max_rotation_deg * t
        else:
            raise ValueError(motion_type)

        frames = np.stack([
            _crop(image, cxs[i], cys[i], sizes[i], angles[i],
                  (self.out_size, self.out_size))
            for i in range(f)
        ])
        return frames, idx


def synthesize_camera_clip(image: np.ndarray, motion_type: str,
                           num_frames: int = 16,
                           out_size: int = 512) -> np.ndarray:
    return CameraMotionAugmentation(num_frames, out_size)(
        image, motion_type)[0]
