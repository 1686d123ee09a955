"""Video/grid IO — gif writer and image preprocessing.

Behavior spec: reference ``animatediff/utils/util.py:18-30`` (``save_videos_grid``
gif writer), ``scripts/inference.py:314-365`` (resize/crop image + mask to the
working resolution, mask → latent-res clamp).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def save_videos_grid(videos: np.ndarray, path: str, fps: int = 8,
                     n_rows: int = 4, rescale: bool = False) -> None:
    """videos: (B, F, H, W, 3) float in [0,1] (or [-1,1] with rescale) → gif."""
    import imageio

    b, f, h, w, c = videos.shape
    n_rows = min(n_rows, b)
    n_cols = (b + n_rows - 1) // n_rows
    frames = []
    for fi in range(f):
        grid = np.zeros((n_rows * h, n_cols * w, c), dtype=np.float32)
        for bi in range(b):
            r, col = bi % n_rows, bi // n_rows
            grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = videos[bi, fi]
        if rescale:
            grid = (grid + 1.0) / 2.0
        frames.append((np.clip(grid, 0, 1) * 255).astype(np.uint8))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.mimsave(path, frames, duration=1000.0 / fps, loop=0)


def save_video_mp4(video: np.ndarray, path: str, fps: int = 8) -> None:
    """(F, H, W, 3) float [0,1] → mp4 (if ffmpeg backend available)."""
    import imageio

    frames = (np.clip(video, 0, 1) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.mimsave(path, list(frames), fps=fps)


def load_image_and_mask(image_path: str, mask_path: str | None,
                        height: int, width: int):
    """Load + resize/center-crop first image and mask to (H, W)
    (reference scripts/inference.py:314-348 host preprocessing).

    Returns (image float32 (H, W, 3) in [-1, 1], mask float32 (H, W, 1) in
    {0, 1} or None).
    """
    from PIL import Image

    img = Image.open(image_path).convert("RGB")
    img = _resize_center_crop(img, height, width)
    arr = np.asarray(img, dtype=np.float32) / 127.5 - 1.0

    mask_arr = None
    if mask_path:
        m = Image.open(mask_path).convert("L")
        m = _resize_center_crop(m, height, width)
        mask_arr = (np.asarray(m, dtype=np.float32) / 255.0)
        mask_arr = (mask_arr > 0.5).astype(np.float32)[..., None]
    return arr, mask_arr


def _resize_center_crop(img, height: int, width: int):
    from PIL import Image

    w0, h0 = img.size
    scale = max(width / w0, height / h0)
    nw, nh = int(round(w0 * scale)), int(round(h0 * scale))
    img = img.resize((nw, nh), Image.LANCZOS)
    left = (nw - width) // 2
    top = (nh - height) // 2
    return img.crop((left, top, left + width, top + height))


def downsample_mask_to_latent(mask: np.ndarray, latent_h: int,
                              latent_w: int) -> np.ndarray:
    """(H, W, 1) → (h, w, 1), bilinear + clamp 0..1 (reference
    scripts/inference.py:361-365)."""
    import cv2

    m = cv2.resize(mask[..., 0], (latent_w, latent_h),
                   interpolation=cv2.INTER_LINEAR)
    return np.clip(m, 0.0, 1.0)[..., None].astype(np.float32)


def slerp(t: float, v0: np.ndarray, v1: np.ndarray,
          dot_threshold: float = 0.9995) -> np.ndarray:
    """Spherical interpolation (reference util.py:184-190)."""
    dot = np.sum(v0 * v1 / (np.linalg.norm(v0) * np.linalg.norm(v1)))
    if np.abs(dot) > dot_threshold:
        return (1 - t) * v0 + t * v1
    theta = np.arccos(dot)
    return (np.sin((1 - t) * theta) * v0 + np.sin(t * theta) * v1) \
        / np.sin(theta)
