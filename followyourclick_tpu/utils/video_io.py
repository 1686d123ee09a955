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
                        height: int, width: int,
                        crop_method: str = "crop"):
    """Load + preprocess first image and mask to (H, W)
    (reference scripts/inference.py:314-348 host preprocessing).

    ``crop_method``: "crop" = aspect-preserving Resize(max(W,H)) +
    CenterCrop (reference pixel_transforms :314-317); "resize_and_crop" =
    squash to a max(W,H) square then center-crop (reference :325-340).

    Returns (image float32 (H, W, 3) in [-1, 1], mask float32 (H, W, 1) in
    {0, 1} or None).
    """
    from PIL import Image

    img = Image.open(image_path).convert("RGB")
    img = preprocess_pil(img, height, width, crop_method)
    arr = np.asarray(img, dtype=np.float32) / 127.5 - 1.0

    mask_arr = None
    if mask_path:
        m = Image.open(mask_path).convert("L")
        m = preprocess_pil(m, height, width, crop_method)
        mask_arr = (np.asarray(m, dtype=np.float32) / 255.0)
        mask_arr = (mask_arr > 0.5).astype(np.float32)[..., None]
    return arr, mask_arr


def preprocess_pil(img, height: int, width: int, crop_method: str = "crop"):
    """One image through the reference crop pipeline (inference.py:314-348)."""
    if crop_method == "resize_and_crop":
        # squash to a square of side max(W, H), then center-crop (H, W)
        target = max(width, height)
        img = img.resize((target, target))
        left = round(max(0, (target - width) / 2))
        top = round(max(0, (target - height) / 2))
        right = round(min(target, (target + width) / 2))
        bottom = round(min(target, (target + height) / 2))
        return img.crop((left, top, right, bottom))
    if crop_method == "crop":
        return _resize_center_crop(img, height, width)
    raise ValueError(crop_method)


# CLIP image normalization constants (transformers CLIPImageProcessor)
CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_preprocess_image(image, image_size: int = 224) -> np.ndarray:
    """PIL image or float array → CLIP-vision pixel values (1, S, S, 3)
    (the host-side replica of transformers CLIPImageProcessor used by the
    reference's ip path, scripts/inference.py:321-322)."""
    from PIL import Image

    if isinstance(image, np.ndarray):
        arr = image
        if arr.dtype != np.uint8:
            # accept [-1,1] or [0,1] float arrays
            lo, hi = float(arr.min()), float(arr.max())
            if lo < -0.01:
                arr = (arr + 1.0) / 2.0
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        image = Image.fromarray(arr)
    img = image.convert("RGB")
    img = _resize_center_crop(img, image_size, image_size)
    x = np.asarray(img, dtype=np.float32) / 255.0
    x = (x - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
    return x[None]


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
