"""Mask dilation / crop / paste utilities.

Behavior spec: reference ``brush_utils/utils.py`` (dilate_mask/erode_mask),
``brush_utils/mask_processing.py:7-131`` (crop_for_filling_pre/post: 512-crop
centred on the mask bbox with proportional-resize and pad-to-square fallback,
then paste-back under the mask), ``brush_utils/crop_for_replacing.py``
(resize_and_pad / recover_size), ``brush_utils/paste_object.py``.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _cv2():
    import cv2

    return cv2


def dilate_mask(mask: np.ndarray, dilate_factor: int = 15) -> np.ndarray:
    """Square-kernel dilation (brush_utils/utils.py dilate_mask)."""
    cv2 = _cv2()
    return cv2.dilate(
        mask.astype(np.uint8),
        np.ones((dilate_factor, dilate_factor), np.uint8),
        iterations=1,
    )


def erode_mask(mask: np.ndarray, dilate_factor: int = 15) -> np.ndarray:
    cv2 = _cv2()
    return cv2.erode(
        mask.astype(np.uint8),
        np.ones((dilate_factor, dilate_factor), np.uint8),
        iterations=1,
    )


def _resize_min_side(image, mask, crop_size):
    cv2 = _cv2()
    height, width = image.shape[:2]
    aspect = float(width) / float(height)
    if min(height, width) < crop_size:
        if height < width:
            nh = crop_size
            nw = int(nh * aspect)
        else:
            nw = crop_size
            nh = int(nw / aspect)
        image = cv2.resize(image, (nw, nh))
        mask = cv2.resize(mask, (nw, nh))
    return image, mask


def _pad_square_and_fit(image, mask, crop_size):
    """Pad to square then scale so the mask bbox fits in crop_size
    (mask_processing.py:31-46). Returns (image, mask, resize_factor,
    padding, padding_side)."""
    cv2 = _cv2()
    height, width = image.shape[:2]
    if height < width:
        padding = width - height
        image = np.pad(
            image,
            ((padding // 2, padding - padding // 2), (0, 0), (0, 0)),
            "constant",
        )
        mask = np.pad(
            mask, ((padding // 2, padding - padding // 2), (0, 0)), "constant"
        )
        side = "h"
    else:
        padding = height - width
        image = np.pad(
            image,
            ((0, 0), (padding // 2, padding - padding // 2), (0, 0)),
            "constant",
        )
        mask = np.pad(
            mask, ((0, 0), (padding // 2, padding - padding // 2)), "constant"
        )
        side = "w"
    x, y, w, h = cv2.boundingRect(mask)
    factor = crop_size / max(w, h)
    image = cv2.resize(image, (0, 0), fx=factor, fy=factor)
    mask = cv2.resize(mask, (0, 0), fx=factor, fy=factor)
    return image, mask, factor, padding, side


def crop_for_filling_pre(
    image: np.ndarray, mask: np.ndarray, crop_size: int = 512
) -> Tuple[np.ndarray, np.ndarray]:
    """Crop a crop_size² window centred on the mask bbox, upscaling or
    padding first when needed (mask_processing.py:7-52)."""
    cv2 = _cv2()
    image, mask = _resize_min_side(image, mask, crop_size)
    x, y, w, h = cv2.boundingRect(mask)
    if w > crop_size or h > crop_size:
        image, mask, _, _, _ = _pad_square_and_fit(image, mask, crop_size)
        x, y, w, h = cv2.boundingRect(mask)
    height, width = image.shape[:2]
    crop_x = min(max(x + w // 2 - crop_size // 2, 0), width - crop_size)
    crop_y = min(max(y + h // 2 - crop_size // 2, 0), height - crop_size)
    return (
        image[crop_y : crop_y + crop_size, crop_x : crop_x + crop_size],
        mask[crop_y : crop_y + crop_size, crop_x : crop_x + crop_size],
    )


def crop_for_filling_post(
    image: np.ndarray,
    mask: np.ndarray,
    filled_image: np.ndarray,
    crop_size: int = 512,
) -> np.ndarray:
    """Paste a filled crop back into the original image, only under the mask
    (mask_processing.py:55-131)."""
    cv2 = _cv2()
    image_copy = image.copy()
    mask_copy = mask.copy()
    height_ori, width_ori = image.shape[:2]

    # work on copies — the reference writes the filled crop into the caller's
    # array in-place when no resize happens (mask_processing.py:115), a
    # side-effect quirk deliberately not reproduced (SURVEY.md §7)
    image, mask = _resize_min_side(image.copy(), mask.copy(), crop_size)
    x, y, w, h = cv2.boundingRect(mask)
    flag_padding = w > crop_size or h > crop_size
    if flag_padding:
        image, mask, resize_factor, padding, padding_side = (
            _pad_square_and_fit(image, mask, crop_size)
        )
        x, y, w, h = cv2.boundingRect(mask)
    height, width = image.shape[:2]
    crop_x = min(max(x + w // 2 - crop_size // 2, 0), width - crop_size)
    crop_y = min(max(y + h // 2 - crop_size // 2, 0), height - crop_size)

    image[crop_y : crop_y + crop_size, crop_x : crop_x + crop_size] = (
        filled_image
    )
    if flag_padding:
        image = cv2.resize(
            image, (0, 0), fx=1 / resize_factor, fy=1 / resize_factor
        )
        if padding_side == "h":
            image = image[padding // 2 : padding // 2 + height_ori, :]
        else:
            image = image[:, padding // 2 : padding // 2 + width_ori]
    image = cv2.resize(image, (width_ori, height_ori))
    image_copy[mask_copy == 255] = image[mask_copy == 255]
    return image_copy


def resize_and_pad(
    image: np.ndarray, mask: np.ndarray, target_size: int = 512
) -> Tuple[np.ndarray, np.ndarray, Tuple[int, int, int, int]]:
    """Long-side resize + centre pad to target_size²
    (crop_for_replacing.py resize_and_pad)."""
    cv2 = _cv2()
    height, width = image.shape[:2]
    scale = target_size / max(height, width)
    nh, nw = int(height * scale), int(width * scale)
    image_r = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
    mask_r = cv2.resize(mask, (nw, nh), interpolation=cv2.INTER_LINEAR)
    ph, pw = target_size - nh, target_size - nw
    top, left = ph // 2, pw // 2
    image_p = np.pad(
        image_r, ((top, ph - top), (left, pw - left), (0, 0)), mode="constant"
    )
    mask_p = np.pad(
        mask_r, ((top, ph - top), (left, pw - left)), mode="constant"
    )
    return image_p, mask_p, (top, ph - top, left, pw - left)


def recover_size(
    image_padded: np.ndarray,
    mask_padded: np.ndarray,
    orig_size: Tuple[int, int],
    padding_factors: Tuple[int, int, int, int],
) -> Tuple[np.ndarray, np.ndarray]:
    """Inverse of resize_and_pad (crop_for_replacing.py recover_size)."""
    cv2 = _cv2()
    h, w = image_padded.shape[:2]
    top, bottom, left, right = padding_factors
    image = image_padded[top : h - bottom, left : w - right]
    mask = mask_padded[top : h - bottom, left : w - right]
    image = cv2.resize(image, orig_size[::-1], interpolation=cv2.INTER_LINEAR)
    mask = cv2.resize(mask, orig_size[::-1], interpolation=cv2.INTER_LINEAR)
    return image, mask


def paste_object(
    source: np.ndarray,
    source_mask: np.ndarray,
    target: np.ndarray,
    target_coords: Tuple[int, int],
    resize_scale: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Cut the masked object out of ``source`` and paste it into ``target``
    centred at ``target_coords`` (paste_object.py). Returns (image, mask)."""
    cv2 = _cv2()
    assert target_coords[0] < target.shape[1]
    assert target_coords[1] < target.shape[0]
    x, y, w, h = cv2.boundingRect(source_mask)
    obj = source[y : y + h, x : x + w]
    obj_msk = source_mask[y : y + h, x : x + w]
    if resize_scale != 1:
        obj = cv2.resize(obj, (0, 0), fx=resize_scale, fy=resize_scale)
        obj_msk = cv2.resize(obj_msk, (0, 0), fx=resize_scale, fy=resize_scale)
        _, _, w, h = cv2.boundingRect(obj_msk)

    # clip the object when the paste centre is near the target border
    xt = max(0, target_coords[0] - w // 2)
    yt = max(0, target_coords[1] - h // 2)
    if target_coords[0] - w // 2 < 0:
        obj = obj[:, w // 2 - target_coords[0] :]
        obj_msk = obj_msk[:, w // 2 - target_coords[0] :]
    if target_coords[1] - h // 2 < 0:
        obj = obj[h // 2 - target_coords[1] :, :]
        obj_msk = obj_msk[h // 2 - target_coords[1] :, :]
    hh = min(obj.shape[0], target.shape[0] - yt)
    ww = min(obj.shape[1], target.shape[1] - xt)
    obj = obj[:hh, :ww]
    obj_msk = obj_msk[:hh, :ww]

    out = target.copy()
    region = out[yt : yt + hh, xt : xt + ww]
    sel = obj_msk > 0
    region[sel] = obj[sel]
    out[yt : yt + hh, xt : xt + ww] = region
    out_mask = np.zeros(target.shape[:2], dtype=np.uint8)
    out_mask[yt : yt + hh, xt : xt + ww][sel] = 255
    return out, out_mask
