"""SamPredictor: interactive click→mask with a cached image embedding.

Behavior spec: reference ``segment_anything/predictor.py`` (set_image caches
the ViT features once per image — the gradio app re-uses it per click,
Inpaint-Anything/app.py:42-50) and ``segment_anything/utils/transforms.py``
(ResizeLongestSide).

TPU-first: ``set_image`` runs the jitted ViT once; every subsequent
``predict`` call runs only the tiny prompt-encoder/decoder jit, so clicks
are interactive even with the ViT-H encoder.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from followyourclick_tpu.sam.sam import (
    MASK_THRESHOLD,
    Sam,
    SamConfig,
    postprocess_masks,
)


class ResizeLongestSide:
    """Resize so the longest side equals target_length
    (segment_anything/utils/transforms.py)."""

    def __init__(self, target_length: int):
        self.target_length = target_length

    @staticmethod
    def get_preprocess_shape(
        oldh: int, oldw: int, long_side_length: int
    ) -> Tuple[int, int]:
        scale = long_side_length * 1.0 / max(oldh, oldw)
        newh, neww = oldh * scale, oldw * scale
        return (int(newh + 0.5), int(neww + 0.5))

    def apply_image(self, image: np.ndarray) -> np.ndarray:
        import cv2

        target = self.get_preprocess_shape(
            image.shape[0], image.shape[1], self.target_length
        )
        return cv2.resize(
            image, (target[1], target[0]), interpolation=cv2.INTER_LINEAR
        )

    def apply_coords(
        self, coords: np.ndarray, original_size: Tuple[int, int]
    ) -> np.ndarray:
        old_h, old_w = original_size
        new_h, new_w = self.get_preprocess_shape(
            old_h, old_w, self.target_length
        )
        coords = np.asarray(coords, dtype=np.float32).copy()
        coords[..., 0] = coords[..., 0] * (new_w / old_w)
        coords[..., 1] = coords[..., 1] * (new_h / old_h)
        return coords

    def apply_boxes(
        self, boxes: np.ndarray, original_size: Tuple[int, int]
    ) -> np.ndarray:
        return self.apply_coords(
            np.asarray(boxes).reshape(-1, 2, 2), original_size
        ).reshape(-1, 4)


@functools.partial(jax.jit, static_argnums=(0,))
def _encode(model: Sam, variables, image):
    def fn(m: Sam, x):
        return m.encode_image(m.preprocess(x))

    return model.apply(variables, image, method=fn)


@functools.partial(jax.jit, static_argnums=(0, 7))
def _predict(model: Sam, variables, embedding, coords, labels, boxes,
             mask_input, multimask_output):
    return model.apply(
        variables,
        embedding,
        coords,
        labels,
        boxes,
        mask_input,
        multimask_output,
        method=Sam.predict_from_embedding,
    )


class SamPredictor:
    def __init__(self, model: Sam, variables: Dict[str, Any]):
        self.model = model
        self.variables = variables
        self.transform = ResizeLongestSide(model.config.img_size)
        self.reset_image()

    def reset_image(self) -> None:
        self.is_image_set = False
        self.features = None
        self.original_size: Optional[Tuple[int, int]] = None
        self.input_size: Optional[Tuple[int, int]] = None

    def set_image(self, image: np.ndarray) -> None:
        """image: (H, W, 3) RGB uint8. Runs the ViT once and caches the
        embedding (predictor.py set_image/set_torch_image)."""
        assert image.ndim == 3 and image.shape[2] == 3
        self.original_size = image.shape[:2]
        resized = self.transform.apply_image(image)
        self.input_size = resized.shape[:2]
        x = jnp.asarray(resized, jnp.float32)[None]
        self.features = _encode(self.model, self.variables, x)
        self.is_image_set = True

    def predict(
        self,
        point_coords: Optional[np.ndarray] = None,
        point_labels: Optional[np.ndarray] = None,
        box: Optional[np.ndarray] = None,
        mask_input: Optional[np.ndarray] = None,
        multimask_output: bool = True,
        return_logits: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (masks (K, H, W) bool, iou (K,), low_res_logits
        (K, 256, 256)) for the cached image — predictor.py predict()."""
        assert self.is_image_set, "set_image must be called first"
        coords = labels = None
        if point_coords is not None:
            assert point_labels is not None
            c = self.transform.apply_coords(point_coords, self.original_size)
            coords = jnp.asarray(c, jnp.float32)[None]
            labels = jnp.asarray(point_labels, jnp.int32)[None]
        boxes = None
        if box is not None:
            b = self.transform.apply_boxes(box, self.original_size)
            boxes = jnp.asarray(b, jnp.float32).reshape(1, 4)
        mi = None
        if mask_input is not None:
            mi = jnp.asarray(mask_input, jnp.float32)[None, ..., None]
        low_res, iou = _predict(
            self.model, self.variables, self.features, coords, labels, boxes,
            mi, multimask_output,
        )
        masks = postprocess_masks(
            low_res, self.input_size, self.original_size,
            self.model.config.img_size,
        )[0]
        iou = np.asarray(iou[0])
        low_res = np.asarray(low_res[0])
        masks = np.asarray(masks)
        if not return_logits:
            masks = masks > MASK_THRESHOLD
        return masks, iou, low_res

    def predict_batch(
        self,
        point_coords: np.ndarray,  # (B, N, 2) original-image pixels
        point_labels: np.ndarray,  # (B, N)
        multimask_output: bool = True,
        return_logits: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Many independent point prompts against the cached embedding in ONE
        decoder call — the device-efficient path the automatic mask generator
        uses (the reference loops torch batches, amg process_batch)."""
        assert self.is_image_set
        c = self.transform.apply_coords(point_coords, self.original_size)
        low_res, iou = _predict(
            self.model, self.variables, self.features,
            jnp.asarray(c, jnp.float32), jnp.asarray(point_labels, jnp.int32),
            None, None, multimask_output,
        )
        masks = postprocess_masks(
            low_res, self.input_size, self.original_size,
            self.model.config.img_size,
        )
        masks = np.asarray(masks)
        if not return_logits:
            masks = masks > MASK_THRESHOLD
        return masks, np.asarray(iou)

    def get_image_embedding(self) -> jnp.ndarray:
        assert self.is_image_set
        return self.features
