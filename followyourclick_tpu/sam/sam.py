"""Sam model wrapper: preprocessing, encoder+decoder composition,
mask postprocessing.

Behavior spec: reference ``segment_anything/modeling/sam.py`` — pixel
mean/std normalisation + zero-pad to 1024² (:164-172), mask_threshold 0.0,
postprocess: upsample decoder masks to 1024, crop the un-padded region,
resize to the original image size (:140-162). Registry variants per
``build_sam.py:14-51``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from followyourclick_tpu.sam.image_encoder import ImageEncoderViT
from followyourclick_tpu.sam.mask_decoder import MaskDecoder
from followyourclick_tpu.sam.prompt_encoder import PromptEncoder

PIXEL_MEAN = (123.675, 116.28, 103.53)
PIXEL_STD = (58.395, 57.12, 57.375)
MASK_THRESHOLD = 0.0


@dataclasses.dataclass(frozen=True)
class SamConfig:
    """Encoder variant hyper-parameters (build_sam.py)."""

    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    img_size: int = 1024
    prompt_embed_dim: int = 256
    vit_patch_size: int = 16
    mask_in_chans: int = 16
    dtype: jnp.dtype = jnp.float32

    @property
    def image_embedding_size(self) -> Tuple[int, int]:
        g = self.img_size // self.vit_patch_size
        return (g, g)


# name → config, mirroring sam_model_registry (build_sam.py:47-51)
sam_model_registry = {
    "default": SamConfig(),
    "vit_h": SamConfig(),
    "vit_l": SamConfig(embed_dim=1024, depth=24, num_heads=16,
                       global_attn_indexes=(5, 11, 17, 23)),
    "vit_b": SamConfig(embed_dim=768, depth=12, num_heads=12,
                       global_attn_indexes=(2, 5, 8, 11)),
    # tiny variant for hermetic tests (not in the reference registry)
    "vit_t": SamConfig(embed_dim=64, depth=2, num_heads=2,
                       global_attn_indexes=(1,), img_size=128),
}


class Sam(nn.Module):
    config: SamConfig = SamConfig()

    def setup(self):
        cfg = self.config
        self.image_encoder = ImageEncoderViT(
            img_size=cfg.img_size, patch_size=cfg.vit_patch_size,
            embed_dim=cfg.embed_dim, depth=cfg.depth,
            num_heads=cfg.num_heads, out_chans=cfg.prompt_embed_dim,
            global_attn_indexes=cfg.global_attn_indexes, dtype=cfg.dtype,
        )
        self.prompt_encoder = PromptEncoder(
            embed_dim=cfg.prompt_embed_dim,
            image_embedding_size=cfg.image_embedding_size,
            input_image_size=(cfg.img_size, cfg.img_size),
            mask_in_chans=cfg.mask_in_chans, dtype=cfg.dtype,
        )
        self.mask_decoder = MaskDecoder(
            transformer_dim=cfg.prompt_embed_dim, dtype=cfg.dtype
        )

    def preprocess(self, x: jnp.ndarray) -> jnp.ndarray:
        """Normalise (B, h, w, 3) RGB [0,255] and zero-pad to img_size²."""
        x = (x - jnp.asarray(PIXEL_MEAN)) / jnp.asarray(PIXEL_STD)
        h, w = x.shape[1:3]
        size = self.config.img_size
        return jnp.pad(x, ((0, 0), (0, size - h), (0, size - w), (0, 0)))

    def encode_image(self, x: jnp.ndarray) -> jnp.ndarray:
        """Preprocessed image → (B, 64, 64, 256) embedding."""
        return self.image_encoder(x)

    def predict_from_embedding(
        self,
        image_embeddings: jnp.ndarray,
        point_coords: Optional[jnp.ndarray] = None,
        point_labels: Optional[jnp.ndarray] = None,
        boxes: Optional[jnp.ndarray] = None,
        mask_input: Optional[jnp.ndarray] = None,
        multimask_output: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Prompt encode + mask decode (the cheap interactive path).
        Returns (low-res mask logits (B, K, 256, 256), iou (B, K))."""
        points = None
        if point_coords is not None:
            points = (point_coords, point_labels)
        sparse, dense = self.prompt_encoder(
            points=points, boxes=boxes, masks=mask_input
        )
        return self.mask_decoder(
            image_embeddings,
            self.prompt_encoder.get_dense_pe(),
            sparse,
            dense,
            multimask_output=multimask_output,
        )

    def __call__(
        self,
        image: jnp.ndarray,
        point_coords: jnp.ndarray,
        point_labels: jnp.ndarray,
        multimask_output: bool = True,
    ):
        emb = self.encode_image(self.preprocess(image))
        return self.predict_from_embedding(
            emb, point_coords, point_labels,
            multimask_output=multimask_output,
        )


def postprocess_masks(
    masks: jnp.ndarray,
    input_size: Tuple[int, int],
    original_size: Tuple[int, int],
    img_size: int = 1024,
) -> jnp.ndarray:
    """(B, K, 256, 256) logits → (B, K, H_orig, W_orig) (sam.py:140-162):
    bilinear to img_size², crop the valid (pre-padding) region, bilinear to
    the original size."""
    B, K = masks.shape[:2]
    x = jax.image.resize(
        masks, (B, K, img_size, img_size), method="bilinear"
    )
    x = x[:, :, : input_size[0], : input_size[1]]
    return jax.image.resize(
        x, (B, K) + tuple(original_size), method="bilinear"
    )
