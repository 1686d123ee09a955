"""SAM prompt encoder.

Behavior spec: reference ``segment_anything/modeling/prompt_encoder.py`` —
random-Fourier positional encoding (PositionEmbeddingRandom :171-214), four
learned point embeddings (neg point, pos point, box corner 1, box corner 2)
plus a not-a-point embedding, a conv mask-downscaling path, and a no-mask
embedding broadcast as the dense embedding when no mask prompt is given.

Point semantics (:73-92): coordinates are shifted +0.5 to pixel centres,
label 1 = foreground, 0 = background, -1 = padding (embedding zeroed, then
not_a_point_embed added). Boxes are two corner points (:93-101).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


class PositionEmbeddingRandom(nn.Module):
    """Random spatial Fourier features (prompt_encoder.py:171-214):
    coords in [0,1]² → 2c-1 → @ N(0,scale)² matrix → 2π → [sin | cos]."""

    num_pos_feats: int = 128
    scale: float = 1.0

    def setup(self):
        self.gaussian_matrix = self.param(
            "positional_encoding_gaussian_matrix",
            nn.initializers.normal(self.scale),
            (2, self.num_pos_feats),
        )

    def _encode(self, coords: jnp.ndarray) -> jnp.ndarray:
        coords = 2 * coords - 1
        coords = coords @ self.gaussian_matrix
        coords = 2 * jnp.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)

    def __call__(self, size: Tuple[int, int]) -> jnp.ndarray:
        """Dense PE grid ``(H, W, 2*num_pos_feats)`` for the image embedding."""
        h, w = size
        y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(
            jnp.meshgrid(x, y, indexing="xy"), axis=-1
        )  # (h, w, 2) with (x, y)
        return self._encode(grid)

    def forward_with_coords(
        self, coords: jnp.ndarray, image_size: Tuple[int, int]
    ) -> jnp.ndarray:
        """Encode pixel coordinates ``(..., 2)`` (x, y) normalised by the
        input image size."""
        scaled = coords / jnp.asarray(
            [image_size[1], image_size[0]], dtype=coords.dtype
        )
        return self._encode(scaled)


class PromptEncoder(nn.Module):
    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        # 0: negative point, 1: positive point, 2/3: box corners
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0),
            (4, self.embed_dim),
        )
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0),
            (1, self.embed_dim),
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, self.embed_dim)
        )
        self.mask_conv1 = nn.Conv(
            self.mask_in_chans // 4, (2, 2), strides=(2, 2),
            dtype=self.dtype, name="mask_conv1",
        )
        self.mask_conv2 = nn.Conv(
            self.mask_in_chans, (2, 2), strides=(2, 2), dtype=self.dtype,
            name="mask_conv2",
        )
        self.mask_conv3 = nn.Conv(
            self.embed_dim, (1, 1), dtype=self.dtype, name="mask_conv3"
        )
        from followyourclick_tpu.sam.image_encoder import LayerNorm2d

        self.mask_ln1 = LayerNorm2d(name="mask_ln1")
        self.mask_ln2 = LayerNorm2d(name="mask_ln2")

    def get_dense_pe(self) -> jnp.ndarray:
        """(1, H, W, embed_dim) PE of the image-embedding grid."""
        return self.pe_layer(self.image_embedding_size)[None]

    def _embed_points(
        self, points: jnp.ndarray, labels: jnp.ndarray, pad: bool
    ) -> jnp.ndarray:
        points = points + 0.5  # centre of pixel
        if pad:
            points = jnp.concatenate(
                [points, jnp.zeros_like(points[:, :1])], axis=1
            )
            labels = jnp.concatenate(
                [labels, -jnp.ones_like(labels[:, :1])], axis=1
            )
        pe = self.pe_layer.forward_with_coords(points, self.input_image_size)
        lbl = labels[..., None]
        pe = jnp.where(lbl == -1, 0.0, pe)
        pe = pe + jnp.where(lbl == -1, self.not_a_point_embed[0], 0.0)
        pe = pe + jnp.where(lbl == 0, self.point_embeddings[0], 0.0)
        pe = pe + jnp.where(lbl == 1, self.point_embeddings[1], 0.0)
        return pe

    def _embed_boxes(self, boxes: jnp.ndarray) -> jnp.ndarray:
        boxes = boxes + 0.5
        corners = boxes.reshape(-1, 2, 2)
        pe = self.pe_layer.forward_with_coords(corners, self.input_image_size)
        pe = pe.at[:, 0, :].add(self.point_embeddings[2])
        pe = pe.at[:, 1, :].add(self.point_embeddings[3])
        return pe

    def _embed_masks(self, masks: jnp.ndarray) -> jnp.ndarray:
        x = nn.gelu(self.mask_ln1(self.mask_conv1(masks)), approximate=False)
        x = nn.gelu(self.mask_ln2(self.mask_conv2(x)), approximate=False)
        return self.mask_conv3(x)

    def __call__(
        self,
        points: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        boxes: Optional[jnp.ndarray] = None,
        masks: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (sparse (B, N, embed_dim), dense (B, H, W, embed_dim))
        embeddings (prompt_encoder.py:128-169). masks are NHWC (B, 4H, 4W, 1).
        """
        if points is not None:
            bs = points[0].shape[0]
        elif boxes is not None:
            bs = boxes.shape[0]
        elif masks is not None:
            bs = masks.shape[0]
        else:
            bs = 1
        sparse = jnp.zeros((bs, 0, self.embed_dim), self.dtype)
        if points is not None:
            coords, labels = points
            sparse = jnp.concatenate(
                [sparse, self._embed_points(coords, labels, pad=boxes is None)],
                axis=1,
            )
        if boxes is not None:
            sparse = jnp.concatenate(
                [sparse, self._embed_boxes(boxes)], axis=1
            )
        if masks is not None:
            dense = self._embed_masks(masks)
        else:
            dense = jnp.broadcast_to(
                self.no_mask_embed.reshape(1, 1, 1, -1),
                (bs,) + self.image_embedding_size + (self.embed_dim,),
            )
        return sparse, dense
