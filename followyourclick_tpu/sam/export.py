"""Deployable single-call SAM decoder — the TPU-native analogue of the
reference's ONNX export (``segment_anything/utils/onnx.py``: SamOnnxModel
wraps prompt-encode + mask-decode + post-processing into one traced graph
for cheap interactive use once image embeddings are cached).

Here the artifact is a StableHLO module serialized with ``jax.export`` —
loadable by any JAX/XLA runtime (including serving containers without the
Python model code). XLA requires static shapes, so the original image size
is a build-time constant rather than the ONNX model's dynamic input
(documented deviation).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from followyourclick_tpu.sam.sam import Sam


def build_decoder_fn(
    model: Sam,
    variables,
    orig_im_size: Tuple[int, int],
    return_single_mask: bool = True,
    use_stability_score: bool = False,
):
    """(image_embeddings, point_coords, point_labels, mask_input,
    has_mask_input) → (masks, iou_scores, low_res_masks), mirroring
    SamOnnxModel.forward (onnx.py:108-142).

    - ``point_coords``: (B, N, 2) in 1024-scale pixel space, padded with a
      (0, 0) point labelled −1 (the reference's convention).
    - ``mask_input``: (B, 256, 256, 1) low-res logits; ``has_mask_input``:
      (B, 1, 1, 1) 0/1 gate blending against ``no_mask_embed``.
    - single-mask selection uses the reference's control-flow-free score
      reweight over all 4 mask tokens (onnx.py:92-106).
    """
    img_size = model.config.img_size
    h0, w0 = orig_im_size
    scale = img_size / max(h0, w0)
    prepad_h = int(np.floor(h0 * scale + 0.5))
    prepad_w = int(np.floor(w0 * scale + 0.5))

    def fn(image_embeddings, point_coords, point_labels, mask_input,
           has_mask_input):
        def run(m: Sam):
            sparse = m.prompt_encoder._embed_points(
                point_coords, point_labels, pad=False)
            dense = has_mask_input * m.prompt_encoder._embed_masks(mask_input)
            dense = dense + (1.0 - has_mask_input) * \
                m.prompt_encoder.no_mask_embed.reshape(1, 1, 1, -1)
            masks, scores = m.mask_decoder(
                image_embeddings, m.prompt_encoder.get_dense_pe(),
                sparse, dense, return_all_tokens=True)
            return masks, scores

        masks, scores = model.apply(variables, method=run)

        if use_stability_score:
            scores = _stability_score(masks, 0.0, 1.0)  # mask_threshold 0.0
            # (reference Sam.mask_threshold, modeling/sam.py:19)

        if return_single_mask:
            # multiclick (>2 points incl. padding) → single-mask token 0;
            # otherwise best of the multimask tokens (onnx.py:92-106)
            num_points = point_coords.shape[1]
            reweight = jnp.asarray(
                [[1000.0] + [0.0] * (masks.shape[1] - 1)], jnp.float32)
            score = scores + (num_points - 2.5) * reweight
            best = jnp.argmax(score, axis=1)
            b_idx = jnp.arange(masks.shape[0])
            masks = masks[b_idx, best][:, None]
            scores = scores[b_idx, best][:, None]

        # mask_postprocessing (onnx.py:76-90): up to img_size², crop the
        # pre-padded region, resize to the original size
        B, K = masks.shape[:2]
        up = jax.image.resize(masks, (B, K, img_size, img_size),
                              method="bilinear")
        up = up[:, :, :prepad_h, :prepad_w]
        up = jax.image.resize(up, (B, K, h0, w0), method="bilinear")
        return up, scores, masks

    return fn


def _stability_score(masks: jnp.ndarray, threshold: float,
                     offset: float) -> jnp.ndarray:
    """IoU between the ±offset threshold level sets (amg.py
    calculate_stability_score)."""
    high = (masks > threshold + offset).sum(axis=(-1, -2)).astype(jnp.float32)
    low = (masks > threshold - offset).sum(axis=(-1, -2)).astype(jnp.float32)
    return high / jnp.maximum(low, 1.0)


def export_decoder(
    model: Sam,
    variables,
    orig_im_size: Tuple[int, int],
    batch: int = 1,
    num_points: int = 2,
    return_single_mask: bool = True,
) -> bytes:
    """Serialize the decoder to a portable StableHLO artifact (the ONNX-file
    equivalent). Reload with ``jax.export.deserialize(blob).call(...)``."""
    from jax import export as jax_export

    fn = build_decoder_fn(model, variables, orig_im_size,
                          return_single_mask=return_single_mask)
    e = model.config.prompt_embed_dim
    hw = model.config.image_embedding_size
    args = (
        jax.ShapeDtypeStruct((batch,) + hw + (e,), jnp.float32),
        jax.ShapeDtypeStruct((batch, num_points, 2), jnp.float32),
        jax.ShapeDtypeStruct((batch, num_points), jnp.float32),
        jax.ShapeDtypeStruct((batch, 4 * hw[0], 4 * hw[1], 1), jnp.float32),
        jax.ShapeDtypeStruct((batch, 1, 1, 1), jnp.float32),
    )
    exported = jax_export.export(jax.jit(fn))(*args)
    return exported.serialize()
