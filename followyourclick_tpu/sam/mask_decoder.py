"""SAM mask decoder: two-way transformer + hypernetwork mask heads.

Behavior spec: reference ``segment_anything/modeling/mask_decoder.py``
(iou/mask tokens :49-51, 4x transposed-conv upscaling :53-59, per-token
hypernetwork MLPs :60-66, IoU head :67-69, multimask slice :101-107) and
``modeling/transformer.py`` (TwoWayTransformer/TwoWayAttentionBlock: token
self-attn → token→image cross-attn (downsample rate 2) → MLP → image→token
cross-attn, PE re-added at every layer, skip_first_layer_pe on block 0).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from followyourclick_tpu.sam.image_encoder import LayerNorm2d


class DownsampledAttention(nn.Module):
    """Attention with internal dim = embed_dim / downsample_rate
    (transformer.py:185-240)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v) -> jnp.ndarray:
        internal = self.embedding_dim // self.downsample_rate
        head_dim = internal // self.num_heads
        q = nn.Dense(internal, dtype=self.dtype, name="q_proj")(q)
        k = nn.Dense(internal, dtype=self.dtype, name="k_proj")(k)
        v = nn.Dense(internal, dtype=self.dtype, name="v_proj")(v)

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_heads, head_dim).transpose(
                0, 2, 1, 3
            )

        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum("bhqc,bhkc->bhqk", q, k) / (head_dim**0.5)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        b, h, n, c = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * c)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = DownsampledAttention(
                self.embedding_dim, self.num_heads, dtype=self.dtype,
                name="self_attn",
            )(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + DownsampledAttention(
                self.embedding_dim, self.num_heads, dtype=self.dtype,
                name="self_attn",
            )(q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DownsampledAttention(
            self.embedding_dim, self.num_heads,
            self.attention_downsample_rate, dtype=self.dtype,
            name="cross_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(queries)

        mlp = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_lin1")(queries)
        mlp = nn.Dense(
            self.embedding_dim, dtype=self.dtype, name="mlp_lin2"
        )(nn.relu(mlp))
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(queries + mlp)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DownsampledAttention(
            self.embedding_dim, self.num_heads,
            self.attention_downsample_rate, dtype=self.dtype,
            name="cross_attn_image_to_token",
        )(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_embedding: jnp.ndarray,  # (B, H, W, C)
        image_pe: jnp.ndarray,         # (B, H, W, C)
        point_embedding: jnp.ndarray,  # (B, N, C)
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, H, W, C = image_embedding.shape
        keys = image_embedding.reshape(B, H * W, C)
        key_pe = image_pe.reshape(B, H * W, C)
        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embedding_dim, self.num_heads, self.mlp_dim,
                skip_first_layer_pe=(i == 0), dtype=self.dtype,
                name=f"layer{i}",
            )(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + DownsampledAttention(
            self.embedding_dim, self.num_heads, 2, dtype=self.dtype,
            name="final_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_final_attn")(queries)
        return queries, keys


class HyperMLP(nn.Module):
    """3-layer ReLU MLP (mask_decoder.py MLP :154-176)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    sigmoid_output: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = (
                self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            )
            x = nn.Dense(out, dtype=self.dtype, name=f"layer{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x


class MaskDecoder(nn.Module):
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    depth: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_embeddings: jnp.ndarray,       # (1 or B, H, W, C)
        image_pe: jnp.ndarray,               # (1, H, W, C)
        sparse_prompt_embeddings: jnp.ndarray,  # (B, N, C)
        dense_prompt_embeddings: jnp.ndarray,   # (B, H, W, C)
        multimask_output: bool = True,
        return_all_tokens: bool = False,  # predict_masks semantics (all
        # num_mask_tokens outputs, used by the export path / onnx.py:119-125)
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        num_mask_tokens = self.num_multimask_outputs + 1
        iou_token = self.param(
            "iou_token", nn.initializers.normal(1.0), (1, self.transformer_dim)
        )
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0),
            (num_mask_tokens, self.transformer_dim),
        )
        B = sparse_prompt_embeddings.shape[0]
        output_tokens = jnp.broadcast_to(
            jnp.concatenate([iou_token, mask_tokens], axis=0)[None],
            (B, 1 + num_mask_tokens, self.transformer_dim),
        )
        tokens = jnp.concatenate(
            [output_tokens, sparse_prompt_embeddings], axis=1
        )

        # per-prompt copy of the image embedding (mask_decoder.py:136-140)
        src = (
            jnp.broadcast_to(
                image_embeddings, (B,) + image_embeddings.shape[1:]
            )
            + dense_prompt_embeddings
        )
        pos_src = jnp.broadcast_to(image_pe, src.shape)

        hs, src = TwoWayTransformer(
            self.depth, self.transformer_dim, self.num_heads, self.mlp_dim,
            dtype=self.dtype, name="transformer",
        )(src, pos_src, tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1 : 1 + num_mask_tokens]

        H = W = int(round((src.shape[1]) ** 0.5))
        src = src.reshape(B, H, W, self.transformer_dim)
        # transpose_kernel=True + (kh, kw, out, in) kernels match torch
        # ConvTranspose2d semantics exactly (see sam/convert._conv_transpose)
        x = nn.ConvTranspose(
            self.transformer_dim // 4, (2, 2), strides=(2, 2),
            transpose_kernel=True, dtype=self.dtype, name="upscale_conv1",
        )(src)
        x = LayerNorm2d(name="upscale_ln")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.ConvTranspose(
            self.transformer_dim // 8, (2, 2), strides=(2, 2),
            transpose_kernel=True, dtype=self.dtype, name="upscale_conv2",
        )(x)
        upscaled = nn.gelu(x, approximate=False)  # (B, 4H, 4W, C/8)

        hyper_in = jnp.stack(
            [
                HyperMLP(
                    self.transformer_dim, self.transformer_dim // 8,
                    dtype=self.dtype, name=f"hyper_mlp{i}",
                )(mask_tokens_out[:, i])
                for i in range(num_mask_tokens)
            ],
            axis=1,
        )  # (B, num_mask_tokens, C/8)
        Bh, Hu, Wu, Cu = upscaled.shape
        masks = jnp.einsum(
            "bnc,bhwc->bnhw", hyper_in, upscaled
        )  # (B, tokens, 4H, 4W)

        iou_pred = HyperMLP(
            self.iou_head_hidden_dim, num_mask_tokens,
            num_layers=self.iou_head_depth, dtype=self.dtype,
            name="iou_prediction_head",
        )(iou_token_out)

        if return_all_tokens:
            return masks, iou_pred
        if multimask_output:
            return masks[:, 1:], iou_pred[:, 1:]
        return masks[:, :1], iou_pred[:, :1]
