"""IP-Adapter image-prompt conditioning: CLIP-vision tower + token projection.

Behavior spec: reference ``ip_adapter/my_ip_adapter.py`` (``MyIPAdapter``
:48-134, ``MyIPAdapterPlus`` :218-304) and ``ip_adapter/resampler.py``
(``PerceiverAttention`` :34-78, ``Resampler`` :81-147). The decoupled ip
key/value cross-attention lives in ``models/attention.py::CrossAttention``
(``ip_num_tokens``); ip weights are grafted onto ``to_k_ip``/``to_v_ip``
params by ``utils/loaders.load_ip_adapter`` (reference ``load_ip_adapter``
:103-125).

TPU design: ip tokens are timestep-independent, so the pipeline computes them
once per clip and concatenates onto the text context *outside* the denoise
scan (the reference re-projects inside every UNet call, unet.py:592-594).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from followyourclick_tpu.ops.attention import dot_product_attention


@dataclass(frozen=True)
class CLIPVisionConfig:
    """CLIP ViT (the reference uses ViT-H/14 for IP-Adapter)."""

    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_hidden_layers: int = 32
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 1024
    layer_norm_eps: float = 1e-5


class CLIPVisionLayer(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        heads = cfg.num_attention_heads
        head_dim = cfg.hidden_size // heads

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm1")(x)
        b, s, _ = h.shape

        def proj(name):
            return nn.Dense(cfg.hidden_size, dtype=self.dtype, name=name)

        q = proj("q_proj")(h).reshape(b, s, heads, head_dim)
        k = proj("k_proj")(h).reshape(b, s, heads, head_dim)
        v = proj("v_proj")(h).reshape(b, s, heads, head_dim)
        attn = dot_product_attention(q, k, v).reshape(b, s, cfg.hidden_size)
        x = x + proj("out_proj")(attn)

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     name="mlp_fc1")(h)
        h = h * nn.sigmoid(1.702 * h)  # quick_gelu
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPVisionModel(nn.Module):
    """Returns (image_embeds [projected], penultimate_hidden_states).

    ``image_embeds`` feed the vanilla IP-Adapter's ImageProjModel; the
    penultimate hidden states feed the Plus variant's Resampler
    (reference my_ip_adapter.py:127-134, :274-284).
    """

    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray  # (B, H, W, 3), normalized
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        b = pixel_values.shape[0]
        patches = nn.Conv(cfg.hidden_size,
                          (cfg.patch_size, cfg.patch_size),
                          strides=(cfg.patch_size, cfg.patch_size),
                          use_bias=False, dtype=self.dtype,
                          name="patch_embedding")(pixel_values)
        patches = patches.reshape(b, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,), jnp.float32)
        cls = jnp.broadcast_to(cls.astype(patches.dtype),
                               (b, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)
        n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = nn.Embed(n_pos, cfg.hidden_size, dtype=self.dtype,
                       name="position_embedding")(jnp.arange(x.shape[1])[None])
        x = x + pos
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="pre_layrnorm")(x)

        penultimate = None
        for i in range(cfg.num_hidden_layers):
            if i == cfg.num_hidden_layers - 1:
                penultimate = x
            x = CLIPVisionLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x)

        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name="post_layernorm")(x[:, 0])
        image_embeds = nn.Dense(cfg.projection_dim, use_bias=False,
                                dtype=self.dtype,
                                name="visual_projection")(pooled)
        return image_embeds, penultimate


class ImageProjModel(nn.Module):
    """Linear → N tokens → LayerNorm (vanilla IP-Adapter projection;
    reference ip_adapter/my_ip_adapter.py ImageProjModel)."""

    cross_attention_dim: int = 768
    num_tokens: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds: jnp.ndarray) -> jnp.ndarray:
        b = image_embeds.shape[0]
        x = nn.Dense(self.num_tokens * self.cross_attention_dim,
                     dtype=self.dtype, name="proj")(image_embeds)
        x = x.reshape(b, self.num_tokens, self.cross_attention_dim)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class PerceiverAttention(nn.Module):
    """Concat-kv attention with f16-stable dual-sqrt scaling
    (reference resampler.py:34-78)."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, latents: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim_head * self.heads
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        latents = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(latents)
        b, l, _ = latents.shape

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name="to_q")(latents)
        kv_input = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype,
                      name="to_kv")(kv_input)
        k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads, self.dim_head)

        scale = 1.0 / math.sqrt(math.sqrt(self.dim_head))
        out = dot_product_attention(split_heads(q) * scale,
                                    split_heads(k) * scale,
                                    split_heads(v), scale=1.0)
        out = out.reshape(b, l, inner)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        name="to_out")(out)


class Resampler(nn.Module):
    """Perceiver-style token resampler (IP-Adapter-Plus projection;
    reference resampler.py:81-147)."""

    dim: int = 1024
    depth: int = 4
    dim_head: int = 64
    heads: int = 12
    num_queries: int = 16
    embedding_dim: int = 1280
    output_dim: int = 768
    ff_mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        latents = self.param(
            "latents",
            lambda key, shape: jax.random.normal(key, shape) / self.dim ** 0.5,
            (1, self.num_queries, self.dim))
        latents = jnp.broadcast_to(latents.astype(x.dtype),
                                   (b, self.num_queries, self.dim))
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(x)

        for i in range(self.depth):
            latents = PerceiverAttention(
                dim=self.dim, dim_head=self.dim_head, heads=self.heads,
                dtype=self.dtype, name=f"layers_{i}_attn")(x, latents) + latents
            # reference FeedForward: LayerNorm -> Linear -> GELU -> Linear
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"layers_{i}_ff_norm")(latents)
            h = nn.Dense(self.dim * self.ff_mult, use_bias=False,
                         dtype=self.dtype, name=f"layers_{i}_ff_in")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                         name=f"layers_{i}_ff_out")(h)
            latents = h + latents

        latents = nn.Dense(self.output_dim, dtype=self.dtype,
                           name="proj_out")(latents)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_out")(latents)


class IPAdapter(nn.Module):
    """Full image-prompt encoder: CLIP-vision → ImageProjModel (vanilla) or
    Resampler over penultimate states (plus). Returns (cond_tokens,
    uncond_tokens) ready to concatenate onto the text context."""

    vision_config: CLIPVisionConfig
    cross_attention_dim: int = 768
    num_tokens: int = 4
    plus: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray,
                 uncond_pixel_values: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        vision = CLIPVisionModel(self.vision_config, dtype=self.dtype,
                                 name="image_encoder")
        if self.plus:
            proj = Resampler(
                dim=self.cross_attention_dim,
                depth=4, dim_head=64,
                heads=self.cross_attention_dim // 64,
                num_queries=self.num_tokens,
                embedding_dim=self.vision_config.hidden_size,
                output_dim=self.cross_attention_dim, dtype=self.dtype,
                name="image_proj_model")
            _, hidden = vision(pixel_values)
            cond = proj(hidden)
            if uncond_pixel_values is None:
                # reference Plus: CLIP features of a black image (:274-284)
                uncond_pixel_values = jnp.zeros_like(pixel_values)
            _, uncond_hidden = vision(uncond_pixel_values)
            uncond = proj(uncond_hidden)
        else:
            proj = ImageProjModel(
                cross_attention_dim=self.cross_attention_dim,
                num_tokens=self.num_tokens, dtype=self.dtype,
                name="image_proj_model")
            embeds, _ = vision(pixel_values)
            cond = proj(embeds)
            # reference vanilla: zeros embedding for uncond (:127-134)
            uncond = proj(jnp.zeros_like(embeds))
        return cond, uncond
