"""CLIP ViT-L/14 text encoder — SD-1.5's prompt tower, built natively.

Behavior spec: the HF ``CLIPTextModel`` the reference loads at
``scripts/inference.py:153`` (``transformers`` CLIP text encoder with
quick-gelu, causal mask, final layer norm). The pipeline consumes
``last_hidden_state`` (reference ``pipeline_animation.py:214-230``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from followyourclick_tpu.config import CLIPTextConfig
from followyourclick_tpu.models.layers import get_activation
from followyourclick_tpu.ops.attention import dot_product_attention


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        heads = cfg.num_attention_heads
        head_dim = cfg.hidden_size // heads

        def proj(name):
            return nn.Dense(cfg.hidden_size, dtype=self.dtype, name=name)

        b, s, _ = x.shape
        q = proj("q_proj")(x).reshape(b, s, heads, head_dim)
        k = proj("k_proj")(x).reshape(b, s, heads, head_dim)
        v = proj("v_proj")(x).reshape(b, s, heads, head_dim)
        out = dot_product_attention(q, k, v, bias=mask)
        out = out.reshape(b, s, cfg.hidden_size)
        return proj("out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        act = get_activation(cfg.hidden_act)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm1")(x)
        x = x + CLIPAttention(cfg, dtype=self.dtype, name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     name="mlp_fc1")(h)
        h = act(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Returns (last_hidden_state, pooled_output)."""

    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=self.dtype, name="position_embedding")(
            jnp.arange(s)[None, :])
        x = tok + pos

        # causal mask (CLIP text is autoregressive-masked)
        causal = jnp.tril(jnp.ones((s, s), dtype=bool))
        mask = jnp.where(causal, 0.0, -jnp.inf).astype(jnp.float32)
        mask = mask[None, None]  # (1, 1, S, S) broadcast over batch, heads

        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype,
                                 name=f"layers_{i}")(x, mask)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="final_layer_norm")(x)

        # pooled output = hidden state at the eot token (highest token id)
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(b), eot]
        return x, pooled
