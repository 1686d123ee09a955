"""T5 encoder — the optional second text tower.

Behavior spec: the reference loads an HF ``T5EncoderModel`` as
``text_encoder_2`` (``pipeline_animation.py:44-123``, ``_encode_prompt_2``
:248-398); its hidden states are projected into cross-attention by the UNet's
zero-initialized ``text_encoder_proj_model_t5`` (``unet.py:597-599``) and
consumed by the zero-init ``attn_t5`` blocks (``attention.py:436-460``).

Standard T5 v1.1 encoder: relative position buckets, RMSNorm, gated-GELU MLP.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from followyourclick_tpu.ops.attention import dot_product_attention


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    gated_act: bool = True


class RMSNorm(nn.Module):
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                           jnp.float32)
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        normed = x.astype(jnp.float32) * jnp.reciprocal(
            jnp.sqrt(var + self.epsilon))
        return (normed * scale).astype(x.dtype)


def _relative_position_bucket(relative_position, num_buckets: int,
                              max_distance: int):
    """T5 bidirectional bucketing (HF t5 modeling semantics)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5Attention(nn.Module):
    config: T5Config
    has_relative_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, position_bias=None):
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv
        b, s, _ = x.shape

        def proj(name):
            return nn.Dense(inner, use_bias=False, dtype=self.dtype,
                            name=name)

        q = proj("q")(x).reshape(b, s, cfg.num_heads, cfg.d_kv)
        k = proj("k")(x).reshape(b, s, cfg.num_heads, cfg.d_kv)
        v = proj("v")(x).reshape(b, s, cfg.num_heads, cfg.d_kv)

        if self.has_relative_bias and position_bias is None:
            rel = (jnp.arange(s)[None, :] - jnp.arange(s)[:, None])
            buckets = _relative_position_bucket(
                rel, cfg.relative_attention_num_buckets,
                cfg.relative_attention_max_distance)
            bias_table = nn.Embed(cfg.relative_attention_num_buckets,
                                  cfg.num_heads, dtype=jnp.float32,
                                  name="relative_attention_bias")
            position_bias = bias_table(buckets).transpose(2, 0, 1)[None]

        bias = position_bias
        if mask is not None:
            bias = bias + mask if bias is not None else mask
        # T5 attention is unscaled (scale folded into init)
        out = dot_product_attention(q, k, v, bias=bias, scale=1.0)
        out = out.reshape(b, s, inner)
        return nn.Dense(x.shape[-1], use_bias=False, dtype=self.dtype,
                        name="o")(out), position_bias


class T5Block(nn.Module):
    config: T5Config
    has_relative_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, position_bias=None):
        cfg = self.config
        normed = RMSNorm(cfg.layer_norm_epsilon, dtype=self.dtype,
                         name="ln1")(x)
        attn_out, position_bias = T5Attention(
            cfg, has_relative_bias=self.has_relative_bias, dtype=self.dtype,
            name="attention")(normed, mask, position_bias)
        x = x + attn_out
        normed = RMSNorm(cfg.layer_norm_epsilon, dtype=self.dtype,
                         name="ln2")(x)
        if cfg.gated_act:
            h = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype,
                         name="wi_0")(normed)
            g = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype,
                         name="wi_1")(normed)
            h = nn.gelu(h, approximate=True) * g
        else:
            h = nn.relu(nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype,
                                 name="wi")(normed))
        x = x + nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype,
                         name="wo")(h)
        return x, position_bias


class T5EncoderModel(nn.Module):
    """Returns last hidden states (B, S, d_model)."""

    config: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype,
                     name="shared")(input_ids)
        mask = None
        if attention_mask is not None:
            mask = jnp.where(attention_mask[:, None, None, :] > 0, 0.0,
                             -1e9).astype(jnp.float32)
        position_bias = None
        for i in range(cfg.num_layers):
            x, position_bias = T5Block(
                cfg, has_relative_bias=(i == 0), dtype=self.dtype,
                name=f"block_{i}")(x, mask, position_bias)
        return RMSNorm(cfg.layer_norm_epsilon, dtype=self.dtype,
                       name="final_layer_norm")(x)


def convert_t5_state_dict(state_dict) -> dict:
    """HF ``T5EncoderModel.state_dict()`` → flax params tree."""
    import re

    from followyourclick_tpu.utils.convert import _set, _to_numpy

    tree: dict = {}
    for key, tensor in state_dict.items():
        arr = _to_numpy(tensor)
        name = key
        name = re.sub(r"^encoder\.", "", name)
        name = re.sub(r"^shared\.weight$", "shared.embedding", name)
        name = re.sub(r"embed_tokens\.weight$", "shared.embedding", name)
        name = re.sub(r"^block\.(\d+)\.", r"block_\1.", name)
        name = name.replace("layer.0.SelfAttention", "attention")
        name = name.replace("layer.0.layer_norm", "ln1")
        name = name.replace("layer.1.DenseReluDense", "mlp")
        name = name.replace("layer.1.layer_norm", "ln2")
        name = name.replace("mlp.wi_0", "wi_0").replace("mlp.wi_1", "wi_1")
        name = name.replace("mlp.wi", "wi").replace("mlp.wo", "wo")
        name = name.replace(
            "attention.relative_attention_bias.weight",
            "attention.relative_attention_bias.embedding")
        parts = name.split(".")
        if parts[-1] == "weight":
            _set(tree, tuple(parts[:-1]) + ("kernel",), arr.T)
        elif parts[-1] == "embedding":
            _set(tree, tuple(parts), arr)
        else:
            # RMSNorm scale saved as ".weight"? handled above; leftovers:
            _set(tree, tuple(parts), arr)
    # RMSNorm scales: T5 layer norms save as "...layer_norm.weight" → mapped
    # to ln1/ln2 + kernel by the rule above; fix rank-1 kernels to 'scale'
    def fix(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k == "kernel" and getattr(v, "ndim", 0) == 1:
                out["scale"] = v
            else:
                out[k] = fix(v)
        return out

    return fix(tree)
