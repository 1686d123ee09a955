"""Shared building-block layers.

Behavior spec: reference ``diffusers/models/embeddings.py`` (Timesteps /
TimestepEmbedding) and ``animatediff/models/motion_module.py:286-304``
(interleaved sinusoidal temporal positional encoding).
"""

from __future__ import annotations

import math
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


def sinusoidal_timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    scale: float = 1.0,
    max_period: int = 10000,
) -> jnp.ndarray:
    """Concatenated [sin | cos] (or [cos | sin]) transformer embedding of
    (possibly fractional) timesteps. Matches diffusers ``get_timestep_embedding``.

    Always computed in fp32 — frequencies underflow in bf16.
    """
    assert timesteps.ndim == 1
    half_dim = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    emb = scale * emb
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def temporal_positional_encoding(length: int, d_model: int) -> jnp.ndarray:
    """Interleaved sin/cos positional table ``(1, length, d_model)`` — the
    motion module's frame-axis PE (reference motion_module.py:286-304; note it
    interleaves pe[0::2]=sin, pe[1::2]=cos, unlike the timestep embedding)."""
    position = jnp.arange(length, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32)
        * (-math.log(10000.0) / d_model)
    )
    angles = position * div_term  # (length, d_model//2)
    pe = jnp.stack([jnp.sin(angles), jnp.cos(angles)], axis=-1)
    pe = pe.reshape(length, -1)[:, :d_model]
    return pe[None]


class TimestepEmbedding(nn.Module):
    """linear_1 -> SiLU -> linear_2 MLP over the sinusoidal embedding
    (reference diffusers/models/embeddings.py TimestepEmbedding)."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32
    # zero-init the output layer so the embedding starts as a no-op
    # (reference unet.py:134-146 for fps/motion/camera embeddings)
    zero_init_output: bool = False

    @nn.compact
    def __call__(self, sample: jnp.ndarray) -> jnp.ndarray:
        sample = nn.Dense(self.time_embed_dim, dtype=self.dtype,
                          name="linear_1")(sample)
        sample = nn.silu(sample)
        sample = nn.Dense(self.time_embed_dim, dtype=self.dtype,
                          kernel_init=(nn.initializers.zeros
                                       if self.zero_init_output
                                       else nn.initializers.lecun_normal()),
                          name="linear_2")(sample)
        return sample


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    return {
        "silu": nn.silu,
        "swish": nn.silu,
        "gelu": nn.gelu,
        "mish": lambda x: x * jnp.tanh(nn.softplus(x)),
        "relu": nn.relu,
        "quick_gelu": lambda x: x * nn.sigmoid(1.702 * x),
    }[name]


class GroupNorm(nn.Module):
    """GroupNorm over the trailing channel axis (NHWC / N..C layouts).

    Statistics in fp32 (bf16 variance is numerically unsafe), affine applied in
    compute dtype. Equivalent to torch.nn.GroupNorm on NCHW.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    use_scale_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        c = x.shape[-1]
        assert c % self.num_groups == 0, (c, self.num_groups)
        xf = x.astype(jnp.float32)
        shape = x.shape[:-1] + (self.num_groups, c // self.num_groups)
        grouped = xf.reshape(shape)
        # reduce over every non-batch, non-group axis; one-pass moments
        # (sum + sum-of-squares fuse into a single traversal — `.var()`
        # centres first and costs an extra full read of the activation,
        # measurable at clip-sized GroupNorms)
        axes = tuple(range(1, grouped.ndim - 2)) + (grouped.ndim - 1,)
        n = 1.0
        for a in axes:
            n *= grouped.shape[a]
        # shifted one-pass: accumulate around a per-group pilot value (one
        # element per group) so E[x²]−E[x]² doesn't catastrophically cancel
        # when |mean| ≫ std; shift-invariant algebra keeps the single
        # traversal and the exact result
        slicer = tuple(slice(0, 1) if a in axes else slice(None)
                       for a in range(grouped.ndim))
        pilot = jax.lax.stop_gradient(grouped[slicer])
        centered = grouped - pilot
        s1 = centered.sum(axis=axes, keepdims=True)
        s2 = (centered * centered).sum(axis=axes, keepdims=True)
        mean_c = s1 / n
        var = jnp.maximum(s2 / n - mean_c * mean_c, 0.0)
        mean = mean_c + pilot
        inv = jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale_bias:
            scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            scale_g = scale.reshape(self.num_groups, c // self.num_groups)
            bias_g = bias.reshape(self.num_groups, c // self.num_groups)
            # fold affine into the normalization: y = x * a + b with
            # a = inv*scale, b = bias - mean*inv*scale (one multiply-add
            # per element instead of two)
            a = inv * scale_g
            b = bias_g - mean * a
            normed = grouped * a + b
        else:
            normed = (grouped - mean) * inv
        return normed.reshape(x.shape).astype(orig_dtype)
