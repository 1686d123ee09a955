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


class Conv2dParams(nn.Module):
    """``nn.Conv``-shaped params (``kernel`` HWIO + ``bias``) without applying
    them — consumed by ops that need the raw weights (e.g. the phase-decomposed
    upsample conv, ops/upsample.py) while sharing the param tree (and
    therefore checkpoints/converters) with a plain ``nn.Conv``."""

    in_features: int
    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, self.in_features, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


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
    # optional fused activation applied AFTER the affine ("silu" or None) —
    # lets norm→SiLU call sites collapse into the single-pass TPU kernel
    act: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        b, c = x.shape[0], x.shape[-1]
        g = self.num_groups
        cg = c // g
        assert c % g == 0, (c, g)

        # NOTE: a single-pass Pallas GroupNorm kernel exists
        # (ops/groupnorm.py) but LOSES to this XLA formulation on v5e at
        # every UNet shape (0.59 ms vs 0.08 ms at 64²·320 — XLA keeps the
        # reduction and the apply inside neighboring fusions and never pays
        # the kernel's fp32 VMEM round-trip), so it is not routed here.
        xf = x.astype(jnp.float32)
        # Reduce per CHANNEL first, combine per group on the tiny (B, C)
        # result. Never reshape the activation itself to (..., G, C/G):
        # on TPU that materializes a fp32 tensor whose C/G-wide minor dim
        # (e.g. 40) pads to 128 lanes — a 3.2× memory blowup — and its 6-D
        # layout poisons layout assignment around every GroupNorm (measured
        # v5e: multi-ms relayout copies per GN at clip sizes).
        red_axes = tuple(range(1, x.ndim - 1))
        n = cg
        for a in red_axes:
            n *= x.shape[a]
        # shifted moments: accumulate around a per-group pilot value so
        # E[x²]−E[x]² doesn't catastrophically cancel when |mean| ≫ std;
        # shift-invariance keeps the result exact. The pilot is the first
        # element of each group, broadcast per channel (a (B, C) constant,
        # so the shift fuses into the reduction pass).
        first = jax.lax.stop_gradient(
            xf[(slice(None),) + (0,) * (x.ndim - 2)])        # (B, C)
        pilot_g = first.reshape(b, g, cg)[:, :, :1]           # (B, G, 1)
        pilot_c = jnp.broadcast_to(pilot_g, (b, g, cg)).reshape(b, c)
        pilot_full = pilot_c.reshape((b,) + (1,) * (x.ndim - 2) + (c,))
        shifted = xf - pilot_full
        s1 = shifted.sum(axis=red_axes)                       # (B, C)
        s2 = (shifted * shifted).sum(axis=red_axes)           # (B, C)
        s1g = s1.reshape(b, g, cg).sum(-1, keepdims=True)     # (B, G, 1)
        s2g = s2.reshape(b, g, cg).sum(-1, keepdims=True)
        mean_c = s1g / n
        var = jnp.maximum(s2g / n - mean_c * mean_c, 0.0)
        mean = mean_c + pilot_g
        inv = jax.lax.rsqrt(var + self.epsilon)               # (B, G, 1)
        # fold affine into the normalization: y = x * a + b with per-channel
        # a = inv*scale, b = bias - mean*inv*scale — applied on the flat
        # NHWC tensor (one fused multiply-add, no grouped reshape)
        if self.use_scale_bias:
            scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            a = (inv * scale.reshape(1, g, cg)).reshape(b, c)
            bb = (bias.reshape(1, g, cg)
                  - mean * inv * scale.reshape(1, g, cg)).reshape(b, c)
        else:
            a = jnp.broadcast_to(inv, (b, g, cg)).reshape(b, c)
            bb = jnp.broadcast_to(-mean * inv, (b, g, cg)).reshape(b, c)
        bshape = (b,) + (1,) * (x.ndim - 2) + (c,)
        normed = xf * a.reshape(bshape) + bb.reshape(bshape)
        if self.act == "silu":
            normed = normed * jax.nn.sigmoid(normed)
        return normed.astype(orig_dtype)
