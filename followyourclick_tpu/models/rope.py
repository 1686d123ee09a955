"""Temporal rotary position embedding for frame-axis attention.

Behavior spec: reference ``animatediff/models/rope.py`` — LLaMA-style
rotate-half RoPE (:102-116), NTK-aware base rescale ``base·α^(d/(d-2))``
(:133-143), and the log-scaled query extrapolation trick
``q *= log(train_len)/log(video_len)`` when sampling more frames than trained
(:169-172).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp


def rope_tables(dim: int, length: int, base: float = 10000.0,
                ntk_alpha: float = 0.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables of shape (length, dim), LLaMA layout (freqs duplicated)."""
    if ntk_alpha:
        base = base * ntk_alpha ** (dim / (dim - 2))
    inv_freq = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(length, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)                      # (length, dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)      # (length, dim)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(
    q: jnp.ndarray,  # (..., F, D) frame axis second-to-last
    k: jnp.ndarray,
    cos: jnp.ndarray,  # (F, D)
    sin: jnp.ndarray,
    train_video_length: int = 16,
    video_length: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    q_rot = q * cos + _rotate_half(q) * sin
    k_rot = k * cos + _rotate_half(k) * sin
    if video_length is None:
        video_length = q.shape[-2]
    if video_length > train_video_length:
        # inference beyond trained frame count: damp query magnitude
        q_rot = q_rot * (math.log(train_video_length) / math.log(video_length))
    return q_rot.astype(q.dtype), k_rot.astype(k.dtype)
