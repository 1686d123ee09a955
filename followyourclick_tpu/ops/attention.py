"""Attention dispatch: Pallas flash-attention on TPU, fused XLA einsum fallback.

Replaces the reference's hard xformers dependency
(``animatediff/models/attention.py:461-487``, ``mm_attn_cross.py:222-229`` — the
reference *asserts* xformers is installed, ``scripts/inference.py:157-158``).
Here attention is a pure function over ``(B, S, H, D)`` arrays with automatic
kernel selection; no global mutable "enabled" flag.

Softmax always runs in fp32 (parity with the reference's ``upcast_softmax`` /
xformers behavior, and required for bf16 stability).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _xla_attention(
    query: jnp.ndarray,  # (B, Sq, H, D)
    key: jnp.ndarray,    # (B, Sk, H, D)
    value: jnp.ndarray,  # (B, Sk, H, D)
    bias: Optional[jnp.ndarray],
    scale: float,
) -> jnp.ndarray:
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", query, key,
        preferred_element_type=jnp.float32,
    ) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(query.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, value)


@functools.partial(jax.named_call, name="dot_product_attention")
def dot_product_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Multi-head attention over (batch, seq, heads, head_dim) arrays.

    impl: "auto" picks the Pallas flash kernel on TPU for long self-attention
    sequences and the XLA fused path otherwise (short kv like text cross-attn
    seq=77+N or temporal seq<=32, where a flash kernel has nothing to save).
    """
    if scale is None:
        scale = query.shape[-1] ** -0.5

    use_flash = False
    if impl == "flash":
        use_flash = True
    elif impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        # flash pays off when the score matrix is large; kv seq 77/tokens and
        # temporal F<=32 stay on the fused-XLA path
        use_flash = on_tpu and bias is None and key.shape[1] >= 512
    if use_flash:
        from followyourclick_tpu.ops.flash_attention import flash_attention

        return flash_attention(query, key, value, scale=scale)
    return _xla_attention(query, key, value, bias, scale)
