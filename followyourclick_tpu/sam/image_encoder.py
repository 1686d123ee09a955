"""SAM ViT image encoder.

Behavior spec: reference ``Inpaint-Anything/third_party/segment-anything/
segment_anything/modeling/image_encoder.py`` — ViTDet-style encoder:
16x16 patch embed, learned absolute positions, 14x14 windowed attention with
decomposed relative position biases on all but the ``global_attn_indexes``
blocks, and a conv neck to 256 channels. Variants per ``build_sam.py``:
vit_h (1280/32/16, global at 7,15,23,31), vit_l (1024/24/16), vit_b (768/12/12).

TPU-first: NHWC throughout; window partition is reshape/transpose only; the
fixed 1024² input makes every shape static so XLA tiles the attention and the
rel-pos einsums onto the MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm over NHWC feature maps (reference common.py
    LayerNorm2d — normalises over the channel axis only)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = x.mean(axis=-1, keepdims=True)
        var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
        x = (x - mean) / jnp.sqrt(var + self.eps)
        weight = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return x * weight + bias


def window_partition(
    x: jnp.ndarray, window: int
) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """(B, H, W, C) → (B*nW, window, window, C) with zero padding."""
    B, H, W, C = x.shape
    ph = (-H) % window
    pw = (-W) % window
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // window, window, Wp // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, C)
    return x, (Hp, Wp)


def window_unpartition(
    x: jnp.ndarray, window: int, padded: Tuple[int, int], orig: Tuple[int, int]
) -> jnp.ndarray:
    Hp, Wp = padded
    H, W = orig
    B = x.shape[0] // ((Hp // window) * (Wp // window))
    x = x.reshape(B, Hp // window, Wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def _decomposed_rel_pos_bias(
    q: jnp.ndarray,
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    hw: Tuple[int, int],
) -> jnp.ndarray:
    """Decomposed relative position bias (reference image_encoder.py
    add_decomposed_rel_pos): attn[b, qh qw, kh kw] += q·Rh[qh-kh] + q·Rw[qw-kw].

    Assumes square attention (q_size == k_size — always true here since the
    input resolution is fixed). q: (B*, H*W, head_dim).
    """
    H, W = hw
    # rel index for equal sizes: qi - ki + (size - 1)
    idx_h = jnp.arange(H)[:, None] - jnp.arange(H)[None, :] + (H - 1)
    idx_w = jnp.arange(W)[:, None] - jnp.arange(W)[None, :] + (W - 1)
    Rh = rel_pos_h[idx_h]  # (H, H, dim)
    Rw = rel_pos_w[idx_w]  # (W, W, dim)

    B = q.shape[0]
    r_q = q.reshape(B, H, W, -1)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw)
    bias = rel_h[:, :, :, :, None] + rel_w[:, :, None, :, :]  # (B,H,W,kh,kw)
    return bias.reshape(B, H * W, H * W)


class ViTAttention(nn.Module):
    """Multi-head attention with optional decomposed rel-pos bias
    (image_encoder.py Attention)."""

    dim: int
    num_heads: int
    use_rel_pos: bool = True
    input_size: Optional[Tuple[int, int]] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(
            3, B * self.num_heads, H * W, head_dim
        )
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = jnp.einsum(
            "bqc,bkc->bqk", q * (head_dim**-0.5), k,
            preferred_element_type=jnp.float32,
        )
        if self.use_rel_pos:
            size = self.input_size if self.input_size else (H, W)
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros,
                (2 * size[0] - 1, head_dim),
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros,
                (2 * size[1] - 1, head_dim),
            )
            # rel-pos bias uses the UNSCALED q (reference Attention.forward)
            attn = attn + _decomposed_rel_pos_bias(
                q, rel_pos_h, rel_pos_w, (H, W)
            )
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v)
        out = out.reshape(B, self.num_heads, H * W, head_dim)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    """Pre-norm transformer block with optional windowing
    (image_encoder.py Block)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    window_size: int = 0
    input_size: Optional[Tuple[int, int]] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.window_size > 0:
            orig = y.shape[1:3]
            y, padded = window_partition(y, self.window_size)
            attn_size = (self.window_size, self.window_size)
        else:
            attn_size = self.input_size
        y = ViTAttention(
            self.dim, self.num_heads, use_rel_pos=True,
            input_size=attn_size, dtype=self.dtype, name="attn",
        )(y)
        if self.window_size > 0:
            y = window_unpartition(y, self.window_size, padded, orig)
        x = shortcut + y
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        y = nn.Dense(hidden, dtype=self.dtype, name="mlp_lin1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_lin2")(y)
        return x + y


class ImageEncoderViT(nn.Module):
    """ViTDet encoder: img (B, img_size, img_size, 3) → (B, 64, 64, out_chans)
    embedding (image_encoder.py:17-110)."""

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    use_abs_pos: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x)
        grid = self.img_size // self.patch_size
        if self.use_abs_pos:
            pos = self.param(
                "pos_embed", nn.initializers.zeros,
                (1, grid, grid, self.embed_dim),
            )
            x = x + pos
        for i in range(self.depth):
            x = ViTBlock(
                self.embed_dim, self.num_heads, self.mlp_ratio,
                window_size=0 if i in self.global_attn_indexes
                else self.window_size,
                input_size=(grid, grid), dtype=self.dtype, name=f"block{i}",
            )(x)
        # neck: 1x1 conv → LN2d → 3x3 conv → LN2d (image_encoder.py:88-108)
        x = nn.Conv(
            self.out_chans, (1, 1), use_bias=False, dtype=self.dtype,
            name="neck_conv1",
        )(x)
        x = LayerNorm2d(name="neck_ln1")(x)
        x = nn.Conv(
            self.out_chans, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="neck_conv2",
        )(x)
        return LayerNorm2d(name="neck_ln2")(x)
