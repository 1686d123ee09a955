"""Spatial transformer blocks (self-attn → text cross-attn → FF), NHWC.

Behavior spec: reference ``animatediff/models/attention.py`` —
``Transformer3DModel`` (:141, frames folded into batch :217-308),
``BasicTransformerBlock`` (:330-564), ``IPCrossAttention`` (:20-127, decoupled
ip k/v), on top of diffusers ``CrossAttention``/``FeedForward``
(``diffusers/models/attention.py:510,733``).

The reference's ``SparseCausalAttention2D`` path is a latent NameError upstream
(attention.py:363-373, class never defined); here ``unet_use_cross_frame_attention``
selects a *working* cross-frame self-attention (keys/values from frame 0 and the
previous frame), i.e. the intended behavior.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from followyourclick_tpu.models.layers import GroupNorm
from followyourclick_tpu.models.pab import PabMode, pab_site
from followyourclick_tpu.ops.attention import dot_product_attention


class Conv1x1(nn.Module):
    """A 1×1 conv applied as a plain dot over (..., C) tokens.

    Param tree/shape identical to ``nn.Conv(features, (1, 1))`` —
    ``kernel (1, 1, C, F)`` + ``bias (F,)`` — so checkpoint converters are
    unaffected; but XLA sees one dense chain instead of a conv sandwiched
    between reshapes (fewer layout pivots around the transformer block)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, c, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return (jnp.dot(x, kernel[0, 0].astype(self.dtype))
                + bias.astype(self.dtype))


class CrossAttention(nn.Module):
    """q/k/v projection + multi-head attention + out projection.

    ``ip_num_tokens > 0`` enables the decoupled IP-Adapter key/value path
    (reference IPCrossAttention): the last ``ip_num_tokens`` of the context are
    image-prompt tokens attended through separate ``to_k_ip``/``to_v_ip``
    projections, added with weight ``ip_scale``.
    """

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    cross_attention_dim: Optional[int] = None  # None => self-attention
    upcast_attention: bool = False
    use_bias: bool = False
    ip_num_tokens: int = 0
    ip_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,                    # (B, S, C)
        context: Optional[jnp.ndarray] = None,         # (B, Sk, Ck)
        attention_bias: Optional[jnp.ndarray] = None,  # (B, H, S, Sk) additive
    ) -> jnp.ndarray:
        inner_dim = self.heads * self.dim_head
        to_q = nn.Dense(inner_dim, use_bias=self.use_bias, dtype=self.dtype,
                        name="to_q")
        to_k = nn.Dense(inner_dim, use_bias=self.use_bias, dtype=self.dtype,
                        name="to_k")
        to_v = nn.Dense(inner_dim, use_bias=self.use_bias, dtype=self.dtype,
                        name="to_v")
        to_out = nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")

        if context is None:
            context = hidden_states
        ip_context = None
        if self.ip_num_tokens > 0:
            end = context.shape[1] - self.ip_num_tokens
            context, ip_context = context[:, :end], context[:, end:]

        b, s, _ = hidden_states.shape

        def split_heads(x):
            return x.reshape(x.shape[0], x.shape[1], self.heads, self.dim_head)

        q = split_heads(to_q(hidden_states))
        k = split_heads(to_k(context))
        v = split_heads(to_v(context))
        if self.upcast_attention:
            q, k = q.astype(jnp.float32), k.astype(jnp.float32)

        # Upstream quirk, reproduced for checkpoint parity: the reference's
        # IPCrossAttention.__init__ overwrites the inherited softmax scale
        # (dim_head**-0.5) with the ip mixing weight (reference
        # animatediff/models/attention.py:43 after diffusers CrossAttention
        # set it), and diffusers `_attention` uses self.scale as the baddbmm
        # alpha — so with ip enabled BOTH the base and ip attention run with
        # scale = ip_scale (1.0 in released configs). Released ip weights
        # were trained under this behavior.
        attn_scale = self.ip_scale if self.ip_num_tokens > 0 else None

        out = dot_product_attention(q, k, v, bias=attention_bias,
                                    scale=attn_scale)

        if ip_context is not None:
            to_k_ip = nn.Dense(inner_dim, use_bias=False, dtype=self.dtype,
                               name="to_k_ip")
            to_v_ip = nn.Dense(inner_dim, use_bias=False, dtype=self.dtype,
                               name="to_v_ip")
            ip_k = split_heads(to_k_ip(ip_context))
            ip_v = split_heads(to_v_ip(ip_context))
            if self.upcast_attention:
                ip_k = ip_k.astype(jnp.float32)
            ip_out = dot_product_attention(q, ip_k, ip_v, scale=attn_scale)
            out = out + self.ip_scale * ip_out

        out = out.reshape(b, s, inner_dim).astype(hidden_states.dtype)
        return to_out(out)


class _DenseParams(nn.Module):
    """``nn.Dense``-shaped params (``kernel`` + ``bias``) without applying
    them — fused kernels consume the raw weights while sharing the param
    tree (and therefore checkpoints/converters) with the modular path."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class _LNParams(nn.Module):
    """``nn.LayerNorm``-shaped params (``scale`` + ``bias``) without applying
    them — consumed by fused kernels that do the normalization in-kernel."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return scale, bias


class _GEGLUParams(nn.Module):
    """Param host matching ``GEGLUFeedForward``'s tree (proj/out Dense)."""

    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self):
        inner = self.dim * self.mult
        w1, b1 = _DenseParams(self.dim, inner * 2, name="proj")()
        w2, b2 = _DenseParams(inner, self.dim, name="out")()
        return w1, b1, w2, b2


def _ln_ff_residual(block, h, dim, dtype, ln_name, ff_name):
    """LayerNorm → GEGLU FF → +residual. On TPU this is ONE Pallas kernel
    (ops/geglu.fused_ln_geglu): one HBM read of h, one write — the LN pass,
    the (rows, 2·inner) FF intermediate, and the residual add all stay in
    VMEM. Param tree identical to the modular path."""
    from followyourclick_tpu.ops.fused import fused_kernels_enabled

    if fused_kernels_enabled():
        from followyourclick_tpu.ops.fused import dp_wrap
        from followyourclick_tpu.ops.geglu import fused_ln_geglu

        ls, lb = _LNParams(dim, name=ln_name)()
        w1, b1, w2, b2 = _GEGLUParams(dim, name=ff_name)()
        cast = lambda t: t.astype(dtype)  # noqa: E731
        rows = h.reshape(-1, h.shape[-1])
        out = dp_wrap(fused_ln_geglu)(
            rows, cast(ls), cast(lb), cast(w1), cast(b1),
            cast(w2), cast(b2), eps=1e-5, residual=True)
        return out.reshape(h.shape)
    normed = _layer_norm(ln_name, dtype)(h)
    return GEGLUFeedForward(dim, dtype=dtype, name=ff_name)(normed) + h


class GEGLUFeedForward(nn.Module):
    """GEGLU feed-forward (diffusers FeedForward, attention.py:733):
    proj to 2×(mult·dim), gate with GELU, project back.

    On TPU the whole block runs as one Pallas kernel
    (ops/geglu.fused_geglu) that keeps the (rows, 2·inner) intermediate in
    VMEM — XLA's formulation round-trips it through HBM (~670 MB per 64²
    clip FF)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.mult
        c = x.shape[-1]
        from followyourclick_tpu.ops.fused import fused_kernels_enabled

        if fused_kernels_enabled():
            from followyourclick_tpu.ops.fused import dp_wrap
            from followyourclick_tpu.ops.geglu import fused_geglu

            w1, b1 = _DenseParams(c, inner * 2, name="proj")()
            w2, b2 = _DenseParams(inner, self.dim, name="out")()
            cast = lambda t: t.astype(self.dtype)  # noqa: E731
            rows = x.reshape(-1, c)
            y = dp_wrap(fused_geglu)(
                rows, cast(w1), cast(b1), cast(w2), cast(b2))
            return y.reshape(*x.shape[:-1], self.dim)
        proj = nn.Dense(inner * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(proj, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(h)


class LayerNorm(nn.LayerNorm):
    """fp32-statistics LayerNorm (params fp32, output in compute dtype)."""


def _layer_norm(name: str, dtype) -> nn.LayerNorm:
    # LayerNorm stats in fp32 for bf16 safety; flax upcasts internally when
    # dtype promotion requires it, and we keep params fp32 by default.
    return nn.LayerNorm(epsilon=1e-5, dtype=dtype, name=name)


class BasicTransformerBlock(nn.Module):
    """self-attn → cross-attn (text / text+ip) → [t5 cross-attn] → GEGLU FF
    (reference animatediff/models/attention.py:330-564)."""

    dim: int
    num_attention_heads: int
    attention_head_dim: int
    cross_attention_dim: Optional[int] = 768
    upcast_attention: bool = False
    use_ip_cross_attention: bool = False
    ip_scale: float = 1.0
    ip_num_tokens: int = 4
    use_text_encoder_2: bool = False
    unet_use_cross_frame_attention: bool = False
    unet_use_temporal_attention: bool = False
    pab: Optional[PabMode] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,               # (B·F, S, C)
        context: Optional[jnp.ndarray] = None,    # (B·F, 77[+N], Ck)
        context_2: Optional[jnp.ndarray] = None,  # T5 context
        video_length: Optional[int] = None,
    ) -> jnp.ndarray:
        h = hidden_states

        # 1. spatial self-attention (optionally cross-frame)
        def _attn1(h):
            normed = _layer_norm("norm1", self.dtype)(h)
            attn1 = CrossAttention(
                query_dim=self.dim, heads=self.num_attention_heads,
                dim_head=self.attention_head_dim,
                upcast_attention=self.upcast_attention, dtype=self.dtype,
                name="attn1")
            if self.unet_use_cross_frame_attention:
                assert video_length is not None
                bf, s, c = normed.shape
                b = bf // video_length
                frames = normed.reshape(b, video_length, s, c)
                # keys/values from [frame 0, previous frame] per query frame
                former = jnp.roll(frames, 1, axis=1).at[:, 0].set(
                    frames[:, 0])
                first = jnp.broadcast_to(frames[:, :1], frames.shape)
                kv = jnp.concatenate([first, former], axis=2).reshape(
                    bf, 2 * s, c)
                return attn1(normed, context=kv)
            return attn1(normed)

        h = pab_site(self, "spatial", "attn1_out", self.pab,
                     lambda: _attn1(h)) + h

        # CFG prefix sharing (exact math): when the caller passes hidden
        # states at the pre-CFG batch with context at the doubled batch, the
        # cond/uncond halves were identical up to this point (same latents,
        # timestep, fps/motion embeds — only the text context differs), so
        # the stem above ran ONCE at half batch. Duplicate here, where text
        # conditioning first enters. Row order matches the [uncond; cond]
        # context layout because both halves receive the same hidden rows.
        if (self.cross_attention_dim is not None and context is not None
                and context.shape[0] != h.shape[0]):
            tile = context.shape[0] // h.shape[0]
            assert tile * h.shape[0] == context.shape[0], \
                (h.shape, context.shape)
            h = jnp.concatenate([h] * tile, axis=0)

        # 2. text (+ip) cross-attention
        if self.cross_attention_dim is not None:
            def _attn2(h):
                normed = _layer_norm("norm2", self.dtype)(h)
                return CrossAttention(
                    query_dim=self.dim, heads=self.num_attention_heads,
                    dim_head=self.attention_head_dim,
                    cross_attention_dim=self.cross_attention_dim,
                    upcast_attention=self.upcast_attention,
                    ip_num_tokens=(self.ip_num_tokens
                                   if self.use_ip_cross_attention else 0),
                    ip_scale=self.ip_scale, dtype=self.dtype,
                    name="attn2")(normed, context=context)

            h = pab_site(self, "cross", "attn2_out", self.pab,
                         lambda: _attn2(h)) + h

        # 3. optional second (T5) text cross-attention, zero-init out proj.
        # Skipped when no T5 context is supplied (the reference gates this on
        # the per-call use_text_encoder_2 flag, e.g. the video_scale per-frame
        # pass runs without it, pipeline_animation.py:744-751) — falling back
        # to context=None would silently self-attend instead.
        if (self.use_text_encoder_2 and self.cross_attention_dim is not None
                and context_2 is not None):
            def _attn_t5(h):
                normed = _layer_norm("norm_t5", self.dtype)(h)
                return CrossAttention(
                    query_dim=self.dim, heads=self.num_attention_heads,
                    dim_head=self.attention_head_dim,
                    cross_attention_dim=self.cross_attention_dim,
                    upcast_attention=self.upcast_attention, dtype=self.dtype,
                    name="attn_t5")(normed, context=context_2)

            h = pab_site(self, "cross", "attn_t5_out", self.pab,
                         lambda: _attn_t5(h)) + h

        # 4. optional in-block temporal attention (unet_use_temporal_attention)
        if self.unet_use_temporal_attention:
            assert video_length is not None
            bf, s, c = h.shape
            b = bf // video_length
            t = h.reshape(b, video_length, s, c).transpose(0, 2, 1, 3)
            t = t.reshape(b * s, video_length, c)

            def _attn_temp(t):
                normed = _layer_norm("norm_temp", self.dtype)(t)
                return CrossAttention(
                    query_dim=self.dim, heads=self.num_attention_heads,
                    dim_head=self.attention_head_dim, dtype=self.dtype,
                    name="attn_temp")(normed)

            t = pab_site(self, "temporal", "attn_temp_out", self.pab,
                         lambda: _attn_temp(t)) + t
            h = t.reshape(b, s, video_length, c).transpose(0, 2, 1, 3)
            h = h.reshape(bf, s, c)

        # 5. feed-forward (LN + FF + residual fused on TPU)
        h = _ln_ff_residual(self, h, self.dim, self.dtype, "norm3", "ff")
        return h


class SpatialTransformer3D(nn.Module):
    """Transformer3DModel equivalent: GroupNorm → 1×1-conv proj_in → N blocks
    → 1×1-conv proj_out → residual, frames folded into batch
    (reference attention.py:141-308)."""

    in_channels: int
    num_attention_heads: int
    attention_head_dim: int
    num_layers: int = 1
    cross_attention_dim: Optional[int] = 768
    norm_num_groups: int = 32
    use_linear_projection: bool = False
    upcast_attention: bool = False
    use_ip_cross_attention: bool = False
    ip_scale: float = 1.0
    ip_num_tokens: int = 4
    use_text_encoder_2: bool = False
    unet_use_cross_frame_attention: bool = False
    unet_use_temporal_attention: bool = False
    pab: Optional[PabMode] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,               # (B, F, H, W, C)
        context: Optional[jnp.ndarray] = None,    # (B, 77[+N], Ck)
        context_2: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        b, f, hh, ww, c = hidden_states.shape
        inner_dim = self.num_attention_heads * self.attention_head_dim

        x = hidden_states.reshape(b * f, hh, ww, c)
        residual = x
        x = GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                      dtype=self.dtype, name="norm")(x)
        if self.use_linear_projection:
            x = x.reshape(b * f, hh * ww, c)
            x = nn.Dense(inner_dim, dtype=self.dtype, name="proj_in")(x)
        else:
            x = x.reshape(b * f, hh * ww, c)
            x = Conv1x1(inner_dim, dtype=self.dtype, name="proj_in")(x)

        # broadcast per-clip context across frames
        def tile_ctx(ctx):
            if ctx is None:
                return None
            return jnp.repeat(ctx, f, axis=0)

        ctx = tile_ctx(context)
        ctx2 = tile_ctx(context_2)

        for i in range(self.num_layers):
            x = BasicTransformerBlock(
                dim=inner_dim,
                num_attention_heads=self.num_attention_heads,
                attention_head_dim=self.attention_head_dim,
                cross_attention_dim=self.cross_attention_dim,
                upcast_attention=self.upcast_attention,
                use_ip_cross_attention=self.use_ip_cross_attention,
                ip_scale=self.ip_scale, ip_num_tokens=self.ip_num_tokens,
                use_text_encoder_2=self.use_text_encoder_2,
                unet_use_cross_frame_attention=self.unet_use_cross_frame_attention,
                unet_use_temporal_attention=self.unet_use_temporal_attention,
                pab=self.pab,
                dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(x, context=ctx, context_2=ctx2, video_length=f)

        bf_out = x.shape[0]  # may be CFG-doubled inside the blocks (prefix
        # sharing duplicates at the first cross-attention)
        if self.use_linear_projection:
            x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
            x = x.reshape(bf_out, hh, ww, c)
        else:
            x = Conv1x1(c, dtype=self.dtype, name="proj_out")(x)
            x = x.reshape(bf_out, hh, ww, c)

        if bf_out != residual.shape[0]:
            residual = jnp.concatenate(
                [residual] * (bf_out // residual.shape[0]), axis=0)
        out = x + residual
        return out.reshape(bf_out // f, f, hh, ww, c)
