"""Temporal-attention motion modules (the AnimateDiff-style "motion module").

Behavior spec: reference ``animatediff/models/motion_module.py`` —
``VanillaTemporalModule`` (:51-95), ``TemporalTransformer3DModel`` (:98-208),
``TemporalTransformerBlock`` (:211-283), ``PositionalEncoding`` (:286-304),
``VersatileAttention`` (:328-464: attention runs along the *frame axis* per
spatial location after the ``(b f) d c -> (b d) f c`` rearrange), and the
temporal LoRA (:306-326). ``zero_initialize`` zero-inits ``proj_out`` so a
freshly-inflated model reproduces the 2D UNet exactly.

TPU design: the rearrange is a reshape/transpose XLA fuses away; temporal
attention (seq = F ≤ 32, folded batch = B·H·W) is run through the shared
attention dispatcher which keeps it on the fused-XLA path (a flash kernel has
nothing to win at seq 32 — SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from followyourclick_tpu.config import MotionModuleConfig
from followyourclick_tpu.models.attention import _layer_norm, _ln_ff_residual
from followyourclick_tpu.models.layers import GroupNorm, temporal_positional_encoding
from followyourclick_tpu.models.pab import PabMode, pab_site
from followyourclick_tpu.models.rope import apply_rope, rope_tables
from followyourclick_tpu.ops.attention import dot_product_attention


class _DenseParams(nn.Module):
    """Declares ``nn.Dense``-shaped params (``kernel`` [+ ``bias``]) without
    applying them — the fused temporal kernel consumes the raw weights. The
    param tree is identical to ``nn.Dense(features, name=...)``, so the
    fused and unfused paths share checkpoints and converters."""

    in_features: int
    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features), jnp.float32)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            return kernel, bias
        return kernel, None


class LoRADense(nn.Module):
    """rank-decomposed residual projection (reference LoRALinearLayer
    motion_module.py:306-326): down (normal/rank init) → up (zero init)."""

    features: int
    rank: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        down = nn.Dense(self.rank, use_bias=False, dtype=self.dtype,
                        kernel_init=nn.initializers.normal(1.0 / self.rank),
                        name="down")
        up = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                      kernel_init=nn.initializers.zeros, name="up")
        return up(down(x))


class TemporalAttention(nn.Module):
    """VersatileAttention("Temporal_Self"): attention along the frame axis for
    every spatial location, with sinusoidal PE or RoPE."""

    query_dim: int
    heads: int = 8
    dim_head: int = 40
    cross_attention_dim: Optional[int] = None
    temporal_position_encoding: bool = True
    temporal_position_encoding_max_len: int = 24
    use_rope: bool = False
    train_video_length: int = 16
    add_temporal_lora: bool = False
    lora_rank: int = 4
    upcast_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # (B·D, F, C) — frames-minor layout
        video_length: int,
        context: Optional[jnp.ndarray] = None,  # (B, Sk, Ck) for _Cross blocks
        lora_scale: float = 1.0,
    ) -> jnp.ndarray:
        # The caller (MotionModule) transposes to the frames-minor layout
        # ONCE for the whole block stack — LN/FF are position-independent, so
        # only the attention needs frames adjacent; per-call transposes were
        # ~0.6 ms of HBM relayout each at 64² clip sizes.
        bd, f, c = hidden_states.shape
        assert f == video_length, (f, video_length)
        inner_dim = self.heads * self.dim_head
        x = hidden_states

        if self.temporal_position_encoding and not self.use_rope:
            pe = temporal_positional_encoding(
                self.temporal_position_encoding_max_len, c)
            x = x + pe[:, :video_length].astype(x.dtype)

        # fully-fused fast path: q/k/v/out projections + per-head attention
        # in one Pallas kernel (ops/temporal_attention.fused_temporal_block).
        # At C=1280 the unfused GEMMs are already MXU-shaped, so only the
        # smaller widths route here; LoRA/RoPE/cross/upcast variants keep the
        # modular path.
        from followyourclick_tpu.ops.fused import fused_kernels_enabled

        use_fused = (
            fused_kernels_enabled()
            and context is None and not self.add_temporal_lora
            and not self.use_rope and not self.upcast_attention
            and inner_dim == c and self.query_dim == c and c < 1280)
        if use_fused:
            from followyourclick_tpu.ops.temporal_attention import (
                fused_temporal_block,
            )

            wq, _ = _DenseParams(c, inner_dim, name="to_q")()
            wk, _ = _DenseParams(c, inner_dim, name="to_k")()
            wv, _ = _DenseParams(c, inner_dim, name="to_v")()
            wo, bo = _DenseParams(inner_dim, self.query_dim,
                                  use_bias=True, name="to_out")()
            cast = lambda t: t.astype(self.dtype)  # noqa: E731
            from followyourclick_tpu.ops.fused import dp_wrap

            return dp_wrap(fused_temporal_block)(
                x, cast(wq), cast(wk), cast(wv), cast(wo), cast(bo),
                scale=self.dim_head ** -0.5, heads=self.heads)

        if context is not None:
            d = bd // context.shape[0]
            ctx = jnp.repeat(context, d, axis=0)
        else:
            ctx = x

        def proj(name, features, use_bias=False):
            return nn.Dense(features, use_bias=use_bias, dtype=self.dtype,
                            name=name)

        q = proj("to_q", inner_dim)(x)
        k = proj("to_k", inner_dim)(ctx)
        v = proj("to_v", inner_dim)(ctx)
        if self.add_temporal_lora:
            q = q + lora_scale * LoRADense(inner_dim, self.lora_rank,
                                           dtype=self.dtype, name="to_q_lora")(x)
            k = k + lora_scale * LoRADense(inner_dim, self.lora_rank,
                                           dtype=self.dtype, name="to_k_lora")(ctx)
            v = v + lora_scale * LoRADense(inner_dim, self.lora_rank,
                                           dtype=self.dtype, name="to_v_lora")(ctx)

        def split_heads(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads, self.dim_head)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)

        if self.use_rope:
            cos, sin = rope_tables(self.dim_head, video_length)
            # (B·D, F, H, Dh) -> (B·D, H, F, Dh) rotate -> back
            qh = q.transpose(0, 2, 1, 3)
            kh = k.transpose(0, 2, 1, 3)
            qh, kh = apply_rope(qh, kh, cos, sin,
                                train_video_length=self.train_video_length,
                                video_length=video_length)
            q = qh.transpose(0, 2, 1, 3)
            k = kh.transpose(0, 2, 1, 3)

        if self.upcast_attention:
            q, k = q.astype(jnp.float32), k.astype(jnp.float32)
        out = dot_product_attention(q, k, v)
        out = out.reshape(bd, video_length, inner_dim).astype(x.dtype)

        o = proj("to_out", self.query_dim, use_bias=True)(out)
        if self.add_temporal_lora:
            o = o + lora_scale * LoRADense(self.query_dim, self.lora_rank,
                                           dtype=self.dtype,
                                           name="to_out_lora")(out)
        return o


class _TemporalAttnParams(nn.Module):
    """Param host matching ``TemporalAttention``'s q/k/v/out Dense tree —
    consumed by the whole-block fused kernel (ops/motion_block.py)."""

    dim: int

    @nn.compact
    def __call__(self):
        wq, _ = _DenseParams(self.dim, self.dim, name="to_q")()
        wk, _ = _DenseParams(self.dim, self.dim, name="to_k")()
        wv, _ = _DenseParams(self.dim, self.dim, name="to_v")()
        wo, bo = _DenseParams(self.dim, self.dim, use_bias=True,
                              name="to_out")()
        return wq, wk, wv, wo, bo


def _fused_motion_block_enabled() -> bool:
    import os

    from followyourclick_tpu.ops.fused import fused_kernels_enabled

    if os.environ.get("FYC_DISABLE_FUSED_KERNELS", "") not in ("", "0"):
        return False  # GSPMD-partitioned programs: see ops/fused.py
    if os.environ.get("FYC_FORCE_FUSED_MOTION", "") not in ("", "0"):
        return True  # tests: exercise the fused wiring off-TPU (interpret)
    return fused_kernels_enabled()


class TemporalTransformerBlock(nn.Module):
    """N temporal attentions (pre-LN, residual) + GEGLU FF
    (reference motion_module.py:211-283).

    On TPU the standard configuration (two Temporal_Self attentions,
    sinusoidal PE, no RoPE/LoRA) runs as ONE Pallas kernel over the whole
    block — LN→attn→res ×2 → LN→GEGLU-FF→res with a single HBM read/write
    (ops/motion_block.py). Param tree identical to the modular path."""

    dim: int
    num_attention_heads: int
    attention_head_dim: int
    attention_block_types: Sequence[str] = ("Temporal_Self", "Temporal_Self")
    cross_attention_dim: int = 768
    temporal_position_encoding: bool = True
    temporal_position_encoding_max_len: int = 24
    use_rope: bool = False
    train_video_length: int = 16
    add_temporal_lora: bool = False
    lora_rank: int = 4
    pab: Optional[PabMode] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray, video_length: int,
                 context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = hidden_states
        inner_dim = self.num_attention_heads * self.attention_head_dim
        # PAB gating: only TEMPORAL caching needs the modular per-site path;
        # a PabMode that never records/reuses temporal sites (e.g. the pure
        # cfg-uncond-cache schedule, or spatial/cross-only PAB) creates no
        # temporal cache variables, so the fused whole-block kernel applies.
        pab_temporal = (self.pab is not None
                        and (self.pab.record("temporal")
                             or self.pab.reuse("temporal")))
        use_fused = (
            _fused_motion_block_enabled()
            and not pab_temporal
            and tuple(self.attention_block_types)
            == ("Temporal_Self", "Temporal_Self")
            and not self.use_rope and not self.add_temporal_lora
            and context is None and inner_dim == self.dim
            and self.dim <= 1280)  # measured win at every UNet width incl.
        # 1280 (L2 4.89→4.27 ms, L3 1.89→1.69 ms per block, v5e)
        if use_fused:
            from followyourclick_tpu.models.attention import (
                _GEGLUParams,
                _LNParams,
            )
            from followyourclick_tpu.ops.motion_block import fused_motion_block

            if self.temporal_position_encoding:
                pe = temporal_positional_encoding(
                    self.temporal_position_encoding_max_len, self.dim
                )[0, :video_length]
            else:
                pe = jnp.zeros((video_length, self.dim))
            hosts = []
            for i in range(2):
                ls, lb = _LNParams(self.dim, name=f"norms_{i}")()
                wq, wk, wv, wo, bo = _TemporalAttnParams(
                    self.dim, name=f"attention_blocks_{i}")()
                hosts += [ls, lb, wq, wk, wv, wo, bo]
            lfs, lfb = _LNParams(self.dim, name="ff_norm")()
            w1, b1, w2, b2 = _GEGLUParams(self.dim, name="ff")()
            hosts += [lfs, lfb, w1, b1, w2, b2]
            cast = lambda t: t.astype(self.dtype)  # noqa: E731
            from followyourclick_tpu.ops.fused import dp_wrap

            return dp_wrap(fused_motion_block)(
                h, pe.astype(self.dtype), tuple(cast(t) for t in hosts),
                scale=self.attention_head_dim ** -0.5,
                heads=self.num_attention_heads)

        for i, block_type in enumerate(self.attention_block_types):
            is_cross = block_type.endswith("_Cross")

            def _attn(h, i=i, is_cross=is_cross):
                normed = _layer_norm(f"norms_{i}", self.dtype)(h)
                return TemporalAttention(
                    query_dim=self.dim,
                    heads=self.num_attention_heads,
                    dim_head=self.attention_head_dim,
                    cross_attention_dim=(self.cross_attention_dim
                                         if is_cross else None),
                    temporal_position_encoding=(
                        self.temporal_position_encoding),
                    temporal_position_encoding_max_len=(
                        self.temporal_position_encoding_max_len),
                    use_rope=self.use_rope,
                    train_video_length=self.train_video_length,
                    add_temporal_lora=self.add_temporal_lora,
                    lora_rank=self.lora_rank,
                    dtype=self.dtype,
                    name=f"attention_blocks_{i}",
                )(normed, video_length=video_length,
                  context=context if is_cross else None)

            h = pab_site(self, "temporal", f"attn_{i}_out", self.pab,
                         lambda: _attn(h)) + h
        h = _ln_ff_residual(self, h, self.dim, self.dtype, "ff_norm", "ff")
        return h


class MotionModule(nn.Module):
    """VanillaTemporalModule → TemporalTransformer3DModel:
    GroupNorm → Linear proj_in → blocks → Linear proj_out (zero-init) → residual
    (reference motion_module.py:51-208)."""

    in_channels: int
    config: MotionModuleConfig
    pab: Optional[PabMode] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.config
        b, f, hh, ww, c = hidden_states.shape
        inner_dim = c  # temporal_attention_dim_div=1 keeps full width
        head_dim = c // cfg.num_attention_heads // cfg.temporal_attention_dim_div

        x = hidden_states.reshape(b * f, hh, ww, c)
        residual = x
        x = GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                      name="norm")(x)
        x = x.reshape(b * f, hh * ww, c)
        x = nn.Dense(inner_dim, dtype=self.dtype, name="proj_in")(x)

        # ONE transpose to the frames-minor layout (B·HW, F, C) for the whole
        # block stack — attention mixes along frames; LN/FF/projections are
        # position-independent so they run in either layout. Per-attention
        # transposes cost ~0.6 ms of HBM relayout each at 64² clip sizes.
        x = x.reshape(b, f, hh * ww, inner_dim).transpose(0, 2, 1, 3)
        x = x.reshape(b * hh * ww, f, inner_dim)

        for i in range(cfg.num_transformer_block):
            x = TemporalTransformerBlock(
                dim=inner_dim,
                num_attention_heads=cfg.num_attention_heads,
                attention_head_dim=head_dim,
                attention_block_types=tuple(cfg.attention_block_types),
                temporal_position_encoding=cfg.temporal_position_encoding,
                temporal_position_encoding_max_len=(
                    cfg.temporal_position_encoding_max_len),
                use_rope=cfg.use_rope_position_encoding,
                train_video_length=cfg.train_video_length,
                add_temporal_lora=cfg.add_temporal_lora,
                lora_rank=cfg.lora_rank,
                pab=self.pab,
                dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(x, video_length=f, context=context)

        proj_out = nn.Dense(
            c, dtype=self.dtype,
            kernel_init=(nn.initializers.zeros if cfg.zero_initialize
                         else nn.initializers.lecun_normal()),
            bias_init=nn.initializers.zeros,
            name="proj_out")
        x = proj_out(x)
        # back from frames-minor to (B·F, H, W, C)
        x = x.reshape(b, hh * ww, f, c).transpose(0, 2, 1, 3)
        x = x.reshape(b * f, hh, ww, c) + residual
        return x.reshape(b, f, hh, ww, c)
