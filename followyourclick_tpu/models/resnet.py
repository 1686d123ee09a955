"""Pseudo-3D convolutional blocks, NHWC / frames-folded-into-batch.

Behavior spec: reference ``animatediff/models/resnet.py`` — ``InflatedConv3d``
(:19-27, a 2D conv applied per frame), ``InflatedGroupNorm`` (:9-17),
``PseudoConv3d`` (:70-119), ``TemporalConvBlock`` (:29-68), ``Upsample3D``
(:122-170), ``Downsample3D`` (:173-196), ``ResnetBlock3D`` (:199-342 incl. the
first-frame zero-timestep trick :309-317).

TPU design notes: video tensors are ``(B, F, H, W, C)``; a per-frame 2D conv is
just a conv over the reshaped ``(B·F, H, W, C)`` — a free reshape in XLA, and
NHWC convs map straight onto the MXU.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from followyourclick_tpu.models.layers import (
    Conv2dParams,
    GroupNorm,
    get_activation,
)
from followyourclick_tpu.ops.upsample import conv3x3_nearest_up2


def fold_frames(x: jnp.ndarray) -> tuple[jnp.ndarray, int]:
    """(B, F, H, W, C) -> ((B·F, H, W, C), F)."""
    b, f, h, w, c = x.shape
    return x.reshape(b * f, h, w, c), f


def tile_to_batch(t: Optional[jnp.ndarray], b: int) -> Optional[jnp.ndarray]:
    """CFG prefix sharing: conditioning computed at the pre-duplication batch
    is tiled to the post-duplication batch (see unet3d.py — the cond/uncond
    halves are identical until text context enters at the first
    cross-attention, so the stem runs once at half batch and everything
    batch-shaped from before the duplication point is tiled on use)."""
    if t is None or t.shape[0] == b:
        return t
    assert b % t.shape[0] == 0, (t.shape, b)
    return jnp.concatenate([t] * (b // t.shape[0]), axis=0)


def unfold_frames(x: jnp.ndarray, frames: int) -> jnp.ndarray:
    bf, h, w, c = x.shape
    return x.reshape(bf // frames, frames, h, w, c)


class InflatedConv(nn.Module):
    """2D conv applied independently per frame (InflatedConv3d equivalent)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        folded, f = fold_frames(x)
        out = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dtype=self.dtype,
            name="conv",
        )(folded)
        return unfold_frames(out, f)


class PseudoConv3d(nn.Module):
    """2D spatial conv + identity-initialized temporal 1-D conv
    (reference resnet.py:70-119). The temporal conv is a depth-preserving
    kernel-3 conv along the frame axis, initialized to the identity (dirac)."""

    features: int
    kernel_size: int = 3
    temporal_kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, f, h, w, c = x.shape
        folded, _ = fold_frames(x)
        p = self.kernel_size // 2
        out = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                      padding=((p, p), (p, p)), dtype=self.dtype,
                      name="spatial_conv")(folded)
        out = unfold_frames(out, f)
        if f == 1:
            return out

        def dirac_init(key, shape, dtype=jnp.float32):
            k, cin, cout = shape
            w_ = jnp.zeros(shape, dtype)
            return w_.at[k // 2].set(jnp.eye(cin, cout, dtype=dtype))

        # temporal conv over the frame axis, per spatial location
        bt = out.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, self.features)
        tp = self.temporal_kernel_size // 2
        bt = nn.Conv(self.features, (self.temporal_kernel_size,),
                     padding=((tp, tp),), dtype=self.dtype,
                     kernel_init=dirac_init, bias_init=nn.initializers.zeros,
                     name="temporal_conv")(bt)
        return bt.reshape(b, h, w, f, self.features).transpose(0, 3, 1, 2, 4)


class TemporalConvBlock(nn.Module):
    """4× (GroupNorm → SiLU → temporal conv k=3) with zero-init last conv
    (reference resnet.py:29-68)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, f, h, w, c = x.shape
        identity = x
        h_ = x
        for i in range(4):
            # GroupNorm over the whole clip volume (torch GroupNorm on 5D)
            h_ = GroupNorm(num_groups=32, dtype=self.dtype, act="silu",
                           name=f"norm{i + 1}")(h_)
            is_last = i == 3
            # (3,1,1) conv3d == k=3 conv along frames per spatial location
            h_ = h_.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
            h_ = nn.Conv(
                self.features, (3,), padding=((1, 1),), dtype=self.dtype,
                kernel_init=(nn.initializers.zeros if is_last
                             else nn.initializers.lecun_normal()),
                name=f"conv{i + 1}")(h_)
            h_ = h_.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)
        return identity + h_


class Upsample3D(nn.Module):
    """Nearest ×2 spatial upsample + conv, frames untouched
    (reference resnet.py:122-170)."""

    features: int
    use_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 output_size: Optional[tuple[int, int]] = None) -> jnp.ndarray:
        folded, f = fold_frames(x)
        bf, h, w, c = folded.shape
        if output_size is None:
            nh, nw = h * 2, w * 2
        else:
            nh, nw = output_size
        if not self.use_conv:
            up = jnp.repeat(jnp.repeat(folded, nh // h, axis=1),
                            nw // w, axis=2)
            return unfold_frames(up, f)
        # one param creation site for both paths (checkpoint tree == nn.Conv)
        kernel, bias = Conv2dParams(c, self.features, name="conv")()
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        if (nh, nw) == (2 * h, 2 * w):
            # exact phase-decomposed rewrite: 2.25× fewer MACs, no 4×
            # intermediate (ops/upsample.py; v5e per CFG step: 8.2→5.9 ms at
            # 32→64/C=640, 8.0→5.2 ms at 16→32/C=1280)
            up = conv3x3_nearest_up2(folded, kernel, bias)
        else:
            up = jnp.repeat(jnp.repeat(folded, nh // h, axis=1),
                            nw // w, axis=2)
            up = jax.lax.conv_general_dilated(
                up, kernel, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        return unfold_frames(up, f)


class Downsample3D(nn.Module):
    """Stride-2 conv downsample per frame (reference resnet.py:173-196)."""

    features: int
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        folded, f = fold_frames(x)
        p = self.padding
        out = nn.Conv(self.features, (3, 3), strides=(2, 2),
                      padding=((p, p), (p, p)), dtype=self.dtype,
                      name="conv")(folded)
        return unfold_frames(out, f)


class ResnetBlock3D(nn.Module):
    """norm1 → SiLU → conv1 → (+temb) → norm2 → SiLU → conv2 → +shortcut
    (reference resnet.py:199-342).

    The reference's "first-frame timestep trick" (resnet.py:309-317) — when the
    pipeline passes one extra zero-timestep embedding, frame 0 receives it and
    frames 1..F receive the regular one — is expressed here as an explicit
    optional ``temb_frame0`` instead of batch-shape sniffing.
    """

    out_channels: int
    in_channels: int
    groups: int = 32
    eps: float = 1e-6
    use_inflated_groupnorm: bool = False
    use_pseudo_conv3d: bool = False
    use_temporal_conv: bool = False
    non_linearity: str = "swish"
    output_scale_factor: float = 1.0
    time_embedding_norm: str = "default"
    dtype: jnp.dtype = jnp.float32

    def _norm(self, name: str, groups: int):
        # fold the block's SiLU into the norm when the nonlinearity is
        # swish/silu (single-pass TPU kernel, ops/groupnorm.py)
        fold = "silu" if self.non_linearity in ("swish", "silu") else None
        return GroupNorm(num_groups=groups, epsilon=self.eps, dtype=self.dtype,
                         act=fold, name=name)

    def _apply_norm(self, norm, x: jnp.ndarray) -> jnp.ndarray:
        # Naming follows the reference (resnet.py:9-17): InflatedGroupNorm
        # folds frames into batch → PER-FRAME statistics; the default plain
        # GroupNorm runs on the 5D clip → statistics over (F, H, W, C/g).
        if self.use_inflated_groupnorm:
            folded, f = fold_frames(x)
            return unfold_frames(norm(folded), f)
        return norm(x)

    def _conv(self, name: str, features: int, kernel: int = 3):
        if self.use_pseudo_conv3d:
            return PseudoConv3d(features, kernel_size=kernel, dtype=self.dtype,
                                name=name)
        return InflatedConv(features, kernel_size=kernel,
                            padding=kernel // 2, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        temb: Optional[jnp.ndarray],
        temb_frame0: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        act = get_activation(self.non_linearity)
        folded = self.non_linearity in ("swish", "silu")
        # CFG prefix sharing: after the in-UNet duplication point the hidden
        # batch is a multiple of the time-embedding batch
        temb = tile_to_batch(temb, x.shape[0])
        temb_frame0 = tile_to_batch(temb_frame0, x.shape[0])
        hidden = self._apply_norm(self._norm("norm1", self.groups), x)
        if not folded:
            hidden = act(hidden)
        hidden = self._conv("conv1", self.out_channels)(hidden)

        if temb is not None:
            temb_proj = nn.Dense(self.out_channels, dtype=self.dtype,
                                 name="time_emb_proj")
            t = temb_proj(act(temb))[:, None, None, None, :]  # (B,1,1,1,C)
            if temb_frame0 is not None:
                t0 = temb_proj(act(temb_frame0))[:, None, None, None, :]
                f = hidden.shape[1]
                frame_idx = jnp.arange(f)[None, :, None, None, None]
                t = jnp.where(frame_idx == 0, t0, t)
            hidden = hidden + t

        hidden = self._apply_norm(self._norm("norm2", self.groups), hidden)
        if not folded:
            hidden = act(hidden)
        hidden = self._conv("conv2", self.out_channels)(hidden)

        if self.in_channels != self.out_channels:
            x = self._conv("conv_shortcut", self.out_channels, kernel=1)(x)

        out = (x + hidden) / self.output_scale_factor
        if self.use_temporal_conv:
            out = TemporalConvBlock(self.out_channels, dtype=self.dtype,
                                    name="temporal_conv")(out)
        return out
