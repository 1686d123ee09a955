"""UNet3D down/mid/up blocks: per layer ResnetBlock3D → SpatialTransformer3D →
MotionModule, with down/upsampling.

Behavior spec: reference ``animatediff/models/unet_blocks.py`` —
``UNetMidBlock3DCrossAttn`` (:219, fwd :342-360), ``CrossAttnDownBlock3D``
(:363, fwd :482-529), ``DownBlock3D`` (:532), ``CrossAttnUpBlock3D`` (:635, fwd
:749-809), ``UpBlock3D`` (:812). The dead ``first_images_mask_sample``
computations (:346-356, :786-798 — computed, never used) are deliberately not
reproduced. Gradient checkpointing is applied with ``jax.checkpoint`` at the
layer level (a policy the caller chooses, not module state).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from followyourclick_tpu.config import UNet3DConfig
from followyourclick_tpu.models.attention import SpatialTransformer3D
from followyourclick_tpu.models.motion_module import MotionModule
from followyourclick_tpu.models.pab import PabMode
from followyourclick_tpu.models.resnet import (
    Downsample3D,
    ResnetBlock3D,
    Upsample3D,
    tile_to_batch,
)


def _spatial_transformer(cfg: UNet3DConfig, out_channels: int, name: str,
                         dtype, pab=None) -> SpatialTransformer3D:
    num_heads = cfg.attention_head_dim  # diffusers-SD1.5: this is head COUNT
    return SpatialTransformer3D(
        in_channels=out_channels,
        num_attention_heads=num_heads,
        attention_head_dim=out_channels // num_heads,
        num_layers=1,
        cross_attention_dim=cfg.cross_attention_dim,
        norm_num_groups=cfg.norm_num_groups,
        use_linear_projection=cfg.use_linear_projection,
        upcast_attention=cfg.upcast_attention,
        use_ip_cross_attention=cfg.use_ip_cross_attention,
        ip_scale=cfg.ip_scale,
        ip_num_tokens=cfg.ip_num_tokens,
        use_text_encoder_2=cfg.use_text_encoder_2,
        unet_use_cross_frame_attention=cfg.unet_use_cross_frame_attention,
        unet_use_temporal_attention=cfg.unet_use_temporal_attention,
        pab=pab,
        dtype=dtype,
        name=name,
    )


def _resnet(cfg: UNet3DConfig, in_ch: int, out_ch: int, name: str,
            dtype) -> ResnetBlock3D:
    return ResnetBlock3D(
        in_channels=in_ch,
        out_channels=out_ch,
        groups=cfg.norm_num_groups,
        eps=cfg.norm_eps if cfg.norm_eps else 1e-6,
        use_inflated_groupnorm=cfg.use_inflated_groupnorm,
        use_pseudo_conv3d=cfg.use_pseudo_conv3d,
        use_temporal_conv=cfg.use_temporal_conv,
        time_embedding_norm=cfg.resnet_time_scale_shift,
        dtype=dtype,
        name=name,
    )


def _motion(cfg: UNet3DConfig, channels: int, name: str,
            dtype, pab=None) -> Optional[MotionModule]:
    return MotionModule(in_channels=channels, config=cfg.motion_module,
                        pab=pab, dtype=dtype, name=name)


class CrossAttnDownBlock3D(nn.Module):
    config: UNet3DConfig
    in_channels: int
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    use_motion: bool = True
    pab: Optional[PabMode] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb, context, context_2=None,
                 temb_frame0=None):
        cfg = self.config
        output_states = []
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            hidden_states = _resnet(cfg, in_ch, self.out_channels,
                                    f"resnets_{i}", self.dtype)(
                hidden_states, temb, temb_frame0)
            hidden_states = _spatial_transformer(
                cfg, self.out_channels, f"attentions_{i}", self.dtype,
                self.pab)(hidden_states, context, context_2)
            if self.use_motion:
                hidden_states = _motion(cfg, self.out_channels,
                                        f"motion_modules_{i}", self.dtype,
                                        self.pab)(hidden_states)
            output_states.append(hidden_states)
        if self.add_downsample:
            hidden_states = Downsample3D(
                self.out_channels, padding=cfg.downsample_padding,
                dtype=self.dtype, name="downsamplers_0")(hidden_states)
            output_states.append(hidden_states)
        return hidden_states, output_states


class DownBlock3D(nn.Module):
    config: UNet3DConfig
    in_channels: int
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    use_motion: bool = True
    pab: Optional[PabMode] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb, temb_frame0=None):
        cfg = self.config
        output_states = []
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            hidden_states = _resnet(cfg, in_ch, self.out_channels,
                                    f"resnets_{i}", self.dtype)(
                hidden_states, temb, temb_frame0)
            if self.use_motion:
                hidden_states = _motion(cfg, self.out_channels,
                                        f"motion_modules_{i}", self.dtype,
                                        self.pab)(hidden_states)
            output_states.append(hidden_states)
        if self.add_downsample:
            hidden_states = Downsample3D(
                self.out_channels, padding=cfg.downsample_padding,
                dtype=self.dtype, name="downsamplers_0")(hidden_states)
            output_states.append(hidden_states)
        return hidden_states, output_states


class UNetMidBlock3DCrossAttn(nn.Module):
    config: UNet3DConfig
    in_channels: int
    num_layers: int = 1
    use_motion: bool = False  # motion_module_mid_block defaults False
    pab: Optional[PabMode] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb, context, context_2=None,
                 temb_frame0=None):
        cfg = self.config
        hidden_states = _resnet(cfg, self.in_channels, self.in_channels,
                                "resnets_0", self.dtype)(
            hidden_states, temb, temb_frame0)
        for i in range(self.num_layers):
            hidden_states = _spatial_transformer(
                cfg, self.in_channels, f"attentions_{i}", self.dtype,
                self.pab)(hidden_states, context, context_2)
            if self.use_motion:
                hidden_states = _motion(cfg, self.in_channels,
                                        f"motion_modules_{i}", self.dtype,
                                        self.pab)(hidden_states)
            hidden_states = _resnet(cfg, self.in_channels, self.in_channels,
                                    f"resnets_{i + 1}", self.dtype)(
                hidden_states, temb, temb_frame0)
        return hidden_states


class CrossAttnUpBlock3D(nn.Module):
    config: UNet3DConfig
    in_channels: int          # skip channels of the deepest popped skip
    prev_output_channel: int
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    use_motion: bool = True
    pab: Optional[PabMode] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, res_hidden_states: Sequence[jnp.ndarray],
                 temb, context, context_2=None, temb_frame0=None,
                 upsample_size=None):
        cfg = self.config
        res_list = list(res_hidden_states)
        for i in range(self.num_layers):
            res = res_list.pop()
            skip_ch = res.shape[-1]
            in_ch = (self.prev_output_channel if i == 0
                     else self.out_channels) + skip_ch
            # skips saved before the CFG prefix-sharing duplication point
            # (e.g. the conv_in output) are at the pre-CFG batch
            res = tile_to_batch(res, hidden_states.shape[0])
            hidden_states = jnp.concatenate([hidden_states, res], axis=-1)
            hidden_states = _resnet(cfg, in_ch, self.out_channels,
                                    f"resnets_{i}", self.dtype)(
                hidden_states, temb, temb_frame0)
            hidden_states = _spatial_transformer(
                cfg, self.out_channels, f"attentions_{i}", self.dtype,
                self.pab)(hidden_states, context, context_2)
            if self.use_motion:
                hidden_states = _motion(cfg, self.out_channels,
                                        f"motion_modules_{i}", self.dtype,
                                        self.pab)(hidden_states)
        if self.add_upsample:
            hidden_states = Upsample3D(self.out_channels, dtype=self.dtype,
                                       name="upsamplers_0")(
                hidden_states, output_size=upsample_size)
        return hidden_states


class UpBlock3D(nn.Module):
    config: UNet3DConfig
    in_channels: int
    prev_output_channel: int
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    use_motion: bool = True
    pab: Optional[PabMode] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, res_hidden_states: Sequence[jnp.ndarray],
                 temb, temb_frame0=None, upsample_size=None):
        cfg = self.config
        res_list = list(res_hidden_states)
        for i in range(self.num_layers):
            res = res_list.pop()
            skip_ch = res.shape[-1]
            in_ch = (self.prev_output_channel if i == 0
                     else self.out_channels) + skip_ch
            res = tile_to_batch(res, hidden_states.shape[0])
            hidden_states = jnp.concatenate([hidden_states, res], axis=-1)
            hidden_states = _resnet(cfg, in_ch, self.out_channels,
                                    f"resnets_{i}", self.dtype)(
                hidden_states, temb, temb_frame0)
            if self.use_motion:
                hidden_states = _motion(cfg, self.out_channels,
                                        f"motion_modules_{i}", self.dtype,
                                        self.pab)(hidden_states)
        if self.add_upsample:
            hidden_states = Upsample3D(self.out_channels, dtype=self.dtype,
                                       name="upsamplers_0")(
                hidden_states, output_size=upsample_size)
        return hidden_states
