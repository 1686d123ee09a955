"""FlowNet2: the full stacked estimator (CSS branch + SD branch + fusion).

Behavior spec: reference ``mmflow/configs/_base_/models/flownet2/flownet2.py``
and ``mmflow/mmflow/models/flow_estimators/flownet2.py:212-330`` —
- the CSS cascade (see ``flow.flownet.FlowNetCSS``);
- FlowNetSD: a FlowNetS specialised for small displacements
  (``FlowNetSDEncoder``: a stride-1 64ch stem "plugin" conv, kernel-3 levels
  with per-conv channels ((64,128),128,256,512,512,1024), 2 convs per level)
  with inter-conv decoder blocks;
- a 3-level fusion FlowNetS over the 11-channel stack (img1, both branches'
  scaled flows, flow norms, brightness errors), flow_div 1, predicting at
  full resolution.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from followyourclick_tpu.flow.flownet import (
    FlowNetCSS,
    FlowNetConfig,
    FlowNetEncoder,
    _leaky,
)
from followyourclick_tpu.flow.ops import flow_warp


class MultiConvStack(nn.Module):
    """Conv stack with PER-CONV output channels (utils/basic_encoder.py
    BasicConvBlock with tuple out_channels); first conv strided."""

    channels: Tuple[int, ...]
    kernel: int = 3
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for j, ch in enumerate(self.channels):
            x = nn.Conv(ch, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride) if j == 0
                        else (1, 1),
                        padding=self.kernel // 2, dtype=self.dtype,
                        name=f"conv{j}")(x)
            x = _leaky(x)
        return x


class FlowNetSDEncoder(nn.Module):
    """encoders/flownet_encoder.py FlowNetSDEncoder: stride-1 stem conv
    (plugin_channels=64) then kernel-3 levels, 2 convs each."""

    plugin_channels: int = 64
    level_channels: Tuple[Tuple[int, ...], ...] = (
        (64, 128), (128, 128), (256, 256), (512, 512), (512, 512),
        (1024, 1024))
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[int, jnp.ndarray]:
        x = _leaky(nn.Conv(self.plugin_channels, (3, 3), padding=1,
                           dtype=self.dtype, name="stem")(x))
        feats = {}
        for i, chans in enumerate(self.level_channels):
            x = MultiConvStack(tuple(chans), dtype=self.dtype,
                               name=f"level{i + 1}")(x)
            feats[i + 1] = x
        return feats


class InterFlowDecoderBlock(nn.Module):
    """FlowNet decoder block WITH the inter conv (flownet_decoder.py
    BasicBlock inter_channels: an extra 3x3 conv before the flow head —
    the SD and fusion decoders use it)."""

    out_channels: Optional[int]
    inter_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = x
        if self.inter_channels is not None:
            feat = _leaky(nn.Conv(self.inter_channels, (3, 3), padding=1,
                                  dtype=self.dtype, name="inter")(x))
        flow = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype,
                       name="predict")(feat)
        upflow = upfeat = None
        if self.out_channels is not None:
            def up(name, src, features, act):
                y = nn.ConvTranspose(
                    features, (4, 4), strides=(2, 2), padding="VALID",
                    transpose_kernel=True, dtype=self.dtype, name=name,
                )(src)[:, 1:-1, 1:-1, :]
                return _leaky(y) if act else y

            upfeat = up("deconv", x, self.out_channels, act=True)
            upflow = up("upsample_pred", flow, 2, act=False)
        return flow, upflow, upfeat


class GenericFlowNetDecoder(nn.Module):
    """Coarse-to-fine decoder over an arbitrary level range with optional
    inter convs (FlowNetSDecoder with inter_channels)."""

    levels: Tuple[int, ...]  # descending, e.g. (6, 5, 4, 3, 2) or (3, 2, 1)
    out_channels: Dict[int, Optional[int]]
    inter_channels: Dict[int, Optional[int]]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict[int, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        preds = {}
        upflow = upfeat = None
        for level in self.levels:
            if upflow is None:
                x = feats[level]
            else:
                x = jnp.concatenate([feats[level], upfeat, upflow], axis=-1)
            flow, upflow, upfeat = InterFlowDecoderBlock(
                self.out_channels.get(level),
                self.inter_channels.get(level),
                dtype=self.dtype, name=f"level{level}",
            )(x)
            preds[f"level{level}"] = flow
        return preds


class FlowNetSD(nn.Module):
    """Small-displacement FlowNetS branch."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img1, img2) -> Dict[str, jnp.ndarray]:
        x = jnp.concatenate([img1, img2], axis=-1)
        feats = FlowNetSDEncoder(dtype=self.dtype, name="encoder")(x)
        return GenericFlowNetDecoder(
            levels=(6, 5, 4, 3, 2),
            out_channels={6: 512, 5: 256, 4: 128, 3: 64, 2: None},
            inter_channels={5: 512, 4: 256, 3: 128, 2: 64},
            dtype=self.dtype, name="decoder",
        )(feats)


def _link(img1, img2, flow, flow_div, scale_factor=4):
    """BasicLink outputs used by the fusion stage
    (utils/estimators_link.py:46-66): scaled upsampled flow, its norm,
    brightness error."""
    B, h, w, _ = flow.shape
    H, W = h * scale_factor, w * scale_factor
    up = jax.image.resize(flow, (B, H, W, 2), "bilinear")
    scaled = up * flow_div
    norm = jnp.sqrt(jnp.sum(scaled**2, axis=-1, keepdims=True))
    warped = flow_warp(img2, scaled, padding_mode="border")
    err = jnp.sqrt(jnp.sum((img1 - warped) ** 2, axis=-1, keepdims=True))
    return scaled, norm, err


@dataclasses.dataclass(frozen=True)
class FlowNet2Config:
    flow_div: float = 20.0
    dtype: jnp.dtype = jnp.float32


class FlowNet2(nn.Module):
    """Full FlowNet2 (flow_estimators/flownet2.py:212-330)."""

    config: FlowNet2Config = FlowNet2Config()

    @nn.compact
    def __call__(self, img1, img2, inference: bool = False):
        cfg = self.config
        fcfg = FlowNetConfig(flow_div=cfg.flow_div, dtype=cfg.dtype)
        flow_css = FlowNetCSS(fcfg, name="flownetCSS")(img1, img2)["level2"]
        flow_sd = FlowNetSD(dtype=cfg.dtype, name="flownetSD")(
            img1, img2)["level2"]

        css_scaled, css_norm, css_err = _link(img1, img2, flow_css,
                                              cfg.flow_div)
        sd_scaled, sd_norm, sd_err = _link(img1, img2, flow_sd, cfg.flow_div)
        # 11 channels: img1(3) + sd flow(2) + css flow(2) + norms(2) + errs(2)
        x = jnp.concatenate(
            [img1, sd_scaled, css_scaled, sd_norm, css_norm, sd_err, css_err],
            axis=-1)

        feats = FlowNetEncoder(
            out_channels=(64, (64, 128), 128),
            kernel_sizes=(3, 3, 3),
            num_convs=(1, 2, 2),
            strides=(1, 2, 2),
            dtype=cfg.dtype, name="fusion_encoder",
        )(x)
        preds = GenericFlowNetDecoder(
            levels=(3, 2, 1),
            out_channels={3: 32, 2: 16, 1: None},
            inter_channels={2: 32, 1: 16},
            dtype=cfg.dtype, name="fusion_decoder",
        )(feats)
        if inference:
            # the fusion head predicts at full resolution with flow_div 1
            return preds["level1"]
        return preds
