"""FlowNetS / FlowNetC estimators, TPU-native.

Behavior spec: reference ``mmflow/configs/_base_/models/flownets.py`` /
``flownetc.py`` and ``mmflow/mmflow/models/`` — ``FlowNetEncoder``
(encoders/flownet_encoder.py via utils/basic_encoder.py: per-level conv
stacks, LeakyReLU 0.1; FlowNetS consumes the 6-channel concatenated image
pair through 6 levels (64,128,256,512,512,1024) with kernels
(7,5,(5,3),3,3,3); FlowNetC runs a shared 3-level stem (64,128,256) per
image), ``CorrEncoder`` (correlation d=10 with dilation_patch 2 → 441ch +
1x1 redirect 256→32, then conv stacks (256,512,512,1024)), and
``FlowNetSDecoder``/``FlowNetCDecoder`` (decoders/flownet_decoder.py:
per-level conv3x3 flow head + k4/s2 transposed-conv feature and flow
upsampling, refined coarse-to-fine level6→level2).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from followyourclick_tpu.flow.ops import local_correlation


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class ConvStack(nn.Module):
    """One pyramid level: first conv strided, optional extra convs
    (utils/basic_encoder.py BasicConvBlock). ``per_conv_channels`` overrides
    ``out_channels`` with one width per conv (the SD/fusion encoders use
    e.g. (64, 128) within one level)."""

    out_channels: int
    kernel_sizes: Tuple[int, ...]
    stride: int = 2
    per_conv_channels: Optional[Tuple[int, ...]] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for j, k in enumerate(self.kernel_sizes):
            ch = (self.per_conv_channels[j] if self.per_conv_channels
                  else self.out_channels)
            x = nn.Conv(
                ch, (k, k),
                strides=(self.stride, self.stride) if j == 0 else (1, 1),
                padding=k // 2, dtype=self.dtype, name=f"conv{j}",
            )(x)
            x = _leaky(x)
        return x


class FlowNetEncoder(nn.Module):
    """Pyramid encoder; returns {level: feature}. ``out_channels`` entries
    may be tuples (one width per conv); ``strides`` defaults to 2 per level
    (the fusion encoder uses stride 1 on its first level)."""

    out_channels: Tuple[Union[int, Tuple[int, ...]], ...]
    kernel_sizes: Tuple[Union[int, Tuple[int, ...]], ...]
    num_convs: Tuple[int, ...]
    strides: Optional[Tuple[int, ...]] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[int, jnp.ndarray]:
        feats = {}
        for i, ch in enumerate(self.out_channels):
            ks = self.kernel_sizes[i]
            if isinstance(ks, int):
                ks = (ks,) * self.num_convs[i]
            per_conv = tuple(ch) if isinstance(ch, (tuple, list)) else None
            stride = self.strides[i] if self.strides else 2
            x = ConvStack(ch if per_conv is None else per_conv[-1],
                          tuple(ks), stride=stride,
                          per_conv_channels=per_conv, dtype=self.dtype,
                          name=f"level{i + 1}")(x)
            feats[i + 1] = x
        return feats


class FlowDecoderBlock(nn.Module):
    """conv3x3 flow head + k4/s2 transposed-conv up layers
    (flownet_decoder.py BasicBlock)."""

    out_channels: Optional[int]  # None on the finest level (no upsampling)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        flow = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype,
                       name="predict")(x)
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


_DECODER_OUT = {6: 512, 5: 256, 4: 128, 3: 64, 2: None}


class _FlowNetDecoder(nn.Module):
    """Coarse-to-fine refinement shared by S and C variants."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat1: Dict[int, jnp.ndarray],
                 corr_feat: Dict[int, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        flow_pred = {}
        upflow = upfeat = None
        levels = sorted(_DECODER_OUT, reverse=True)
        for level in levels:
            if level == levels[0]:
                x = corr_feat[level]
            elif level in corr_feat:
                x = jnp.concatenate([corr_feat[level], upfeat, upflow],
                                    axis=-1)
            else:
                x = jnp.concatenate([feat1[level], upfeat, upflow], axis=-1)
            flow, upflow, upfeat = FlowDecoderBlock(
                _DECODER_OUT[level], dtype=self.dtype, name=f"level{level}"
            )(x)
            flow_pred[f"level{level}"] = flow
        return flow_pred


@dataclasses.dataclass(frozen=True)
class FlowNetConfig:
    flow_div: float = 20.0
    dtype: jnp.dtype = jnp.float32


class FlowNetS(nn.Module):
    """flownets.py: 6-channel stacked input, 6-level encoder, S-decoder."""

    config: FlowNetConfig = FlowNetConfig()

    @nn.compact
    def __call__(self, img1, img2, inference: bool = False, extra=None):
        cfg = self.config
        parts = [img1, img2] if extra is None else [img1, img2, extra]
        x = jnp.concatenate(parts, axis=-1)
        feats = FlowNetEncoder(
            out_channels=(64, 128, 256, 512, 512, 1024),
            kernel_sizes=(7, 5, (5, 3), 3, 3, 3),
            num_convs=(1, 1, 2, 2, 2, 2),
            dtype=cfg.dtype, name="encoder",
        )(x)
        preds = _FlowNetDecoder(dtype=cfg.dtype, name="decoder")(feats, feats)
        if inference:
            H, W = img1.shape[1:3]
            fine = preds["level2"]
            out = jax.image.resize(fine, (fine.shape[0], H, W, 2),
                                   method="bilinear")
            return out * cfg.flow_div
        return preds


class FlowNetC(nn.Module):
    """flownetc.py: shared 3-level stem per image, correlation at level3
    (d=10, dilation_patch 2, 441ch) + 1x1 redirect, CorrEncoder levels 3-6,
    C-decoder that falls back to image-1 features at level 2."""

    config: FlowNetConfig = FlowNetConfig()

    @nn.compact
    def __call__(self, img1, img2, inference: bool = False):
        cfg = self.config
        stem = FlowNetEncoder(
            out_channels=(64, 128, 256), kernel_sizes=(7, 5, 5),
            num_convs=(1, 1, 1), dtype=cfg.dtype, name="encoder",
        )
        feat1 = stem(img1)
        feat2 = stem(img2)

        corr = _leaky(
            local_correlation(feat1[3], feat2[3], max_displacement=10,
                              dilation_patch=2)
        )
        redir = _leaky(
            nn.Conv(32, (1, 1), dtype=cfg.dtype, name="conv_redir")(feat1[3])
        )
        x = jnp.concatenate([corr, redir], axis=-1)  # 441 + 32 = 473

        corr_feat: Dict[int, jnp.ndarray] = {}
        specs = [(3, 256, 1, 1), (4, 512, 2, 2), (5, 512, 2, 2),
                 (6, 1024, 2, 2)]
        for level, ch, stride, n in specs:
            x = ConvStack(ch, (3,) * n, stride=stride, dtype=cfg.dtype,
                          name=f"corr_level{level}")(x)
            corr_feat[level] = x

        preds = _FlowNetDecoder(dtype=cfg.dtype, name="decoder")(
            feat1, corr_feat
        )
        if inference:
            H, W = img1.shape[1:3]
            fine = preds["level2"]
            out = jax.image.resize(fine, (fine.shape[0], H, W, 2),
                                   method="bilinear")
            return out * cfg.flow_div
        return preds


def basic_link(img1, img2, flow, flow_div: float, scale_factor: int = 4):
    """Estimator link (mmflow utils/estimators_link.py BasicLink): upsample
    the coarse flow, warp img2 by the SCALED flow (border padding), return
    (upsampled flow, warped image, brightness error)."""
    B, h, w, _ = flow.shape
    H, W = h * scale_factor, w * scale_factor
    up = jax.image.resize(flow, (B, H, W, 2), method="bilinear")
    scaled = up * flow_div
    from followyourclick_tpu.flow.ops import flow_warp

    warped = flow_warp(img2, scaled, padding_mode="border")
    diff = img1 - warped
    bright_err = jnp.sqrt(jnp.sum(diff**2, axis=-1, keepdims=True))
    return up, warped, bright_err


class FlowNetCSS(nn.Module):
    """Stacked FlowNet2-CSS (mmflow flow_estimators/flownet2.py:13-210):
    FlowNetC predicts, the link warps image 2 by the prediction, and one or
    two FlowNetS refine from (img1, img2, warped, upflow, brightness-error)
    12-channel inputs. The published FlowNet2 trains the stages
    progressively; here all stages train jointly unless frozen by the
    optimizer mask."""

    config: FlowNetConfig = FlowNetConfig()
    two_s_stages: bool = True

    @nn.compact
    def __call__(self, img1, img2, inference: bool = False):
        cfg = self.config
        flowc = FlowNetC(cfg, name="flownetC")(img1, img2)["level2"]
        up1, warped1, err1 = basic_link(img1, img2, flowc, cfg.flow_div)
        extra1 = jnp.concatenate([warped1, up1, err1], axis=-1)
        s1 = FlowNetS(cfg, name="flownetS1")
        preds = s1(img1, img2, extra=extra1)
        if self.two_s_stages:
            up2, warped2, err2 = basic_link(
                img1, img2, preds["level2"], cfg.flow_div)
            extra2 = jnp.concatenate([warped2, up2, err2], axis=-1)
            preds = FlowNetS(cfg, name="flownetS2")(img1, img2, extra=extra2)
        if inference:
            H, W = img1.shape[1:3]
            fine = preds["level2"]
            out = jax.image.resize(fine, (fine.shape[0], H, W, 2),
                                   method="bilinear")
            return out * cfg.flow_div
        return preds
