"""PWC-Net optical-flow estimator, TPU-native.

Behavior spec: reference ``mmflow/configs/_base_/models/pwcnet.py`` and
``mmflow/mmflow/models/`` — ``PWCNetEncoder`` ('Basic': 6 pyramid levels of
3 convs each, out channels (16, 32, 64, 96, 128, 196), stride 2 per level,
LeakyReLU 0.1; encoders/pwcnet_encoder.py + utils/basic_encoder.py),
``PWCNetDecoder`` (decoders/pwcnet_decoder.py: coarse-to-fine level6→level2,
local correlation window d=4 (81ch, LeakyReLU), warp by the upsampled flow ×
``flow_div·2^-level``, dense blocks (128,128,96,64,32) with concat growth,
conv3x3 flow head, transposed-conv upflow/upfeat), and ``ContextNet``
(decoders/context_net.py: dilated (1,2,4,8,16,1) refinement added to the
level2 flow).

TPU-first: the local correlation is (2d+1)² fused shifted multiply-reduces
(no mmcv CUDA op); warps are the shared gather-based ``flow_warp``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from followyourclick_tpu.flow.ops import flow_warp, local_correlation


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


@dataclasses.dataclass(frozen=True)
class PWCNetConfig:
    pyramid_channels: Tuple[int, ...] = (16, 32, 64, 96, 128, 196)
    # convs per pyramid level: 3 for 'Basic' (PWC-Net), 2 for 'Small'
    # (IRR-PWC) — mmflow PWCNetEncoder net_type
    encoder_num_convs: int = 3
    densefeat_channels: Tuple[int, ...] = (128, 128, 96, 64, 32)
    max_displacement: int = 4
    flow_div: float = 20.0
    flow_levels: Tuple[int, ...] = (2, 3, 4, 5, 6)
    context_channels: Tuple[int, ...] = (128, 128, 128, 96, 64, 32)
    context_dilations: Tuple[int, ...] = (1, 2, 4, 8, 16, 1)
    dtype: jnp.dtype = jnp.float32


class PWCNetEncoder(nn.Module):
    """6-level feature pyramid; returns {level: (B, H/2^l, W/2^l, C_l)}."""

    config: PWCNetConfig = PWCNetConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[int, jnp.ndarray]:
        cfg = self.config
        feats: Dict[int, jnp.ndarray] = {}
        for lvl, ch in enumerate(cfg.pyramid_channels, start=1):
            for j in range(cfg.encoder_num_convs):
                x = nn.Conv(
                    ch, (3, 3), strides=(2, 2) if j == 0 else (1, 1),
                    padding=1, dtype=cfg.dtype,
                    name=f"level{lvl}_conv{j}",
                )(x)
                x = _leaky(x)
            feats[lvl] = x
        return feats


class PWCModule(nn.Module):
    """Dense block + flow head + up layers (pwcnet_decoder.py:16-88)."""

    up_flow: bool = True
    densefeat_channels: Tuple[int, ...] = (128, 128, 96, 64, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        # dense connectivity: out = concat(conv(x), x)
        for i, ch in enumerate(self.densefeat_channels):
            y = _leaky(
                nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                        name=f"dense{i}")(x)
            )
            x = jnp.concatenate([y, x], axis=-1)
        feat = x
        flow = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype,
                       name="predict")(feat)
        upflow = upfeat = None
        if self.up_flow:
            # torch ConvTranspose2d(k4, s2, p1): VALID transpose (2H+2) then
            # crop p=1 from each side → exactly 2H
            def up(name, src, features):
                y = nn.ConvTranspose(
                    features, (4, 4), strides=(2, 2), padding="VALID",
                    transpose_kernel=True, dtype=self.dtype, name=name,
                )(src)
                return y[:, 1:-1, 1:-1, :]

            upflow = up("upflow", flow, 2)
            upfeat = up("upfeat", feat, 2)
        return flow, feat, upflow, upfeat


class ContextNet(nn.Module):
    """Dilated refinement (context_net.py:13-80); out_channels 2 for flow,
    1 for the IRR-PWC occlusion post-processor."""

    feat_channels: Tuple[int, ...] = (128, 128, 128, 96, 64, 32)
    dilations: Tuple[int, ...] = (1, 2, 4, 8, 16, 1)
    out_channels: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, (ch, dil) in enumerate(zip(self.feat_channels,
                                          self.dilations)):
            x = _leaky(
                nn.Conv(ch, (3, 3), padding=dil, kernel_dilation=(dil, dil),
                        dtype=self.dtype, name=f"conv{i}")(x)
            )
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="predict")(x)


class PWCNet(nn.Module):
    """Full estimator. ``__call__(img1, img2)`` (normalised NHWC) →
    dict level→flow (training) or the upsampled full-res flow in pixels
    (``inference=True``)."""

    config: PWCNetConfig = PWCNetConfig()

    @nn.compact
    def __call__(
        self,
        img1: jnp.ndarray,
        img2: jnp.ndarray,
        inference: bool = False,
    ):
        cfg = self.config
        encoder = PWCNetEncoder(cfg, name="encoder")
        feat1 = encoder(img1)
        feat2 = encoder(img2)

        flow_pred: Dict[int, jnp.ndarray] = {}
        upflow = upfeat = None
        last_feat = None
        levels = sorted(cfg.flow_levels, reverse=True)  # coarse → fine
        for level in levels:
            f1, f2 = feat1[level], feat2[level]
            if level == levels[0]:
                corr = _leaky(
                    local_correlation(f1, f2, cfg.max_displacement)
                )
                x = corr
            else:
                multiplier = cfg.flow_div * 2.0 ** (-level)
                warped = flow_warp(f2, upflow * multiplier)
                corr = _leaky(
                    local_correlation(f1, warped, cfg.max_displacement)
                )
                x = jnp.concatenate([corr, f1, upflow, upfeat], axis=-1)
            flow, last_feat, upflow, upfeat = PWCModule(
                up_flow=(level != levels[-1]),
                densefeat_channels=cfg.densefeat_channels, dtype=cfg.dtype,
                name=f"decoder_level{level}",
            )(x)
            flow_pred[level] = flow

        post = ContextNet(cfg.context_channels, cfg.context_dilations,
                          dtype=cfg.dtype, name="post_processor")(last_feat)
        flow_pred[levels[-1]] = flow_pred[levels[-1]] + post

        if inference:
            H, W = img1.shape[1:3]
            fine = flow_pred[levels[-1]]
            out = jax.image.resize(
                fine, (fine.shape[0], H, W, 2), method="bilinear"
            )
            return out * cfg.flow_div
        return {f"level{k}": v for k, v in flow_pred.items()}
