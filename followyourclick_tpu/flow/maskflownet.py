"""MaskFlowNetS estimator (stage 1 of MaskFlowNet), TPU-native.

Behavior spec: reference ``mmflow/configs/_base_/models/maskflownets.py`` and
``mmflow/mmflow/models/decoders/maskflownet_decoder.py`` — PWC pyramid
encoder, per-level asymmetric occlusion-masked feature matching (AsymOFMM):
a deformable warp of feat2 by the upsampled flow, gated by a learned
occlusion mask and blended with a trade-off conv of the upsampled feature
(:87-146), correlation with feat1, dense decoder modules that predict flow
residuals AND occlusion masks (:236-303), the replicate-pad align-corners
2x upsampler (:17-36), and a dilated ContextNet refinement.

TPU-first notes:
- The reference's ``mmcv.ops.DeformConv2d`` is called with the SAME offset
  for all 9 kernel taps (the flow repeated 9x, :76-79) — by linearity of
  bilinear sampling that is exactly ``conv3x3(bilinear_warp(feat, offset))``,
  so no deformable-conv kernel is needed; the warp is the shared gather op.
- The reference keeps its internal flow in DCN (y, x) order and flips
  channels at the output (:456-457); here the internal flow is (x, y)
  end-to-end and no flip exists — equivalent up to a permutation of the
  flow-head weights.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from followyourclick_tpu.flow.ops import flow_warp, local_correlation
from followyourclick_tpu.flow.pwcnet import ContextNet, PWCNetEncoder, PWCNetConfig


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


def upsample2_align_corners(img: jnp.ndarray) -> jnp.ndarray:
    """The MaskFlowNet 2x upsampler (maskflownet_decoder.py:17-36):
    replicate-pad right/bottom, bilinear align-corners to (2H+1, 2W+1), crop
    the last row/col. With the padded size the align-corners grid lands on
    exact half-integers, so it reduces to interleaving originals with
    neighbour averages — implemented separably with no gather."""
    B, H, W, C = img.shape
    x = jnp.concatenate([img, img[:, -1:]], axis=1)          # (B, H+1, W, C)
    rows_even = x[:, :-1]
    rows_odd = 0.5 * (x[:, :-1] + x[:, 1:])
    rows = jnp.stack([rows_even, rows_odd], axis=2).reshape(B, 2 * H, W, C)
    y = jnp.concatenate([rows, rows[:, :, -1:]], axis=2)     # (B, 2H, W+1, C)
    cols_even = y[:, :, :-1]
    cols_odd = 0.5 * (y[:, :, :-1] + y[:, :, 1:])
    out = jnp.stack([cols_even, cols_odd], axis=3).reshape(B, 2 * H, 2 * W, C)
    return out


class DeformWarpBlock(nn.Module):
    """AsymOFMM warp (maskflownet_decoder.py:87-146): conv3x3 over the
    flow-warped feature (uniform-offset DCN), broadcast bias, sigmoid
    occlusion gate, plus a trade-off conv of the upsampled feature."""

    channels: int
    with_tradeoff: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat2, flow, mask_feat=None, up_feat=None):
        warped = flow_warp(feat2, flow)
        deform = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                         dtype=self.dtype, name="deconv")(warped)
        bias = self.param("deconv_bias", nn.initializers.zeros,
                          (self.channels,))
        deform = deform + bias
        if not self.with_tradeoff:
            return _leaky(deform)
        tradeoff = nn.Conv(self.channels, (3, 3), padding=1,
                           dtype=self.dtype, name="tradeoff_conv")(up_feat)
        gate = nn.sigmoid(mask_feat)  # (B, H, W, 1)
        return _leaky(deform * gate + tradeoff)


class MaskModule(nn.Module):
    """Dense block + flow residual head + occlusion mask head + up layers
    (maskflownet_decoder.py:236-303)."""

    up_flow: bool
    with_mask: bool
    up_channels: Optional[int] = 16
    densefeat_channels: Tuple[int, ...] = (128, 128, 96, 64, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, upflow):
        for i, ch in enumerate(self.densefeat_channels):
            y = _leaky(nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                               name=f"dense{i}")(x))
            x = jnp.concatenate([y, x], axis=-1)
        feat = x
        flow = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype,
                       name="predict_flow")(feat) + upflow
        mask = new_upflow = upmask = upfeat = None
        if self.with_mask:
            mask = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                           name="predict_mask")(feat)
            if self.up_flow:
                upmask = upsample2_align_corners(mask)
        if self.up_flow:
            new_upflow = upsample2_align_corners(flow)
            up = nn.ConvTranspose(self.up_channels, (4, 4), strides=(2, 2),
                                  padding="VALID", transpose_kernel=True,
                                  dtype=self.dtype, name="upfeat")(feat)
            upfeat = _leaky(up[:, 1:-1, 1:-1, :])
        return flow, mask, feat, new_upflow, upmask, upfeat


@dataclasses.dataclass(frozen=True)
class MaskFlowNetSConfig:
    pyramid_channels: Tuple[int, ...] = (16, 32, 64, 96, 128, 196)
    densefeat_channels: Tuple[int, ...] = (128, 128, 96, 64, 32)
    max_displacement: int = 4
    flow_div: float = 20.0
    up_channels: int = 16
    context_channels: Tuple[int, ...] = (128, 128, 128, 96, 64, 32)
    context_dilations: Tuple[int, ...] = (1, 2, 4, 8, 16, 1)
    dtype: jnp.dtype = jnp.float32


class MaskFlowNetS(nn.Module):
    """Stage-1 MaskFlowNet: flow + learned occlusion masks, coarse-to-fine
    level6→level2 (maskflownet_decoder.py:410-467)."""

    config: MaskFlowNetSConfig = MaskFlowNetSConfig()

    @nn.compact
    def __call__(self, img1, img2, inference: bool = False,
                 return_mask: bool = False, return_features: bool = False):
        cfg = self.config
        encoder = PWCNetEncoder(
            PWCNetConfig(pyramid_channels=cfg.pyramid_channels,
                         dtype=cfg.dtype), name="encoder")
        feat1 = encoder(img1)
        feat2 = encoder(img2)

        levels = [6, 5, 4, 3, 2]
        warp_channels = {5: 128, 4: 96, 3: 64, 2: 32}
        flow_pred: Dict[int, jnp.ndarray] = {}
        upflow = upmask = upfeat = None
        last_feat = None
        last_mask = None
        for level in levels:
            f1, f2 = feat1[level], feat2[level]
            if level == levels[0]:
                corr = _leaky(local_correlation(f1, f2,
                                                cfg.max_displacement))
                x = corr
                upflow0 = jnp.zeros(f1.shape[:3] + (2,), f1.dtype)
            else:
                multiplier = cfg.flow_div * 2.0 ** (-level)
                warped = DeformWarpBlock(
                    warp_channels[level], dtype=cfg.dtype,
                    name=f"warp_level{level}",
                )(f2, upflow * multiplier, upmask, upfeat)
                corr = _leaky(local_correlation(f1, warped,
                                                cfg.max_displacement))
                x = jnp.concatenate([corr, f1, upfeat, upflow], axis=-1)
                upflow0 = upflow
            flow, mask, last_feat, upflow, upmask, upfeat = MaskModule(
                up_flow=(level != levels[-1]),
                with_mask=(level != levels[-1]),
                up_channels=cfg.up_channels,
                densefeat_channels=cfg.densefeat_channels,
                dtype=cfg.dtype, name=f"decoder_level{level}",
            )(x, upflow0)
            if level == 3:
                # the level-3 upsampled mask seeds MaskFlowNet stage 2
                last_mask = upmask
            flow_pred[level] = flow

        post = ContextNet(cfg.context_channels, cfg.context_dilations,
                          dtype=cfg.dtype, name="post_processor")(last_feat)
        flow_pred[levels[-1]] = flow_pred[levels[-1]] + post

        preds = {f"level{k}": v for k, v in flow_pred.items()}
        if return_features:
            full_mask = upsample2_align_corners(
                upsample2_align_corners(last_mask))
            return flow_pred, full_mask, feat1, feat2
        if inference:
            H, W = img1.shape[1:3]
            fine = preds["level2"]
            out = jax.image.resize(fine, (fine.shape[0], H, W, 2),
                                   method="bilinear") * cfg.flow_div
            if return_mask:
                return out, upsample2_align_corners(
                    upsample2_align_corners(last_mask))
            return out
        if return_mask:
            return preds, upsample2_align_corners(
                upsample2_align_corners(last_mask))
        return preds


class MaskFlowNet(nn.Module):
    """Full two-stage MaskFlowNet (flow_estimators/maskflownet.py:57-153 +
    MaskFlowNetDecoder, maskflownet_decoder.py:470-627).

    Stage 1 (MaskFlowNetS) produces per-level flows and the learned
    image-resolution occlusion mask; stage 2 re-encodes 4-channel inputs —
    img1 ⧺ zeros and warp(img2, flow_div · 4x-upsampled stage-1 level-2
    flow) ⧺ mask — through its own PWC pyramid, and refines per level with
    DUAL d=2 correlations (a basic deform-warp of the stage-1 features by
    the running flow, plus a plain stage-2 correlation), maskless decoder
    modules with flow residuals, and a ContextNet."""

    config: MaskFlowNetSConfig = MaskFlowNetSConfig()

    @nn.compact
    def __call__(self, img1, img2, inference: bool = False):
        cfg = self.config
        stage1 = MaskFlowNetS(cfg, name="maskflownetS")
        flows1, mask1, feat1, feat2 = stage1(img1, img2,
                                             return_features=True)

        # stage-2 inputs (maskflownet.py:87-101)
        up_flow_full = jax.image.resize(
            flows1[2], (img1.shape[0],) + img1.shape[1:3] + (2,),
            "bilinear") * cfg.flow_div
        img1_in = jnp.concatenate([img1, jnp.zeros_like(mask1)], axis=-1)
        warped2 = flow_warp(img2, up_flow_full)
        img2_in = jnp.concatenate([warped2, mask1], axis=-1)

        encoder2 = PWCNetEncoder(
            PWCNetConfig(pyramid_channels=cfg.pyramid_channels,
                         dtype=cfg.dtype), name="encoder")
        feat3 = encoder2(img1_in)
        feat4 = encoder2(img2_in)

        d2 = 2  # stage-2 correlation displacement (maskflownet.py config)
        levels = [6, 5, 4, 3, 2]
        flow_pred = {}
        upflow = upfeat = None
        last_feat = None
        for level in levels:
            multiplier = cfg.flow_div * 2.0 ** (-level)
            i_flow = flows1[level]
            if level == levels[0]:
                upflow = i_flow
            # basic deform warp of the STAGE-1 features by the running flow
            warped1 = DeformWarpBlock(
                feat2[level].shape[-1], with_tradeoff=False, dtype=cfg.dtype,
                name=f"warp_level{level}",
            )(feat2[level], upflow * multiplier)
            corr1 = _leaky(local_correlation(feat1[level], warped1, d2))
            corr2 = _leaky(local_correlation(feat3[level], feat4[level], d2))
            corr = jnp.concatenate([corr1, corr2], axis=-1)  # 50ch

            if upfeat is None:
                x = jnp.concatenate([corr, upflow], axis=-1)        # 52
            else:
                x = jnp.concatenate(
                    [feat1[level], upfeat, corr, upflow, i_flow], axis=-1)
            flow, _, last_feat, upflow, _, upfeat = MaskModule(
                up_flow=(level != levels[-1]),
                with_mask=False,
                up_channels=cfg.up_channels,
                densefeat_channels=cfg.densefeat_channels,
                dtype=cfg.dtype, name=f"decoder_level{level}",
            )(x, upflow)
            flow_pred[level] = flow

        post = ContextNet(cfg.context_channels, cfg.context_dilations,
                          dtype=cfg.dtype, name="post_processor")(last_feat)
        flow_pred[levels[-1]] = flow_pred[levels[-1]] + post

        preds = {f"level{k}": v for k, v in flow_pred.items()}
        if inference:
            H, W = img1.shape[1:3]
            fine = preds["level2"]
            return jax.image.resize(
                fine, (fine.shape[0], H, W, 2), "bilinear") * cfg.flow_div
        return preds
