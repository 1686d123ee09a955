"""LiteFlowNet estimator (NetC + NetE), TPU-native.

Behavior spec: reference
``mmflow/configs/_base_/models/liteflownet/liteflownet.py`` and
``mmflow/mmflow/models/`` — ``NetC`` pyramid encoder
(encoders/liteflownet_encoder.py: channels (32,32,64,96,128,192), strides
(1,2,2,2,2,2), convs per level (1,3,2,2,1,1), first kernel 7) and ``NetE``
(decoders/liteflownet_decoder.py): per level, cascaded
- ``MatchingBlock`` (:117-188): correlation d=3 (levels 2-3 at stride 2 /
  dilation 2 with a fixed-bilinear 2x upsample of the 49-channel volume)
  → convs (128,64,32) → flow residual;
- ``SubpixelBlock`` (:190-231): cat(feat1, warped feat2, flow) →
  convs (128,64,32) → subpixel residual;
- ``RegularizationBlock`` (:233-314): feature-driven distance kernels
  (softmax(-d²), patch 7/5/5/3/3, separable (p,1)(1,p) head when p>3)
  applied as a local convolution over zero-padded unfolded flow maps;
- a fixed (non-learned) caffe-bilinear-filter 2x flow upsampler between
  levels (:18-66), with flow values scaled at WARP time by
  ``flow_div·2^(1-level)`` (NetE multiplier, :437-439).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from followyourclick_tpu.flow.ops import flow_warp, local_correlation


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


def _up2(x: jnp.ndarray) -> jnp.ndarray:
    """Fixed bilinear 2x upsampler (the caffe BilinearFilter
    conv-transpose, liteflownet_decoder.py:18-66) — no value scaling."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), "bilinear")


def _unfold(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, H, W, 1) → (B, H, W, patch²) zero-padded neighbourhoods
    (F.unfold with padding=patch//2, RegularizationBlock :296-305)."""
    p = patch // 2
    padded = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    H, W = x.shape[1:3]
    taps = [padded[:, dy : dy + H, dx : dx + W, 0]
            for dy in range(patch) for dx in range(patch)]
    return jnp.stack(taps, axis=-1)


class NetC(nn.Module):
    """LiteFlowNet pyramid encoder."""

    out_channels: Tuple[int, ...] = (32, 32, 64, 96, 128, 192)
    strides: Tuple[int, ...] = (1, 2, 2, 2, 2, 2)
    num_convs: Tuple[int, ...] = (1, 3, 2, 2, 1, 1)
    kernel_sizes: Tuple[int, ...] = (7, 3, 3, 3, 3, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[int, jnp.ndarray]:
        feats = {}
        for i, (ch, stride, n, k) in enumerate(zip(
                self.out_channels, self.strides, self.num_convs,
                self.kernel_sizes)):
            for j in range(n):
                x = nn.Conv(ch, (k, k),
                            strides=(stride, stride) if j == 0 else (1, 1),
                            padding=k // 2, dtype=self.dtype,
                            name=f"level{i + 1}_conv{j}")(x)
                x = _leaky(x)
            feats[i + 1] = x
        return feats


class MatchingBlock(nn.Module):
    """Correlation → convs → flow residual (liteflownet_decoder.py:117-188)."""

    corr_stride: int = 1
    corr_dilation: int = 1
    patch_size: int = 3
    feat_channels: Tuple[int, ...] = (128, 64, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat1, feat2, upflow, multiplier):
        if upflow is None:
            warp_feat = feat2
            upflow = jnp.zeros(feat1.shape[:3] + (2,), feat1.dtype)
        else:
            warp_feat = flow_warp(feat2, upflow * multiplier)
        corr = _leaky(local_correlation(
            feat1, warp_feat, max_displacement=3,
            dilation_patch=self.corr_dilation, stride=self.corr_stride))
        if self.corr_stride > 1:
            corr = _up2(corr)
        x = corr
        for i, ch in enumerate(self.feat_channels):
            x = _leaky(nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                               name=f"conv{i}")(x))
        res = nn.Conv(2, (self.patch_size, self.patch_size),
                      padding=self.patch_size // 2, dtype=self.dtype,
                      name="pred_flow")(x)
        return upflow + res


class SubpixelBlock(nn.Module):
    """Subpixel refinement (liteflownet_decoder.py:190-231)."""

    patch_size: int = 3
    feat_channels: Tuple[int, ...] = (128, 64, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat1, feat2, flow, multiplier):
        warp_feat = flow_warp(feat2, flow * multiplier)
        x = jnp.concatenate([feat1, warp_feat, flow], axis=-1)
        for i, ch in enumerate(self.feat_channels):
            x = _leaky(nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                               name=f"conv{i}")(x))
        res = nn.Conv(2, (self.patch_size, self.patch_size),
                      padding=self.patch_size // 2, dtype=self.dtype,
                      name="pred_flow")(x)
        return flow + res


class RegularizationBlock(nn.Module):
    """Feature-driven local-convolution regularization
    (liteflownet_decoder.py:233-314)."""

    patch_size: int = 3
    feat_channels: Tuple[int, ...] = (128, 128, 64, 64, 32, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img1, img2, feat, flow, multiplier):
        warp_img2 = flow_warp(img2, flow * multiplier)
        diff = jnp.sqrt(jnp.sum((img1 - warp_img2) ** 2, axis=-1,
                                keepdims=True))
        nomean = flow - flow.mean(axis=(1, 2), keepdims=True)
        x = jnp.concatenate([diff, nomean, feat], axis=-1)
        for i, ch in enumerate(self.feat_channels):
            x = _leaky(nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                               name=f"conv{i}")(x))
        p = self.patch_size
        if p > 3:
            # separable distance head: (p,1) then (1,p) convs (:497-500)
            x = nn.Conv(p * p, (p, 1), padding=((p // 2, p // 2), (0, 0)),
                        dtype=self.dtype, name="dist0")(x)
            d = nn.Conv(p * p, (1, p), padding=((0, 0), (p // 2, p // 2)),
                        dtype=self.dtype, name="dist1")(x)
        else:
            d = nn.Conv(p * p, (p, p), padding=p // 2, dtype=self.dtype,
                        name="dist0")(x)
        k = jax.nn.softmax(-(d.astype(jnp.float32) ** 2), axis=-1)
        fx = jnp.sum(k * _unfold(flow[..., :1], p), axis=-1)
        fy = jnp.sum(k * _unfold(flow[..., 1:], p), axis=-1)
        return jnp.stack([fx, fy], axis=-1).astype(flow.dtype)


@dataclasses.dataclass(frozen=True)
class LiteFlowNetConfig:
    flow_div: float = 20.0
    feat_channels: int = 64
    regularized_flow: bool = True
    dtype: jnp.dtype = jnp.float32


_PATCH = {2: 7, 3: 5, 4: 5, 5: 3, 6: 3}
_CORR_STRIDE = {2: 2, 3: 2, 4: 1, 5: 1, 6: 1}


class LiteFlowNet(nn.Module):
    """Full NetC + NetE cascade, levels 6→2."""

    config: LiteFlowNetConfig = LiteFlowNetConfig()

    @nn.compact
    def __call__(self, img1, img2, inference: bool = False):
        cfg = self.config
        netc = NetC(dtype=cfg.dtype, name="encoder")
        feat1 = netc(img1)
        feat2 = netc(img2)

        flow_pred: Dict[int, jnp.ndarray] = {}
        upflow = None
        for level in [6, 5, 4, 3, 2]:
            raw1, raw2 = feat1[level], feat2[level]
            h, w = raw1.shape[1:3]
            multiplier = cfg.flow_div * 2.0 ** (1 - level)
            if raw1.shape[-1] < cfg.feat_channels:
                proj = nn.Conv(cfg.feat_channels, (1, 1), dtype=cfg.dtype,
                               name=f"feat_layer_level{level}")
                f1 = _leaky(proj(raw1))
                f2 = _leaky(proj(raw2))
            else:
                f1, f2 = raw1, raw2
            s_img1 = jax.image.resize(img1, (img1.shape[0], h, w, 3),
                                      "bilinear")
            s_img2 = jax.image.resize(img2, (img2.shape[0], h, w, 3),
                                      "bilinear")

            flow_m = MatchingBlock(
                corr_stride=_CORR_STRIDE[level],
                corr_dilation=_CORR_STRIDE[level],
                patch_size=_PATCH[level], dtype=cfg.dtype,
                name=f"NetM_level{level}",
            )(f1, f2, upflow, multiplier)
            flow_s = SubpixelBlock(
                patch_size=_PATCH[level], dtype=cfg.dtype,
                name=f"NetS_level{level}",
            )(f1, f2, flow_m, multiplier)

            if level == 2 and not cfg.regularized_flow:
                flow_pred[level] = flow_s
                upflow = _up2(flow_s)
                continue
            if raw1.shape[-1] < 128:
                rfeat = _leaky(nn.Conv(128, (1, 1), dtype=cfg.dtype,
                                       name=f"rfeat_layer_level{level}")(raw1))
            else:
                rfeat = raw1
            flow_r = RegularizationBlock(
                patch_size=_PATCH[level], dtype=cfg.dtype,
                name=f"NetR_level{level}",
            )(s_img1, s_img2, rfeat, flow_s, multiplier)
            flow_pred[level] = flow_r
            upflow = _up2(flow_r)

        if inference:
            H, W = img1.shape[1:3]
            fine = flow_pred[2]
            out = jax.image.resize(fine, (fine.shape[0], H, W, 2),
                                   "bilinear")
            return out * cfg.flow_div
        return {f"level{k}": v for k, v in flow_pred.items()}


def liteflownet_stage_load(params, src_level: int, dst_level: int):
    """Progressive stage training: initialize the newly-added pyramid level's
    decoder blocks from the previous stage's trained level (reference
    ``mmflow/core/hooks/liteflownet_stage_loading.py:8`` — a before-run hook
    calling non-strict ``load_state_dict`` between decoder sublevels).

    Pure-function JAX analogue: returns a new params tree with every
    ``*_level{src}`` subtree copied onto ``*_level{dst}`` leaf-by-leaf where
    shapes match (mismatched leaves keep their init, like the non-strict
    torch load)."""
    import jax as _jax

    out = _jax.tree_util.tree_map(lambda x: x, params)
    suffix_src = f"level{src_level}"
    suffix_dst = f"level{dst_level}"

    def overlay(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                if k in dst and isinstance(dst[k], dict):
                    overlay(dst[k], v)
            elif k in dst and getattr(dst[k], "shape", None) == getattr(
                    v, "shape", None):
                dst[k] = v

    for name in list(out):
        if name.endswith(suffix_src):
            dst_name = name[: -len(suffix_src)] + suffix_dst
            if dst_name in out:
                overlay(out[dst_name], out[name])
    return out
