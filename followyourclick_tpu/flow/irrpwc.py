"""IRR-PWC estimator: iterative residual refinement with weight sharing,
bidirectional flow + occlusion.

Behavior spec: reference ``mmflow/configs/_base_/models/irrpwc.py`` and
``mmflow/mmflow/models/decoders/irrpwc_decoder.py`` / ``irr_refine.py`` —
PWC 'Small' pyramid (2 convs/level), per-level ``IRRCorrBlock`` (:17-100:
bidirectional warped correlations, scaled by channel count, plus a shared
1x1 reduction of every level to 32ch so ONE flow decoder and ONE occlusion
decoder are weight-shared across all levels), dense residual decoders
(:102-189), shared ContextNet post-processors, feature-driven local-conv
bilateral refinement (``FlowRefine``/``OccRefine``, irr_refine.py:15-253:
softmax(-k²) kernels applied to replicate-padded unfolded maps), and
``OccShuffleUpsample`` for the two finest levels (:255-373).

Flow bookkeeping matches the reference: internal flows live at each level's
pixel scale; emitted predictions are rescaled to image scale and divided by
``flow_div`` (_scale_flow_as_gt :545-566), so the MultiLevelEPE loss consumes
them directly with its gt/flow_div convention.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from followyourclick_tpu.flow.ops import flow_warp, local_correlation
from followyourclick_tpu.flow.pwcnet import ContextNet, PWCNetConfig, PWCNetEncoder


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


def _resize(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), "bilinear")


def _scale_flow(flow, h, w):
    """_scale_flow (:526-543): rescale values by the size ratio, resize."""
    h0, w0 = flow.shape[1:3]
    flow = flow * jnp.asarray([w / w0, h / h0], flow.dtype)
    return _resize(flow, h, w)


def _unfold3x3_replicate(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 1) → (B, H, W, 9) replicate-padded 3x3 neighbourhoods."""
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    H, W = x.shape[1:3]
    taps = [p[:, dy : dy + H, dx : dx + W, 0] for dy in range(3)
            for dx in range(3)]
    return jnp.stack(taps, axis=-1)


class IRRDenseDecoder(nn.Module):
    """Shared dense decoder + predict head (IRRFlowDecoder/IRROccDecoder,
    irrpwc_decoder.py:102-189)."""

    out_channels: int
    densefeat_channels: Tuple[int, ...] = (128, 128, 96, 64, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, ch in enumerate(self.densefeat_channels):
            y = _leaky(nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                               name=f"dense{i}")(x))
            x = jnp.concatenate([y, x], axis=-1)
        pred = nn.Conv(self.out_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="predict")(x)
        return x, pred


class LocalConvRefine(nn.Module):
    """Feature-driven local convolution (FlowRefine/OccRefine core): convs →
    3x3 kernel logits → softmax(-k²) → apply to unfolded target maps."""

    feat_channels: Tuple[int, ...] = (128, 128, 64, 64, 32, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, targets: jnp.ndarray):
        """targets: (B, H, W, C_t) maps to smooth with the learned kernels."""
        for i, ch in enumerate(self.feat_channels):
            feat = _leaky(nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                                  name=f"conv{i}")(feat))
        k = _leaky(nn.Conv(9, (3, 3), padding=1, dtype=self.dtype,
                           name="kernel")(feat))
        k = jax.nn.softmax(-(k.astype(jnp.float32) ** 2), axis=-1)
        outs = []
        for c in range(targets.shape[-1]):
            unf = _unfold3x3_replicate(targets[..., c : c + 1])
            outs.append(jnp.sum(k * unf, axis=-1))
        return jnp.stack(outs, axis=-1).astype(targets.dtype)


class OccShuffleUpsample(nn.Module):
    """Occlusion upsampling refiner for the finest levels
    (irr_refine.py:255-373)."""

    feat_channels: int = 32
    infeat_channels: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, occ, feat1, feat2, flow_f, flow_b, flow_div,
                 H_img, W_img):
        feat2_warp = flow_warp(feat2, flow_f)
        h0, w0 = flow_f.shape[1:3]
        scale = jnp.asarray([W_img / w0, H_img / h0], flow_f.dtype) / flow_div
        flow_b_warp = flow_warp(flow_b * scale, flow_f)
        if feat1.shape[-1] > 3:
            proj = nn.Conv(3, (1, 1), dtype=self.dtype, name="conv_1x1")
            feat1 = _leaky(proj(feat1))
            feat2_warp = _leaky(proj(feat2_warp))
        x = jnp.concatenate(
            [occ, feat1, feat2_warp, flow_f * scale, flow_b_warp], axis=-1)
        feat_init = _leaky(nn.Conv(self.feat_channels, (3, 3), padding=1,
                                   dtype=self.dtype, name="init_conv")(x))
        res_conv = nn.Conv(self.feat_channels, (3, 3), padding=1,
                           dtype=self.dtype, name="res_conv")
        feat_res = feat_init
        for _ in range(3):
            feat_res = feat_res + res_conv(feat_res) * 0.1
        feat_init = feat_init + _leaky(
            nn.Conv(self.feat_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="res_end_conv")(feat_res))
        out = _leaky(nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                             name="out_conv")(feat_init))
        return out + occ


@dataclasses.dataclass(frozen=True)
class IRRPWCConfig:
    pyramid_channels: Tuple[int, ...] = (16, 32, 64, 96, 128, 196)
    corr_feat_channels: int = 32
    densefeat_channels: Tuple[int, ...] = (128, 128, 96, 64, 32)
    refine_channels: Tuple[int, ...] = (128, 128, 64, 64, 32, 32)
    max_displacement: int = 4
    flow_div: float = 20.0
    dtype: jnp.dtype = jnp.float32


class IRRPWC(nn.Module):
    """Bidirectional flow + occlusion, levels 6→0, shared decoders."""

    config: IRRPWCConfig = IRRPWCConfig()

    @nn.compact
    def __call__(self, img1, img2, inference: bool = False):
        cfg = self.config
        encoder = PWCNetEncoder(
            PWCNetConfig(pyramid_channels=cfg.pyramid_channels,
                         encoder_num_convs=2, dtype=cfg.dtype),
            name="encoder")
        feat1 = encoder(img1)
        feat2 = encoder(img2)
        feat1[0], feat2[0] = img1, img2
        H_img, W_img = img1.shape[1:3]

        # SHARED (weight-tied) modules across levels — the "IRR" in IRR-PWC
        flow_dec = IRRDenseDecoder(2, cfg.densefeat_channels, cfg.dtype,
                                   name="flow_decoders")
        occ_dec = IRRDenseDecoder(1, cfg.densefeat_channels, cfg.dtype,
                                  name="occ_decoders")
        flow_post = ContextNet(dtype=cfg.dtype, name="flow_post_processor")
        occ_post = ContextNet(out_channels=1, dtype=cfg.dtype,
                              name="occ_post_processor")
        flow_refine = LocalConvRefine(cfg.refine_channels, cfg.dtype,
                                      name="flow_refine")
        occ_refine = LocalConvRefine(cfg.refine_channels, cfg.dtype,
                                     name="occ_refine")
        occ_up = OccShuffleUpsample(dtype=cfg.dtype,
                                    name="occ_shuffle_upsample")

        def corr_block(level, f1, f2, flow_f, flow_b):
            if flow_f is None:
                f1w, f2w = f1, f2
            else:
                f1w = flow_warp(f1, flow_b)
                f2w = flow_warp(f2, flow_f)
            corr_f = _leaky(local_correlation(f1, f2w, cfg.max_displacement,
                                              scaled=True))
            corr_b = _leaky(local_correlation(f2, f1w, cfg.max_displacement,
                                              scaled=True))
            if f1.shape[-1] != cfg.corr_feat_channels:
                proj = nn.Conv(cfg.corr_feat_channels, (1, 1),
                               dtype=cfg.dtype, name=f"conv1x1_level{level}")
                f1 = _leaky(proj(f1))
                f2 = _leaky(proj(f2))
            return corr_f, f1, corr_b, f2

        def as_gt(flow):
            h0, w0 = flow.shape[1:3]
            return flow * jnp.asarray(
                [W_img / w0, H_img / h0], flow.dtype) / cfg.flow_div

        flow_preds: Dict[str, Dict[str, List[jnp.ndarray]]] = {
            "flow_fw": {}, "flow_bw": {}}
        occ_preds: Dict[str, Dict[str, List[jnp.ndarray]]] = {
            "occ_fw": {}, "occ_bw": {}}

        flow_fw = flow_bw = occ_fw = occ_bw = None
        for level in [6, 5, 4, 3, 2, 1, 0]:
            f1, f2 = feat1[level], feat2[level]
            h, w = f1.shape[1:3]
            if level == 6:
                B = f1.shape[0]
                flow_fw = jnp.zeros((B, h, w, 2), f1.dtype)
                flow_bw = jnp.zeros((B, h, w, 2), f1.dtype)
                occ_fw = jnp.zeros((B, h, w, 1), f1.dtype)
                occ_bw = jnp.zeros((B, h, w, 1), f1.dtype)
            else:
                flow_fw = _scale_flow(flow_fw, h, w)
                flow_bw = _scale_flow(flow_bw, h, w)
                if level > 1:
                    occ_fw = _resize(occ_fw, h, w)
                    occ_bw = _resize(occ_bw, h, w)

            if level <= 1:  # occ_refined_levels = ['level0', 'level1']
                flow_preds["flow_fw"][f"level{level}"] = [as_gt(flow_fw)]
                flow_preds["flow_bw"][f"level{level}"] = [as_gt(flow_bw)]
                occ_fw = jax.image.resize(
                    occ_fw, (occ_fw.shape[0], h, w, 1), "nearest")
                occ_bw = jax.image.resize(
                    occ_bw, (occ_bw.shape[0], h, w, 1), "nearest")
                occ_fw = occ_up(occ_fw, f1, f2, flow_fw, flow_bw,
                                cfg.flow_div, H_img, W_img)
                occ_bw = occ_up(occ_bw, f2, f1, flow_bw, flow_fw,
                                cfg.flow_div, H_img, W_img)
                occ_preds["occ_fw"][f"level{level}"] = [occ_fw]
                occ_preds["occ_bw"][f"level{level}"] = [occ_bw]
                continue

            corr_f, f1r, corr_b, f2r = corr_block(level, f1, f2,
                                                  None if level == 6 else flow_fw,
                                                  None if level == 6 else flow_bw)
            feat_f, res_f = flow_dec(
                jnp.concatenate([corr_f, f1r, flow_fw], axis=-1))
            feat_b, res_b = flow_dec(
                jnp.concatenate([corr_b, f2r, flow_bw], axis=-1))
            flow_fw = flow_fw + res_f
            flow_bw = flow_bw + res_b
            flow_fw = flow_fw + flow_post(
                jnp.concatenate([feat_f, flow_fw], axis=-1))
            flow_bw = flow_bw + flow_post(
                jnp.concatenate([feat_b, flow_bw], axis=-1))

            feat_of, ores_f = occ_dec(
                jnp.concatenate([corr_f, f1r, occ_fw], axis=-1))
            feat_ob, ores_b = occ_dec(
                jnp.concatenate([corr_b, f2r, occ_bw], axis=-1))
            occ_fw = occ_fw + ores_f
            occ_bw = occ_bw + ores_b
            occ_fw = occ_fw + occ_post(
                jnp.concatenate([feat_of, occ_fw], axis=-1))
            occ_bw = occ_bw + occ_post(
                jnp.concatenate([feat_ob, occ_bw], axis=-1))

            # bilateral refinement (detached flows, irrpwc_decoder.py:489-506)
            s_img1 = _resize(img1, h, w)
            s_img2 = _resize(img2, h, w)

            def refine_flow(a_img, b_img, fr, flow):
                flow = jax.lax.stop_gradient(flow)
                warp = flow_warp(b_img, flow)
                diff = jnp.sqrt(jnp.sum((a_img - warp) ** 2, axis=-1,
                                        keepdims=True))
                nomean = flow - flow.mean(axis=(1, 2), keepdims=True)
                feat = jnp.concatenate([nomean, diff, fr], axis=-1)
                return flow_refine(feat, flow)

            flow_ref_f = refine_flow(s_img1, s_img2, f1r, flow_fw)
            flow_ref_b = refine_flow(s_img2, s_img1, f2r, flow_bw)

            def refine_occ(fa, fb, occ, flow):
                occ = jax.lax.stop_gradient(occ)
                diff = fa - flow_warp(fb, flow)
                feat = jnp.concatenate([occ, fa, diff], axis=-1)
                return occ_refine(feat, occ)

            occ_ref_f = refine_occ(f1r, f2r, occ_fw, flow_ref_f)
            occ_ref_b = refine_occ(f2r, f1r, occ_bw, flow_ref_b)

            flow_preds["flow_fw"][f"level{level}"] = [as_gt(flow_fw),
                                                      as_gt(flow_ref_f)]
            flow_preds["flow_bw"][f"level{level}"] = [as_gt(flow_bw),
                                                      as_gt(flow_ref_b)]
            occ_preds["occ_fw"][f"level{level}"] = [occ_fw, occ_ref_f]
            occ_preds["occ_bw"][f"level{level}"] = [occ_bw, occ_ref_b]

            flow_fw, flow_bw = flow_ref_f, flow_ref_b
            occ_fw, occ_bw = occ_ref_f, occ_ref_b

        if inference:
            fine = flow_preds["flow_fw"]["level0"][0]
            out = _resize(fine, H_img, W_img)
            return out * cfg.flow_div
        return flow_preds, occ_preds
