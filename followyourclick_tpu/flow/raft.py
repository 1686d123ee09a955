"""RAFT optical-flow estimator, TPU-native.

Behavior spec: reference ``mmflow/mmflow/models/encoders/raft_encoder.py``
(stem 7x7/2 + 3 residual stages (64, 96, 128)@strides (1,2,2) + 1x1 out conv),
``mmflow/mmflow/models/decoders/raft_decoder.py`` (CorrelationPyramid :17,
MotionEncoder :59, ConvGRU :166, XHead :252, RAFTDecoder :300) and
``mmflow/mmflow/models/flow_estimators/raft.py`` (feature/context split,
tanh/relu activations :76-80). Config values from
``mmflow/configs/_base_/models/raft.py``: num_levels=4, radius=4,
h=cxt=128 channels, iters=12, SeqConv GRU, align_corners lookup.

TPU-first differences:
- NHWC everywhere; the all-pairs correlation is one MXU matmul
  (`flow.ops.correlation_pyramid`).
- The iterative update loop is a ``lax.scan`` carried over (flow, h) inside a
  single jit — the reference runs a Python loop with per-iteration device
  syncs.
- InstanceNorm for the feature encoder and (frozen, inference-style)
  BatchNorm for the context encoder are both expressed as GroupNorm-family
  normalisations over static shapes; BatchNorm keeps running stats in a
  ``batch_stats`` collection for training.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from followyourclick_tpu.flow.ops import (
    convex_upsample,
    corr_lookup,
    correlation_pyramid,
    upflow8,
)


@dataclasses.dataclass(frozen=True)
class RAFTConfig:
    """Mirror of the reference RAFT 'Basic' architecture config
    (mmflow/configs/_base_/models/raft.py)."""

    num_levels: int = 4
    radius: int = 4
    h_channels: int = 128
    cxt_channels: int = 128
    iters: int = 12
    stem_channels: int = 64
    base_channels: Tuple[int, ...] = (64, 96, 128)
    strides: Tuple[int, ...] = (1, 2, 2)
    feat_channels: int = 256
    mask_channels: int = 64
    # GMA (global motion aggregation) variant: content self-similarity
    # attention over the context features aggregates motion features
    # globally before the GRU (mmflow gma_decoder.py:56-205; configs/gma)
    use_gma: bool = False
    gma_heads: int = 1
    dtype: jnp.dtype = jnp.float32


class _Norm(nn.Module):
    """Normalisation selector: 'instance' (feature encoder, norm_cfg IN),
    'batch' (context encoder, norm_cfg SyncBN → plain BN per device on TPU;
    cross-device stat sync is a mesh ``psum`` when training data-parallel),
    or 'none'."""

    kind: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.kind == "instance":
            # InstanceNorm == GroupNorm with one channel per group, no
            # batch coupling — functional and shard-friendly.
            return nn.GroupNorm(
                num_groups=None, group_size=1, epsilon=1e-5, dtype=self.dtype
            )(x)
        if self.kind == "batch":
            # Under GSPMD data-parallel training the batch axis is sharded and
            # XLA computes global-mean semantics only if asked; per-device
            # stats (plain BN) match what MMDistributedDataParallel does for
            # non-Sync BN and are accurate enough for the context encoder.
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
            )(x)
        return x


class BasicBlock(nn.Module):
    """ResNet BasicBlock (mmcv ``BasicBlock`` used via make_res_layer,
    raft_encoder.py:270-273): conv3x3-norm-relu, conv3x3-norm, projection
    shortcut on stride/channel change, relu after the residual add."""

    planes: int
    stride: int = 1
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = _Norm(self.norm, self.dtype, name="norm1")(y, train)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(y)
        y = _Norm(self.norm, self.dtype, name="norm2")(y, train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = _Norm(self.norm, self.dtype, name="downsample_norm")(
                identity, train
            )
        return nn.relu(y + identity)


class RAFTEncoder(nn.Module):
    """Feature/context extraction at 1/8 resolution
    (raft_encoder.py:14-292, 'Basic')."""

    out_channels: int = 256
    norm: str = "instance"
    stem_channels: int = 64
    base_channels: Tuple[int, ...] = (64, 96, 128)
    strides: Tuple[int, ...] = (1, 2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            self.stem_channels, (7, 7), strides=(2, 2), padding=3,
            use_bias=True, dtype=self.dtype, name="conv1",
        )(x)
        x = _Norm(self.norm, self.dtype, name="norm1")(x, train)
        x = nn.relu(x)
        for i, (planes, stride) in enumerate(
            zip(self.base_channels, self.strides)
        ):
            x = BasicBlock(
                planes, stride, self.norm, self.dtype,
                name=f"layer{i + 1}_0",
            )(x, train)
            x = BasicBlock(
                planes, 1, self.norm, self.dtype, name=f"layer{i + 1}_1"
            )(x, train)
        return nn.Conv(
            self.out_channels, (1, 1), use_bias=True, dtype=self.dtype,
            name="conv2",
        )(x)


class MotionEncoder(nn.Module):
    """corr/flow feature fusion (raft_decoder.py:59-164, 'Basic'):
    corr_net 1x1→256, 3x3→192; flow_net 7x7→128, 3x3→64;
    out_net 3x3→126; output = concat(out, flow) → 128ch."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, corr: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
        c = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype, name="corr_conv1")(corr))
        c = nn.relu(nn.Conv(192, (3, 3), padding=1, dtype=self.dtype, name="corr_conv2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=3, dtype=self.dtype, name="flow_conv1")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=1, dtype=self.dtype, name="flow_conv2")(f))
        out = nn.relu(
            nn.Conv(126, (3, 3), padding=1, dtype=self.dtype, name="out_conv")(
                jnp.concatenate([c, f], axis=-1)
            )
        )
        return jnp.concatenate([out, flow], axis=-1)


class ConvGRU(nn.Module):
    """Separable-conv GRU cell, 'SeqConv' type (raft_decoder.py:166-250):
    two sequential GRU passes with (1,5) then (5,1) kernels."""

    h_channels: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        for i, (kern, pad) in enumerate([((1, 5), (0, 2)), ((5, 1), (2, 0))]):
            padding = ((pad[0], pad[0]), (pad[1], pad[1]))

            def conv(name, inp):
                return nn.Conv(
                    self.h_channels, kern, padding=padding,
                    dtype=self.dtype, name=f"{name}{i}",
                )(inp)

            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(conv("conv_z", hx))
            r = nn.sigmoid(conv("conv_r", hx))
            q = nn.tanh(conv("conv_q", jnp.concatenate([r * h, x], axis=-1)))
            h = (1 - z) * h + z * q
        return h


class GMAAttention(nn.Module):
    """Content-only self-similarity attention over context features
    (gma_decoder.py Attention :56-144, position_only=False,
    max_pos_size=None — the published GMA config)."""

    heads: int = 1
    head_channels: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cxt: jnp.ndarray) -> jnp.ndarray:
        B, H, W, _ = cxt.shape
        qk = nn.Conv(2 * self.heads * self.head_channels, (1, 1),
                     dtype=self.dtype, name="to_qk")(cxt)
        q, k = jnp.split(qk, 2, axis=-1)

        def heads_of(t):
            return t.reshape(B, H * W, self.heads, self.head_channels)

        q = heads_of(q) * self.head_channels**-0.5
        k = heads_of(k)
        sim = jnp.einsum("bxhc,byhc->bhxy", q, k,
                         preferred_element_type=jnp.float32)
        return jax.nn.softmax(sim, axis=-1)  # (B, heads, HW, HW)


class GMAAggregate(nn.Module):
    """Attention-weighted global aggregation of motion features with a
    zero-init residual gate (gma_decoder.py Aggregate :147-205)."""

    in_channels: int = 128
    heads: int = 1
    head_channels: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, attn: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, _ = x.shape
        v = nn.Conv(self.heads * self.head_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="to_v")(x)
        v = v.reshape(B, H * W, self.heads, self.head_channels)
        out = jnp.einsum("bhxy,byhc->bxhc", attn.astype(v.dtype), v)
        out = out.reshape(B, H, W, self.heads * self.head_channels)
        if self.heads * self.head_channels != self.in_channels:
            out = nn.Conv(self.in_channels, (1, 1), use_bias=False,
                          dtype=self.dtype, name="project")(out)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return x + gamma * out


class XHead(nn.Module):
    """Flow / upsample-mask prediction head (raft_decoder.py:252-297):
    conv3x3→feat_channels (ReLU), then predict conv (3x3 for flow,
    1x1 for mask)."""

    feat_channels: int
    x_channels: int
    kind: str  # 'flow' | 'mask'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(
            nn.Conv(
                self.feat_channels, (3, 3), padding=1, dtype=self.dtype,
                name="conv",
            )(x)
        )
        kern = (3, 3) if self.kind == "flow" else (1, 1)
        pad = 1 if self.kind == "flow" else 0
        return nn.Conv(
            self.x_channels, kern, padding=pad, dtype=self.dtype,
            name="predict",
        )(x)


class RAFTDecoder(nn.Module):
    """Iterative GRU update loop (raft_decoder.py:300-456) as a lax.scan."""

    config: RAFTConfig

    @nn.compact
    def __call__(
        self,
        feat1: jnp.ndarray,
        feat2: jnp.ndarray,
        flow: jnp.ndarray,
        h: jnp.ndarray,
        cxt_feat: jnp.ndarray,
        iters: Optional[int] = None,
        return_intermediate: bool = False,
    ):
        cfg = self.config
        iters = cfg.iters if iters is None else iters
        pyramid = correlation_pyramid(feat1, feat2, cfg.num_levels)


        encoder = MotionEncoder(dtype=cfg.dtype, name="encoder")
        gru = ConvGRU(cfg.h_channels, dtype=cfg.dtype, name="gru")
        if cfg.use_gma:
            attn_map = GMAAttention(cfg.gma_heads, cfg.cxt_channels,
                                    cfg.dtype, name="attn")(cxt_feat)
            aggregator = GMAAggregate(128, cfg.gma_heads, 128, cfg.dtype,
                                      name="aggregator")
        scale = 2 ** (cfg.num_levels - 1)
        flow_pred = XHead(cfg.feat_channels, 2, "flow", cfg.dtype,
                          name="flow_pred")
        # 9 * scale^2 logits: a 3x3 convex-combination window per fine pixel
        # (reference: mask_channels(=scale^2=64) * (2*radius+1)(=9) = 576,
        # raft_decoder.py:351-352 — the (2r+1) factor coincidentally equals
        # the 3x3 window size at the published radius=4)
        mask_pred = XHead(
            cfg.feat_channels, 9 * scale * scale, "mask", cfg.dtype,
            name="mask_pred",
        )

        def step(carry, _):
            flow, h = carry
            flow = jax.lax.stop_gradient(flow)
            corr = corr_lookup(pyramid, flow, cfg.radius)
            motion_feat = encoder(corr, flow)
            if cfg.use_gma:
                motion_global = aggregator(attn_map, motion_feat)
                x = jnp.concatenate([cxt_feat, motion_feat, motion_global],
                                    axis=-1)
            else:
                x = jnp.concatenate([cxt_feat, motion_feat], axis=-1)
            h_new = gru(h, x)
            delta = flow_pred(h_new)
            flow_new = flow + delta
            if return_intermediate:
                # per-iteration upsampled predictions feed SequenceLoss
                # (reference scales mask logits by 0.25, raft_decoder.py:444)
                mask = 0.25 * mask_pred(h_new)
                up = convex_upsample(flow_new, mask, scale=scale)
            else:
                up = 0.0
            return (flow_new, h_new), up

        if self.is_initializing():
            # one eager step materialises every sub-module's params
            (flow, h), _ = step((flow, h), None)
        else:
            (flow, h), ups = jax.lax.scan(step, (flow, h), None, length=iters)
            if return_intermediate:
                return ups  # (iters, B, H, W, 2)
        mask = 0.25 * mask_pred(h)
        return convex_upsample(flow, mask, scale=scale)


class RAFT(nn.Module):
    """Full estimator (mmflow/mmflow/models/flow_estimators/raft.py:12-120):
    shared-weight feature encoder on both frames (InstanceNorm), context
    encoder on frame 1 (BatchNorm) split into tanh(hidden) / relu(context),
    then the iterative decoder. Input images NHWC in [0, 255]-normalised or
    standardised form per the data pipeline; flow returned at input
    resolution, in pixels."""

    config: RAFTConfig = RAFTConfig()

    @nn.compact
    def __call__(
        self,
        img1: jnp.ndarray,
        img2: jnp.ndarray,
        iters: Optional[int] = None,
        flow_init: Optional[jnp.ndarray] = None,
        train: bool = False,
        return_intermediate: bool = False,
    ):
        cfg = self.config
        encoder = RAFTEncoder(
            out_channels=256, norm="instance", stem_channels=cfg.stem_channels,
            base_channels=cfg.base_channels, strides=cfg.strides,
            dtype=cfg.dtype, name="encoder",
        )
        context = RAFTEncoder(
            out_channels=cfg.h_channels + cfg.cxt_channels, norm="batch",
            stem_channels=cfg.stem_channels, base_channels=cfg.base_channels,
            strides=cfg.strides, dtype=cfg.dtype, name="context",
        )
        feat1 = encoder(img1, train)
        feat2 = encoder(img2, train)
        cxt = context(img1, train)
        h = jnp.tanh(cxt[..., : cfg.h_channels])
        cxt_feat = nn.relu(cxt[..., cfg.h_channels :])

        B, H8, W8, _ = feat1.shape
        if flow_init is None:
            flow_init = jnp.zeros((B, H8, W8, 2), cfg.dtype)
        return RAFTDecoder(cfg, name="decoder")(
            feat1, feat2, flow_init, h, cxt_feat,
            iters=iters, return_intermediate=return_intermediate,
        )
