"""UNet3DConditionModel: SD-1.5 UNet inflated to video with motion modules.

Behavior spec: reference ``animatediff/models/unet.py:39-672`` — widened conv_in
for mask+first-frame-latent concat (:113-126), fps / motion-score / camera
embeddings (zero-init output layers, :134-146, applied :537-558), first-frame
zero-timestep trick (:527-529 with resnet.py:309-317), IP token concat
(:592-594), T5 projection (:597-599), the 4-level down/mid/up topology.

TPU-first differences:
- tensors are ``(B, F, H, W, C)`` NHWC; all shape algebra is reshape-only;
- the 14 interacting conditioning kwargs are a typed ``UNetConditioning``
  struct (SURVEY.md §7 "hard parts");
- IP image tokens are projected ONCE by the pipeline (they are
  timestep-independent) and arrive pre-concatenated in ``cond.context``; the
  reference re-runs image_proj_model inside every UNet call (unet.py:592-594);
- gradient checkpointing is a caller-side ``jax.checkpoint`` policy, not
  module state.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import flax.struct
import jax.numpy as jnp

from followyourclick_tpu.config import UNet3DConfig
from followyourclick_tpu.models.layers import (
    TimestepEmbedding,
    sinusoidal_timestep_embedding,
)
from followyourclick_tpu.models.pab import PabMode
from followyourclick_tpu.models.resnet import InflatedConv, PseudoConv3d
from followyourclick_tpu.models.unet_blocks import (
    CrossAttnDownBlock3D,
    CrossAttnUpBlock3D,
    DownBlock3D,
    UNetMidBlock3DCrossAttn,
    UpBlock3D,
)


@flax.struct.dataclass
class UNetConditioning:
    """All conditioning inputs for one denoise step.

    Batch convention: ``context``/``context_t5`` carry the CFG layout the
    caller wants ([uncond; cond] when doubled). The remaining arrays may be
    at EITHER the sample batch or the context batch — CFG prefix sharing
    (exact math): when ``context`` has 2× the sample's batch, the UNet runs
    its stem (conv_in → first resnet → first self-attention) once at the
    sample batch and duplicates hidden states at the first cross-attention,
    where text conditioning first enters; batch-shaped conditioning is
    tiled on use (``resnet.tile_to_batch``). Identical halves are
    guaranteed by construction: both CFG branches share latents, timestep,
    and fps/motion/camera values."""

    context: jnp.ndarray                                # (B, 77[+N_ip], 768)
    fps: Optional[jnp.ndarray] = None                   # (B,) frame-rate value
    motion_score: Optional[jnp.ndarray] = None          # (B,) optical-flow magnitude ("flow_control")
    camera_motion_type: Optional[jnp.ndarray] = None    # (B,) motion-type index
    class_labels: Optional[jnp.ndarray] = None          # (B,)
    context_t5: Optional[jnp.ndarray] = None            # (B, S2, 4096) raw T5 states
    # 4-ch first-frame latent for the *non-mask* concat variant
    # (use_first_frame_condition_concat): repeated over frames inside the UNet.
    reference_images_latent: Optional[jnp.ndarray] = None  # (B, H/8, W/8, 4)
    # zero-timestep embedding trick: when True, frame 0 of every resnet gets
    # the t=0 time embedding (use_first_frame_condition in the reference).
    first_frame_zero_timestep: bool = flax.struct.field(
        pytree_node=False, default=False)


class UNet3DConditionModel(nn.Module):
    """The denoiser. Input sample is ``(B, F, H, W, C_in)`` where C_in is 4, 8
    (first-frame concat) or 9 (mask + first-frame concat, done by pipeline)."""

    config: UNet3DConfig
    # OPT-IN serving approximation: PAB-style attention reuse flags for this
    # step variant (models/pab.py); None = exact path, zero overhead.
    pab: Optional[PabMode] = None
    dtype: jnp.dtype = jnp.float32
    # Per-block gradient checkpointing: each down/mid/up block is its own
    # remat region, so the backward keeps only block-boundary activations
    # plus ONE block's internals live (vs the caller-side whole-apply
    # checkpoint, whose backward recomputation approaches un-remat'd
    # liveness — the reason the 24-frame reference recipe OOMed by 1.9 %
    # on one 16 GB chip, docs/PERF.md "Training throughput"). Same total
    # recompute as the whole-apply policy; callers enabling this should
    # NOT also wrap apply in jax.checkpoint.
    remat_blocks: bool = False

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,        # (B, F, H, W, C_in)
        timesteps: jnp.ndarray,     # (B,) or scalar
        cond: UNetConditioning,
    ) -> jnp.ndarray:
        cfg = self.config
        b, f, h, w, _ = sample.shape

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps[None], (b,))

        if cfg.center_input_sample:
            sample = 2.0 * sample - 1.0

        # ---- time + auxiliary embeddings (all fp32 sinusoidal → MLP) ----
        proj_dim = cfg.block_out_channels[0]

        def sin_emb(x):
            return sinusoidal_timestep_embedding(
                x, proj_dim, flip_sin_to_cos=cfg.flip_sin_to_cos,
                downscale_freq_shift=cfg.freq_shift).astype(self.dtype)

        time_embedding = TimestepEmbedding(cfg.time_embed_dim,
                                           dtype=self.dtype,
                                           name="time_embedding")
        emb = time_embedding(sin_emb(timesteps))

        emb_frame0 = None
        if cond.first_frame_zero_timestep:
            zero_t = jnp.zeros((b,), dtype=timesteps.dtype)
            emb_frame0 = time_embedding(sin_emb(zero_t))

        # fps/motion/camera embeddings have zero-init output layers so an
        # inflated checkpoint starts as a no-op (reference unet.py:134-146)
        from followyourclick_tpu.models.resnet import tile_to_batch

        def aux(a):
            # scalar-per-clip conditioning may arrive at the pre-CFG batch
            return None if a is None else jnp.broadcast_to(
                tile_to_batch(a, b) if a.ndim else a, (b,))

        if cfg.use_camera_motion_condition and cond.camera_motion_type is not None:
            cam = aux(cond.camera_motion_type)
            emb += TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                     zero_init_output=True,
                                     name="camera_motion_embedding")(sin_emb(cam))
        if cfg.use_fps_condition:
            assert cond.fps is not None and cond.motion_score is not None, (
                "use_fps_condition requires cond.fps and cond.motion_score")
            fps = aux(cond.fps)
            emb += TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                     zero_init_output=True,
                                     name="fps_embedding")(sin_emb(fps))
            flow = aux(cond.motion_score)
            emb += TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                     zero_init_output=True,
                                     name="motion_embedding")(sin_emb(flow))
        if cfg.num_class_embeds is not None:
            assert cond.class_labels is not None
            emb += nn.Embed(cfg.num_class_embeds, cfg.time_embed_dim,
                            dtype=self.dtype, name="class_embedding")(
                cond.class_labels)

        # ---- input projection ----
        if cfg.use_first_frame_condition_concat:
            assert cond.reference_images_latent is not None
            ref_lat = tile_to_batch(cond.reference_images_latent, b)
            first = jnp.broadcast_to(
                ref_lat[:, None], (b, f) + ref_lat.shape[1:])
            sample = jnp.concatenate([sample, first.astype(sample.dtype)],
                                     axis=-1)
        conv_cls = PseudoConv3d if cfg.use_pseudo_conv3d else InflatedConv
        sample = conv_cls(cfg.block_out_channels[0], kernel_size=3,
                          dtype=self.dtype, name="conv_in")(sample)
        if cfg.use_first_frame_condition_concat:
            sample = sample / 2.0

        context = cond.context.astype(self.dtype)
        context_2 = None
        if cfg.use_text_encoder_2 and cond.context_t5 is not None:
            context_2 = nn.Dense(
                cfg.cross_attention_dim, dtype=self.dtype,
                kernel_init=nn.initializers.zeros,
                name="text_encoder_proj_model_t5")(
                cond.context_t5.astype(self.dtype))

        def use_motion(level: int) -> bool:
            res = 2 ** level
            return (cfg.use_motion_module
                    and res in tuple(cfg.motion_module_resolutions))

        def maybe_remat(block_cls):
            if not self.remat_blocks:
                return block_cls
            import jax

            # prevent_cse=False: safe under jit (flax docs) and avoids the
            # barrier ops that block XLA fusion across the remat boundary
            return nn.remat(
                block_cls, prevent_cse=False,
                policy=jax.checkpoint_policies.nothing_saveable)

        # ---- down / mid / up topology ----
        rev_channels = list(reversed(cfg.block_out_channels))
        n_skip = cfg.layers_per_block + 1  # skips per up block

        def down_block(i: int, s):
            block_type = cfg.down_block_types[i]
            in_ch = cfg.block_out_channels[max(i - 1, 0)]
            out_ch = cfg.block_out_channels[i]
            is_final = i == len(cfg.down_block_types) - 1
            common = dict(
                config=cfg, in_channels=in_ch, out_channels=out_ch,
                num_layers=cfg.layers_per_block, add_downsample=not is_final,
                use_motion=use_motion(i) and not cfg.motion_module_decoder_only,
                pab=self.pab, dtype=self.dtype, name=f"down_blocks_{i}")
            if block_type == "CrossAttnDownBlock3D":
                return maybe_remat(CrossAttnDownBlock3D)(**common)(
                    s, emb, context, context_2, emb_frame0)
            elif block_type == "DownBlock3D":
                return maybe_remat(DownBlock3D)(**common)(s, emb, emb_frame0)
            raise ValueError(block_type)

        def up_block(i: int, s, res):
            block_type = cfg.up_block_types[i]
            is_final = i == len(cfg.up_block_types) - 1
            prev_ch = rev_channels[max(i - 1, 0)]
            out_ch = rev_channels[i]
            in_ch = rev_channels[min(i + 1, len(rev_channels) - 1)]
            level = len(cfg.block_out_channels) - 1 - i
            common = dict(
                config=cfg, in_channels=in_ch, prev_output_channel=prev_ch,
                out_channels=out_ch, num_layers=n_skip,
                add_upsample=not is_final, use_motion=use_motion(level),
                pab=self.pab, dtype=self.dtype, name=f"up_blocks_{i}")
            if block_type == "CrossAttnUpBlock3D":
                return maybe_remat(CrossAttnUpBlock3D)(**common)(
                    s, res, emb, context, context_2, emb_frame0)
            elif block_type == "UpBlock3D":
                return maybe_remat(UpBlock3D)(**common)(s, res, emb, emb_frame0)
            raise ValueError(block_type)

        def mid(s):
            if cfg.mid_block_type == "UNetMidBlock3DCrossAttn":
                return maybe_remat(UNetMidBlock3DCrossAttn)(
                    config=cfg, in_channels=cfg.block_out_channels[-1],
                    use_motion=(cfg.use_motion_module
                                and cfg.motion_module_mid_block),
                    pab=self.pab, dtype=self.dtype, name="mid_block")(
                    s, emb, context, context_2, emb_frame0)
            raise ValueError(cfg.mid_block_type)

        # Level 0 (the outermost, highest-resolution level) always runs.
        down_res_samples = [sample]
        sample, res = down_block(0, sample)
        down_res_samples.extend(res)

        def trunk(s):
            """Down levels 1.., mid, and all up blocks but the last — the
            DeepCache-cacheable interior (models/pab.py reuse_deep)."""
            ds = list(down_res_samples)  # incl. level-0 downsample output
            for i in range(1, len(cfg.down_block_types)):
                s, res = down_block(i, s)
                ds.extend(res)
            s = mid(s)
            for i in range(len(cfg.up_block_types) - 1):
                res = ds[-n_skip:]
                ds = ds[:-n_skip]
                s = up_block(i, s, res)
            return s

        deep_site = (self.pab is not None
                     and (self.pab.reuse_deep or self.pab.record_deep)
                     and len(cfg.down_block_types) >= 2)
        if deep_site:
            from followyourclick_tpu.models.pab import pab_site

            sample = pab_site(self, "deep", "deep_trunk", self.pab,
                              lambda: trunk(sample))
        else:
            sample = trunk(sample)

        # Last up block: consumes the level-0 skips (conv_in output + the
        # level-0 layer outputs), which were computed above in either mode.
        sample = up_block(len(cfg.up_block_types) - 1, sample,
                          down_res_samples[:n_skip])

        # ---- output projection ----
        from followyourclick_tpu.models.layers import GroupNorm

        out_norm = GroupNorm(num_groups=cfg.norm_num_groups,
                             epsilon=cfg.norm_eps, dtype=self.dtype,
                             act="silu", name="conv_norm_out")
        b_out = sample.shape[0]  # CFG-doubled when prefix sharing was active
        if cfg.use_inflated_groupnorm:
            bf_sample = sample.reshape(b_out * f, *sample.shape[2:])
            sample = out_norm(bf_sample).reshape(b_out, f,
                                                 *bf_sample.shape[1:])
        else:
            # plain GroupNorm on the 5D clip: stats over (F, H, W, C/g)
            sample = out_norm(sample)
        sample = InflatedConv(cfg.out_channels, kernel_size=3,
                              dtype=self.dtype, name="conv_out")(sample)
        return sample
