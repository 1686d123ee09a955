"""The Follow-Your-Click sampler: one jitted program per clip configuration.

Behavior spec: reference ``animatediff/pipelines/pipeline_animation.py`` —
``_encode_prompt`` CFG batching (:158-245), ``prepare_latents`` with shared
first-frame noise + init-latent alpha blend (:448-537), the per-step
first-frame masked-latent concat (latents ⧺ mask ⧺ first-frame-latent-block on
the channel axis, :690-711), CFG plus the optional 3-term ``video_scale``
guidance with a per-frame uncond pass (:738-761), DDIM step (:767), and
per-frame VAE decode (:400-413).

TPU-first design (BASELINE.json north star): the reference drives the loop
from Python with a device sync per step; here the *entire* denoise loop is one
``jax.lax.scan`` inside one jit — text encode → scan(UNet ×2·steps) → frame-
scanned VAE decode run as a single XLA program with zero host round-trips.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from followyourclick_tpu.config import InferenceConfig
from followyourclick_tpu.models.clip_text import CLIPTextModel
from followyourclick_tpu.models.unet3d import UNet3DConditionModel, UNetConditioning
from followyourclick_tpu.models.vae import AutoencoderKL
from followyourclick_tpu.schedulers.ddim import DDIMSchedule, ddim_step

VAE_SCALE = 0.18215  # SD latent scaling (reference pipeline_animation.py:402)


@flax.struct.dataclass
class SampleSpec:
    """Static sampling configuration — one XLA program per distinct spec."""

    video_length: int = flax.struct.field(pytree_node=False, default=16)
    height: int = flax.struct.field(pytree_node=False, default=512)
    width: int = flax.struct.field(pytree_node=False, default=512)
    num_inference_steps: int = flax.struct.field(pytree_node=False, default=25)
    guidance_scale: float = flax.struct.field(pytree_node=False, default=8.0)
    video_scale: float = flax.struct.field(pytree_node=False, default=0.0)
    use_interpolate_noise: bool = flax.struct.field(pytree_node=False,
                                                    default=True)
    # init-image alpha-decay blend (use_first_image_as_init_latents)
    use_first_image_as_init_latents: bool = flax.struct.field(
        pytree_node=False, default=False)
    init_alpha_k: float = flax.struct.field(pytree_node=False, default=64.0)
    use_residual_noise: bool = flax.struct.field(pytree_node=False,
                                                 default=False)
    base_lambda: float = flax.struct.field(pytree_node=False, default=0.9)
    eta: float = flax.struct.field(pytree_node=False, default=0.0)
    # which solver drives the scan — the reference pipeline accepts any of
    # DDIM/PNDM/LMS/Euler(-A)/DPM-Solver (pipeline_animation.py:50-57);
    # see schedulers/dispatch.py for the names
    scheduler: str = flax.struct.field(pytree_node=False, default="ddim")
    # CFG prefix sharing (EXACT math, on by default): the cond/uncond halves
    # are identical through conv_in → first resnet → first self-attention
    # (text context only enters at the first cross-attention), so the UNet
    # stem runs once at half batch and hidden states duplicate in-network
    # (models/attention.py BasicTransformerBlock). False forces the
    # reference-style pre-duplicated call.
    share_cfg_prefix: bool = flax.struct.field(pytree_node=False,
                                               default=True)
    # OPT-IN serving approximation (NOT reference behavior, off by default):
    # recompute the CFG uncond branch only every k-th step and reuse the
    # cached prediction in between (the negative-prompt noise drifts slowly
    # across adjacent timesteps — same family as Pyramid Attention
    # Broadcast, arXiv 2408.12588). k=1 reproduces the exact reference CFG.
    cfg_cache_interval: int = flax.struct.field(pytree_node=False, default=1)
    # OPT-IN serving approximation (NOT reference behavior, off by default):
    # PAB-style attention-output reuse (models/pab.py, arXiv 2408.12588).
    # Each attention kind recomputes every k-th step and broadcasts the
    # cached sublayer output in between; 1 = exact. The step schedule is
    # static, so XLA compiles real skips (no dynamic control flow).
    pab_spatial_interval: int = flax.struct.field(pytree_node=False, default=1)
    pab_cross_interval: int = flax.struct.field(pytree_node=False, default=1)
    pab_temporal_interval: int = flax.struct.field(pytree_node=False,
                                                  default=1)
    # OPT-IN serving approximation (NOT reference behavior, off by default):
    # DeepCache-style trunk reuse (models/pab.py reuse_deep, arXiv
    # 2312.00858 family): the UNet interior (down levels 1.., mid, up levels
    # ..n-2) recomputes every k-th step; in between only the outermost
    # level runs against the cached trunk output. Composes with the PAB
    # attention intervals (which then govern only the outermost level's
    # sites on trunk-reuse steps) and with cfg_cache_interval. 1 = exact.
    deep_cache_interval: int = flax.struct.field(pytree_node=False, default=1)
    # exact full-compute steps before the reuse schedule starts (early
    # denoise steps set global structure; PAB-family methods keep them exact)
    pab_warmup_steps: int = flax.struct.field(pytree_node=False, default=0)
    # trailing full-CFG exact steps when cfg_cache_interval > 1 (the final
    # denoise steps set output detail; 2 mirrors the original recompute
    # guard). Sweepable — see docs/PERF.md "Serving quality budget".
    cfg_final_exact_steps: int = flax.struct.field(pytree_node=False,
                                                   default=2)
    # OPT-IN refinement of cfg_cache: between uncond refreshes, linearly
    # EXTRAPOLATE the cached uncond prediction from its last two refreshed
    # values instead of holding it constant (first-order Richardson /
    # TeaCache-style output forecast). Same compute and step classes as the
    # plain cache — two extra latent-sized elementwise ops per reused step —
    # but tracks the uncond branch's slow drift across timesteps, so deeper
    # cache intervals stay inside the quality budget (docs/PERF.md).
    cfg_cache_extrapolate: bool = flax.struct.field(pytree_node=False,
                                                    default=False)
    # OPT-IN refinement of deep_cache: between trunk refreshes, linearly
    # EXTRAPOLATE the cached trunk output from its last two recorded values
    # instead of holding it constant (models/pab.py PabMode.deep_extrapolate
    # — the cfg_cache_extrapolate forecast applied to the DeepCache trunk).
    # Trunk staleness is the measured quality cliff of the deep schedules
    # (docs/PERF.md: deep-8 fails the 0.10 cap on every seed without it);
    # the forecast costs one extra trunk-sized cache entry plus an
    # elementwise FMA on reuse steps.
    deep_cache_extrapolate: bool = flax.struct.field(pytree_node=False,
                                                     default=False)


def _as_plain_dict(x):
    """Recursively normalize Mapping nodes (e.g. FrozenDict) to plain dicts
    so merged and unmerged cache subtrees share one pytree node type."""
    from collections.abc import Mapping

    if isinstance(x, Mapping):
        return {k: _as_plain_dict(v) for k, v in x.items()}
    return x


def _merge_cache(old, new):
    """Overlay a step's mutated "pab" collection onto the carried cache.

    Step variants that skip whole modules (DeepCache trunk reuse) return a
    mutated collection that is a subtree of the full cache; the untouched
    entries must carry forward so every step yields the same scan-carry
    tree structure."""
    from collections.abc import Mapping

    if isinstance(old, Mapping) and isinstance(new, Mapping):
        out = {k: _as_plain_dict(v) for k, v in old.items()}
        for k, v in new.items():
            out[k] = (_merge_cache(out[k], v) if k in out
                      else _as_plain_dict(v))
        return out
    return _as_plain_dict(new)


class AnimationPipeline:
    """Bundles the models + params; host-side prompt handling, jitted core.

    Weight loading mirrors the reference assembly (scripts/inference.py:152-247)
    through ``followyourclick_tpu.utils.loaders``.
    """

    def __init__(
        self,
        config: InferenceConfig,
        unet_params,
        vae_params,
        text_encoder_params,
        tokenizer=None,
        dtype=jnp.float32,
        mesh=None,
        ip_adapter_params=None,
        ip_plus: bool = False,
        ip_vision_config=None,
        t5_params=None,
        tokenizer_2=None,
        t5_config=None,
    ):
        self.config = config
        self.dtype = dtype
        self.unet = UNet3DConditionModel(config.unet, dtype=dtype)
        # per-frame uncond pass for video_scale guidance: the reference calls
        # the UNet with default flags (pipeline_animation.py:744-751) — no
        # fps, no ip token injection, no T5 — so mirror that with a config
        # where those paths are off (same params; unused subtrees ignored)
        plain_cfg = dataclasses.replace(
            config.unet, use_fps_condition=False,
            use_ip_cross_attention=False)
        self.unet_plain = (self.unet if plain_cfg == config.unet
                           else UNet3DConditionModel(plain_cfg, dtype=dtype))
        self.vae = AutoencoderKL(config.vae, dtype=dtype)
        self.text_encoder = CLIPTextModel(config.clip_text, dtype=dtype)
        self.params = {
            "unet": unet_params,
            "vae": vae_params,
            "text_encoder": text_encoder_params,
        }
        self.tokenizer = tokenizer
        self.mesh = mesh

        # optional IP-Adapter image-prompt tower (reference
        # scripts/inference_w_image_cond.py:283-310: condition image → CLIP
        # vision → ImageProjModel/Resampler tokens → concat onto context)
        self.ip_adapter = None
        if ip_adapter_params is not None:
            from followyourclick_tpu.models.ip_adapter import (
                CLIPVisionConfig,
                IPAdapter,
            )

            self.ip_adapter = IPAdapter(
                vision_config=ip_vision_config or CLIPVisionConfig(),
                cross_attention_dim=config.unet.cross_attention_dim,
                num_tokens=config.unet.ip_num_tokens,
                plus=ip_plus, dtype=dtype)
            self.params["ip_adapter"] = ip_adapter_params

        # optional T5 second text tower (reference _encode_prompt_2,
        # pipeline_animation.py:248-398; raw hidden states — the zero-init
        # projection lives inside the UNet, unet.py:597-599)
        self.t5 = None
        self.tokenizer_2 = tokenizer_2
        if t5_params is not None:
            from followyourclick_tpu.models.t5_text import (
                T5Config,
                T5EncoderModel,
            )

            self.t5 = T5EncoderModel(t5_config or T5Config(), dtype=dtype)
            self.params["t5"] = t5_params

    # ------------------------------------------------------------------
    # host-side text handling (reference _encode_prompt tokenization part)
    # ------------------------------------------------------------------
    def tokenize(self, prompts: Sequence[str],
                 negative_prompts: Optional[Sequence[str]] = None):
        assert self.tokenizer is not None, "pipeline built without tokenizer"
        if negative_prompts is None:
            negative_prompts = [""] * len(prompts)
        enc = self.tokenizer(list(prompts), padding="max_length",
                             max_length=77, truncation=True,
                             return_tensors="np")
        neg = self.tokenizer(list(negative_prompts), padding="max_length",
                             max_length=77, truncation=True,
                             return_tensors="np")
        return np.asarray(enc.input_ids), np.asarray(neg.input_ids)

    # ------------------------------------------------------------------
    # jitted pieces
    # ------------------------------------------------------------------
    def encode_prompt(self, params, input_ids: jnp.ndarray,
                      neg_input_ids: jnp.ndarray) -> jnp.ndarray:
        """CFG context: concat([uncond, cond]) on batch (reference order)."""
        cond, _ = self.text_encoder.apply({"params": params["text_encoder"]},
                                          input_ids)
        uncond, _ = self.text_encoder.apply({"params": params["text_encoder"]},
                                            neg_input_ids)
        return jnp.concatenate([uncond, cond], axis=0)

    def tokenize_2(self, prompts: Sequence[str],
                   negative_prompts: Optional[Sequence[str]] = None,
                   max_length: int = 77):
        """T5 tokenization for the second text tower (reference
        _encode_prompt_2 tokenization, pipeline_animation.py:248-320)."""
        assert self.tokenizer_2 is not None, "pipeline built without T5 tokenizer"
        if negative_prompts is None:
            negative_prompts = [""] * len(prompts)
        enc = self.tokenizer_2(list(prompts), padding="max_length",
                               max_length=max_length, truncation=True,
                               return_tensors="np")
        neg = self.tokenizer_2(list(negative_prompts), padding="max_length",
                               max_length=max_length, truncation=True,
                               return_tensors="np")
        return (np.asarray(enc.input_ids), np.asarray(enc.attention_mask),
                np.asarray(neg.input_ids), np.asarray(neg.attention_mask))

    def encode_prompt_t5(self, params, input_ids, attention_mask,
                         neg_input_ids, neg_attention_mask) -> jnp.ndarray:
        """CFG-batched raw T5 states [uncond; cond] (reference :248-398).
        The zero-init projection into cross-attn runs inside the UNet."""
        cond = self.t5.apply({"params": params["t5"]}, input_ids,
                             attention_mask)
        uncond = self.t5.apply({"params": params["t5"]}, neg_input_ids,
                               neg_attention_mask)
        return jnp.concatenate([uncond, cond], axis=0)

    def encode_image_prompt(self, params, pixel_values: jnp.ndarray):
        """Condition image (B, 224, 224, 3) CLIP-normalized → CFG-batched ip
        tokens (2B, N, 768) ready to concat onto the text context
        (reference my_ip_adapter.py get_image_clip_feat :127-134/:274-284 +
        unet.py:592-594 token concat; here projected once per clip since the
        tokens are timestep-independent)."""
        assert self.ip_adapter is not None, "pipeline built without IP-Adapter"
        cond_tok, uncond_tok = self.ip_adapter.apply(
            {"params": params["ip_adapter"]}, pixel_values)
        return jnp.concatenate([uncond_tok, cond_tok], axis=0)

    def encode_image(self, params, image: jnp.ndarray,
                     rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """image (B, H, W, 3) in [-1, 1] → scaled latent (B, h, w, 4).
        Uses the distribution mean unless an rng is supplied
        (reference scripts/inference.py:356-358 samples)."""
        mean, logvar = self.vae.apply({"params": params["vae"]}, image,
                                      method=self.vae.encode)
        if rng is not None:
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, dtype=mean.dtype)
        return mean * VAE_SCALE

    def prepare_latents(self, rng: jax.Array, batch: int, spec: SampleSpec,
                        init_latents: Optional[jnp.ndarray] = None
                        ) -> jnp.ndarray:
        """Initial noise (B, F, h, w, 4) (reference prepare_latents :448-537)."""
        f = spec.video_length
        h, w = spec.height // 8, spec.width // 8
        noise = jax.random.normal(rng, (batch, f, h, w, 4), dtype=jnp.float32)
        if spec.use_interpolate_noise:
            noise = jnp.broadcast_to(noise[:, :1], noise.shape)
        latents = noise
        if spec.use_first_image_as_init_latents and init_latents is not None:
            # alpha decays along frames: (F - i) / F / k
            i = jnp.arange(f, dtype=jnp.float32)
            alpha = ((f - i) / f / spec.init_alpha_k)[None, :, None, None, None]
            latents = init_latents[:, None] * alpha + latents * (1 - alpha)
        if spec.use_residual_noise:
            base = jnp.broadcast_to(latents[:, :1], latents.shape)
            mixed = (spec.base_lambda ** 0.5) * base + \
                ((1 - spec.base_lambda) ** 0.5) * latents
            latents = mixed.at[:, 0].set(base[:, 0])
        return latents.astype(self.dtype)

    # ------------------------------------------------------------------
    def _unet_apply(self, params, sample, t, cond):
        return self.unet.apply({"params": params}, sample, t, cond)

    def denoise(
        self,
        params,
        latents: jnp.ndarray,            # (B, F, h, w, 4)
        context: jnp.ndarray,            # (2B, 77[+N], 768) [uncond; cond]
        spec: SampleSpec,
        first_image_latents: Optional[jnp.ndarray] = None,  # (B, h, w, 4)
        mask: Optional[jnp.ndarray] = None,                 # (B, h, w, 1)
        partial_mask: Optional[jnp.ndarray] = None,         # latent corruption
        fps: Optional[jnp.ndarray] = None,                  # (B,)
        motion_score: Optional[jnp.ndarray] = None,         # (B,)
        camera_motion_type: Optional[jnp.ndarray] = None,
        context_t5: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """The fused CFG denoising scan. Returns final latents."""
        from followyourclick_tpu.schedulers.dispatch import make_solver

        ucfg = self.config.unet
        b, f, h, w, _ = latents.shape
        solver = make_solver(spec.scheduler, self.config.noise_scheduler,
                             spec.num_inference_steps)
        sched = solver.sched  # the PAB/cfg-cache fast paths are DDIM-only
        # k-diffusion-family solvers start from sigma_max-scaled noise
        # (diffusers pipelines: latents *= scheduler.init_noise_sigma)
        if float(solver.init_noise_sigma) != 1.0:
            latents = latents * jnp.asarray(solver.init_noise_sigma,
                                            latents.dtype)
        do_cfg = spec.guidance_scale > 1.0
        mult = 2 if do_cfg else 1
        # CFG prefix sharing: pass the UNet un-duplicated latents + aux
        # conditioning with the doubled context; it duplicates in-network at
        # the first cross-attention (see SampleSpec.share_cfg_prefix)
        share = spec.share_cfg_prefix and do_cfg

        def dup(x):
            if x is None or not do_cfg:
                return x
            return jnp.concatenate([x] * 2, axis=0)

        # per-clip scalar conditioning is NEVER pre-duplicated: both CFG
        # halves share the values and the UNet tiles on use (tile_to_batch)
        cond = UNetConditioning(
            context=context,
            fps=fps, motion_score=motion_score,
            camera_motion_type=camera_motion_type,
            context_t5=context_t5,
        )

        # static per-step conditioning blocks (reference :690-704)
        use_mask_concat = ucfg.use_first_frame_mask_condition_concat
        if use_mask_concat:
            assert first_image_latents is not None
            ffl = first_image_latents
            if partial_mask is not None:
                # training-style conditioning corruption replica
                # (reference scripts/inference.py:370-372, pipeline :698-699)
                ffl = ffl * partial_mask
            frame_idx = jnp.arange(f)[None, :, None, None, None]
            first_block = jnp.where(frame_idx == 0, ffl[:, None],
                                    jnp.zeros_like(ffl[:, None]))
            first_block = jnp.broadcast_to(first_block, (b, f, h, w, 4))
            if mask is not None:
                mask_block = jnp.clip(mask[:, None], 0.0, 1.0)
                mask_block = jnp.broadcast_to(mask_block, (b, f, h, w, 1))
            else:
                mask_block = jnp.broadcast_to(
                    (frame_idx == 0).astype(latents.dtype), (b, f, h, w, 1))
            cond_channels = jnp.concatenate(
                [mask_block.astype(latents.dtype),
                 first_block.astype(latents.dtype)], axis=-1)

        if ucfg.use_first_frame_condition_concat:
            cond = cond.replace(reference_images_latent=first_image_latents)

        cfg_cache = (do_cfg and spec.video_scale == 0
                     and spec.cfg_cache_interval > 1)
        S = solver.n_calls  # == num_inference_steps except PNDM grids
        if spec.eta > 0:
            # stochastic DDIM needs per-step noise (reference passes
            # eta through scheduler.step, scheduling_ddim.py:356-366)
            assert spec.scheduler == "ddim", "eta is a DDIM knob"
            assert rng is not None, "eta > 0 requires rng for DDIM noise"
        if solver.needs_step_noise:
            assert rng is not None, (
                f"{spec.scheduler} draws fresh noise every step; pass rng")

        def _step_noise(i):
            if spec.eta <= 0 and not solver.needs_step_noise:
                return None
            return jax.random.normal(jax.random.fold_in(rng, i),
                                     (b, f, h, w, 4), dtype=jnp.float32)

        def build_x(latents):
            # PAB path only: reference-style pre-duplicated UNet input
            if use_mask_concat:
                return jnp.concatenate([dup(latents), dup(cond_channels)],
                                       axis=-1)
            return dup(latents)

        pab_on = (spec.pab_spatial_interval > 1
                  or spec.pab_cross_interval > 1
                  or spec.pab_temporal_interval > 1
                  or spec.deep_cache_interval > 1)
        if pab_on or cfg_cache:
            assert spec.scheduler == "ddim", (
                "the PAB / cfg-cache serving approximations run on the DDIM "
                "scan only")
        if pab_on:
            # cfg_cache_interval COMPOSES with PAB here: the static period
            # schedule runs cond-half-only UNet steps between uncond
            # refreshes (no lax.cond — each variant is its own graph)
            assert spec.video_scale == 0, (
                "pab_*_interval composes with plain CFG only (no video_scale "
                "3-term guidance)")
            return self._denoise_pab(params, latents, cond, spec, sched,
                                     build_x, _step_noise, do_cfg, mult)

        def step(carry, i):
            latents, ustate, sstate = carry
            t = solver.timestep(i)
            x = solver.scale_model_input(latents, i)
            x_dup = dup(x) if (do_cfg and not share) else x
            if use_mask_concat:
                cc = cond_channels if (share or not do_cfg) \
                    else dup(cond_channels)
                x = jnp.concatenate([x_dup, cc], axis=-1)
            else:
                x = x_dup
            t_batch = jnp.broadcast_to(t, (b if share else b * mult,))
            if cfg_cache:
                # both branches produce (uncond, text, ustate) of identical
                # structure; the cheap branch runs the UNet on the cond half
                # only. ustate holds the cached uncond — and, under
                # cfg_cache_extrapolate, the previous refresh too:
                # (u1, u0, i1, i0) for the first-order forecast
                # u1 + (i - i1)·(u1 - u0)/(i1 - i0).
                recompute = jnp.logical_or(
                    i % spec.cfg_cache_interval == 0,
                    i >= S - spec.cfg_final_exact_steps)
                extrap = spec.cfg_cache_extrapolate

                def fresh(_):
                    pred = self._unet_apply(params["unet"], x, t_batch, cond)
                    u, c = jnp.split(pred, 2, axis=0)
                    if extrap:
                        u1, u0, i1, i0 = ustate
                        first = i1 < 0  # no prior refresh: slope = 0
                        return u, c, (u, jnp.where(first, u, u1),
                                      i.astype(jnp.int32),
                                      jnp.where(first, i, i1))
                    return u, c, (u,)

                def cached(_):
                    # cond-half-only UNet call: context sliced to its cond
                    # half; the latent input is already un-duplicated under
                    # prefix sharing
                    c = self._unet_apply(
                        params["unet"], x if share else x[b:],
                        jnp.broadcast_to(t, (b,)),
                        jax.tree_util.tree_map(
                            lambda a: a[b:] if hasattr(a, "shape")
                            and a.shape[:1] == (2 * b,) else a, cond),
                    )
                    if extrap:
                        u1, u0, i1, i0 = ustate
                        gap = jnp.maximum(i1 - i0, 1).astype(jnp.float32)
                        age = (i - i1).astype(jnp.float32)
                        u = (u1.astype(jnp.float32)
                             + (u1.astype(jnp.float32)
                                - u0.astype(jnp.float32)) * (age / gap)
                             ).astype(u1.dtype)
                        return u, c, ustate
                    return ustate[0], c, ustate

                uncond_pred, text_pred, new_ustate = jax.lax.cond(
                    recompute, fresh, cached, None)
                noise_pred = uncond_pred + spec.guidance_scale * (
                    text_pred - uncond_pred)
                new_latents, _ = ddim_step(sched, noise_pred, i, latents,
                                           eta=spec.eta, noise=_step_noise(i))
                return (new_latents, new_ustate, sstate), ()

            noise_pred = self._unet_apply(params["unet"], x, t_batch, cond)

            if do_cfg:
                uncond_pred, text_pred = jnp.split(noise_pred, 2, axis=0)
                if spec.video_scale > 0:
                    # per-frame uncond pass: frames folded to batch, F=1,
                    # fps/ip/t5-free UNet call (reference :738-751). The
                    # reference pairs frame k with row k of
                    # cat([text_embeddings]*f).chunk(2)[0] — i.e. a TILED
                    # [uncond;cond;uncond;...] pattern, not pure uncond; we
                    # reproduce it exactly for parity. ip tokens never enter
                    # this pass (they are injected inside the reference UNet
                    # only when use_ip_cross_attention is passed).
                    xs = x if share else jnp.split(x, 2, axis=0)[0]
                    xs = xs.reshape(b * f, 1, h, w, xs.shape[-1])
                    base_ctx = context
                    if ucfg.use_ip_cross_attention:
                        base_ctx = context[:, :context.shape[1]
                                           - ucfg.ip_num_tokens]
                    ctx_f = jnp.tile(base_ctx, (f, 1, 1))[: b * f]
                    frame_pred = self.unet_plain.apply(
                        {"params": params["unet"]}, xs,
                        jnp.broadcast_to(t, (b * f,)),
                        UNetConditioning(context=ctx_f))
                    frame_pred = frame_pred.reshape(b, f, h, w, 4)
                    noise_pred = (
                        frame_pred
                        + spec.video_scale * (uncond_pred - frame_pred)
                        + spec.guidance_scale * (text_pred - uncond_pred))
                else:
                    noise_pred = uncond_pred + spec.guidance_scale * (
                        text_pred - uncond_pred)

            new_latents, sstate = solver.step(
                noise_pred, i, latents, sstate,
                eta=spec.eta, noise=_step_noise(i))
            return (new_latents, carry[1], sstate), ()

        u0 = jnp.zeros((b, f, h, w, 4), latents.dtype)
        if cfg_cache and spec.cfg_cache_extrapolate:
            neg1 = jnp.full((), -1, jnp.int32)
            ustate0 = (u0, u0, neg1, neg1)
        else:
            ustate0 = (u0,)
        init_carry = (latents, ustate0,
                      solver.init_state((b, f, h, w, 4), latents.dtype))
        (latents, _, _), _ = jax.lax.scan(step, init_carry, jnp.arange(S))
        return latents

    def _denoise_pab(self, params, latents, cond, spec, sched, build_x,
                     _step_noise, do_cfg, mult):
        """PAB-style denoise loop (OPT-IN approximation, models/pab.py).

        The reuse schedule is static: step positions are unrolled over one
        period (lcm of the intervals) inside a ``lax.scan`` over periods, so
        every step variant compiles to a UNet with the reused attention
        sublayers *actually removed*; the attention cache (the "pab" flax
        collection) is threaded as part of the scan carry. Leftover steps
        after the last full period run as exact full-compute steps.
        """
        import dataclasses as _dc
        import math

        from followyourclick_tpu.models.pab import PabMode
        from followyourclick_tpu.models.unet3d import UNet3DConditionModel

        b, f, h, w = latents.shape[:4]
        S = spec.num_inference_steps
        intervals = dict(spatial=max(1, spec.pab_spatial_interval),
                         cross=max(1, spec.pab_cross_interval),
                         temporal=max(1, spec.pab_temporal_interval),
                         deep=max(1, spec.deep_cache_interval))
        cfg_k = (spec.cfg_cache_interval
                 if do_cfg and spec.cfg_cache_interval > 1 else 1)
        period = math.lcm(cfg_k, *intervals.values())
        deep_ex = (spec.deep_cache_extrapolate and intervals["deep"] > 1)
        rec = PabMode(record_spatial=intervals["spatial"] > 1,
                      record_cross=intervals["cross"] > 1,
                      record_temporal=intervals["temporal"] > 1,
                      record_deep=intervals["deep"] > 1,
                      deep_extrapolate=deep_ex)

        def mode_at(j: int, half: bool = False) -> PabMode:
            # deep_ex_coeff = age/interval: the static first-order forecast
            # ratio for this period position (models/pab.py _deep_ex_site).
            # The period body unrolls positions anyway, so per-position
            # constants add no step-variant compile cost.
            return _dc.replace(
                rec, half=half,
                reuse_spatial=(intervals["spatial"] > 1
                               and j % intervals["spatial"] != 0),
                reuse_cross=(intervals["cross"] > 1
                             and j % intervals["cross"] != 0),
                reuse_temporal=(intervals["temporal"] > 1
                                and j % intervals["temporal"] != 0),
                reuse_deep=(intervals["deep"] > 1
                            and j % intervals["deep"] != 0),
                deep_ex_coeff=((j % intervals["deep"]) / intervals["deep"]
                               if deep_ex else 0.0))

        unets = {}

        def unet_for(mode: PabMode) -> UNet3DConditionModel:
            if mode not in unets:
                unets[mode] = UNet3DConditionModel(self.config.unet, pab=mode,
                                                   dtype=self.dtype)
            return unets[mode]

        # UNetConditioning restricted to the cond half of the CFG batch
        cond_half = jax.tree_util.tree_map(
            lambda a: a[b:] if hasattr(a, "shape")
            and a.shape[:1] == (2 * b,) else a, cond)

        # cfg_cache_extrapolate: thread (u1, u0, i1, i0) through the schedule
        # so reused steps apply the first-order uncond forecast (see step())
        extrap = spec.cfg_cache_extrapolate and cfg_k > 1

        def pab_step(latents, cache, ustate, i, j: int):
            t = sched.timesteps[i]
            full = j % cfg_k == 0
            if full:
                x = build_x(latents)
                noise_pred, mut = unet_for(mode_at(j)).apply(
                    {"params": params["unet"], "pab": cache},
                    x, jnp.broadcast_to(t, (b * mult,)), cond,
                    mutable=["pab"])
                if do_cfg:
                    uncond_pred, text_pred = jnp.split(noise_pred, 2, axis=0)
                    if extrap:
                        u1, _, i1, _ = ustate
                        first = i1 < 0  # no prior refresh: slope = 0
                        ustate = (uncond_pred,
                                  jnp.where(first, uncond_pred, u1),
                                  jnp.asarray(i, jnp.int32),
                                  jnp.where(first, i, i1))
                    else:
                        ustate = (uncond_pred,)
                    noise_pred = uncond_pred + spec.guidance_scale * (
                        text_pred - uncond_pred)
            else:
                # cond-half-only UNet step against the cached uncond branch
                # (static composition of cfg_cache_interval with PAB)
                x = build_x(latents)[b:]
                text_pred, mut = unet_for(mode_at(j, half=True)).apply(
                    {"params": params["unet"], "pab": cache},
                    x, jnp.broadcast_to(t, (b,)), cond_half,
                    mutable=["pab"])
                if extrap:
                    u1, u0, i1, i0 = ustate
                    gap = jnp.maximum(i1 - i0, 1).astype(jnp.float32)
                    age = (jnp.asarray(i, jnp.int32) - i1).astype(jnp.float32)
                    u_use = (u1.astype(jnp.float32)
                             + (u1.astype(jnp.float32)
                                - u0.astype(jnp.float32)) * (age / gap)
                             ).astype(u1.dtype)
                else:
                    u_use = ustate[0]
                noise_pred = u_use + spec.guidance_scale * (
                    text_pred - u_use)
            new_latents, _ = ddim_step(sched, noise_pred, i, latents,
                                       eta=spec.eta, noise=_step_noise(i))
            # merge over the carried cache: a trunk-reuse step (reuse_deep)
            # never executes the trunk-interior attention sites, so its
            # mutated collection is a SUBTREE of the full cache — entries it
            # did not touch carry forward unchanged, keeping the scan-carry
            # tree structure identical across step variants
            return new_latents, _merge_cache(cache, dict(mut["pab"])), ustate

        # zero-init cache with the record variant's collection structure —
        # position 0 of every period recomputes all kinds, so the zeros are
        # never read
        x0 = build_x(latents)
        t0 = jnp.zeros((b * mult,), sched.timesteps.dtype)
        _, pab_shapes = jax.eval_shape(
            lambda p, x, t: unet_for(mode_at(0)).apply(
                {"params": p}, x, t, cond, mutable=["pab"]),
            params["unet"], x0, t0)
        cache0 = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            _as_plain_dict(pab_shapes["pab"]))
        u0 = jnp.zeros((b, f, h, w, 4), latents.dtype)
        if extrap:
            neg1 = jnp.full((), -1, jnp.int32)
            uncond0 = (u0, u0, neg1, neg1)
        else:
            uncond0 = (u0,)

        # with CFG caching composed in, keep the last cfg_final_exact_steps
        # steps exact (mirrors the exact path's recompute guard)
        final_exact = (min(max(0, spec.cfg_final_exact_steps), S)
                       if cfg_k > 1 else 0)
        warmup = min(max(0, spec.pab_warmup_steps), S - final_exact)
        body = S - warmup - final_exact
        n_periods = body // period
        # leftover body steps run as a PREFIX of the period schedule
        # (j = 0..tail-1): position 0 is a full record step, the rest follow
        # their phase — strictly less compute than the former all-exact tail
        # at ZERO extra compile cost (the prefix positions reuse the same
        # (mode, half) UNet bodies the period loop already compiled)
        tail = body - n_periods * period

        cache, uncond = cache0, uncond0
        for j in range(warmup):  # exact full-compute warmup steps
            latents, cache, uncond = pab_step(latents, cache, uncond,
                                              jnp.asarray(j), 0)

        def period_body(carry, ip):
            latents, cache, uncond = carry
            for j in range(period):
                latents, cache, uncond = pab_step(latents, cache, uncond,
                                                  ip + j, j)
            return (latents, cache, uncond), ()

        (latents, cache, uncond), _ = jax.lax.scan(
            period_body, (latents, cache, uncond),
            warmup + jnp.arange(n_periods) * period)
        for j in range(tail):  # period-prefix phase positions
            latents, cache, uncond = pab_step(
                latents, cache, uncond,
                jnp.asarray(warmup + n_periods * period + j), j)
        for j in range(final_exact):  # trailing exact full-CFG steps
            latents, cache, uncond = pab_step(
                latents, cache, uncond,
                jnp.asarray(warmup + n_periods * period + tail + j), 0)
        return latents

    def decode_latents(self, params, latents: jnp.ndarray,
                       frame_chunk: int = 0) -> jnp.ndarray:
        """(B, F, h, w, 4) → video (B, F, H, W, 3) in [0, 1] (reference
        decode_latents :400-413 — the reference loops frames on the host to
        bound torch memory; one batched decode keeps the conv pipeline full).

        ``frame_chunk=0`` (default) decodes all B·F frames as ONE batch —
        measured on v5e at 512²/16f: 0.27 s vs 0.44 s for the frame-scanned
        path (the ``lax.map`` slicing/stacking costs ~0.16 s of pure data
        movement). Positive values decode ``frame_chunk`` frames per
        rematerialized scan step — use for long clips / large batches where
        the batched decoder working set would not fit HBM alongside the rest
        of the program.
        """
        b, f = latents.shape[:2]
        z = latents.astype(self.dtype) / VAE_SCALE
        if frame_chunk <= 0:
            img = self.vae.apply({"params": params["vae"]},
                                 z.reshape(b * f, *z.shape[2:]),
                                 method=self.vae.decode)
            video = img.reshape(b, f, *img.shape[1:])
            return jnp.clip(video / 2.0 + 0.5, 0.0, 1.0).astype(jnp.float32)
        chunk = max(1, min(frame_chunk, f))
        pad = (-f) % chunk
        zf = z.transpose(1, 0, 2, 3, 4)  # (F, B, h, w, 4)
        if pad:
            zf = jnp.concatenate([zf, zf[:pad]], axis=0)
        zc = zf.reshape(-1, chunk * b, *zf.shape[2:])

        @jax.checkpoint
        def decode_chunk(z_c):
            return self.vae.apply({"params": params["vae"]}, z_c,
                                  method=self.vae.decode)

        frames = jax.lax.map(decode_chunk, zc)
        frames = frames.reshape(-1, b, *frames.shape[2:])[: f]
        video = frames.transpose(1, 0, 2, 3, 4)
        return jnp.clip(video / 2.0 + 0.5, 0.0, 1.0).astype(jnp.float32)

    # ------------------------------------------------------------------
    def _dp(self, x):
        """Pin the clip axis to the mesh's data axis (batched serving,
        BASELINE config 5). Params sharded via parallel.sharding.shard_params
        drive the TP partitioning; this constraint anchors DP so GSPMD
        propagates batch sharding through the denoise scan."""
        if self.mesh is None or x is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec

        spec = PartitionSpec("data", *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, spec))

    @functools.partial(jax.jit, static_argnums=(0,), static_argnames=("spec",))
    def _sample_jit(self, params, input_ids, neg_input_ids, rng, spec,
                    first_image_latents=None, mask=None, fps=None,
                    motion_score=None, camera_motion_type=None,
                    partial_mask=None, ip_pixel_values=None,
                    t5_input_ids=None, t5_attention_mask=None,
                    t5_neg_input_ids=None, t5_neg_attention_mask=None):
        context = self.encode_prompt(params, input_ids, neg_input_ids)
        b = input_ids.shape[0]
        if ip_pixel_values is not None:
            # image-prompt tokens appended to the text sequence; attended
            # through the decoupled to_k_ip/to_v_ip path (attention.py)
            ip_tokens = self.encode_image_prompt(params, ip_pixel_values)
            context = jnp.concatenate(
                [context, ip_tokens.astype(context.dtype)], axis=1)
        context_t5 = None
        if t5_input_ids is not None:
            context_t5 = self.encode_prompt_t5(
                params, t5_input_ids, t5_attention_mask,
                t5_neg_input_ids, t5_neg_attention_mask)
        if spec.eta > 0 or spec.scheduler == "euler_a":
            # stochastic samplers (DDIM eta>0, Euler-Ancestral) draw fresh
            # per-step noise inside the scan
            noise_rng, eta_rng = jax.random.split(rng)
        else:  # keep round-1 seed→noise mapping when deterministic
            noise_rng, eta_rng = rng, None
        latents = self.prepare_latents(
            noise_rng, b, spec,
            init_latents=(first_image_latents
                          if spec.use_first_image_as_init_latents else None))
        latents = self._dp(latents)
        latents = self.denoise(
            params, latents, context, spec,
            first_image_latents=first_image_latents, mask=mask,
            partial_mask=partial_mask, fps=fps,
            motion_score=motion_score, camera_motion_type=camera_motion_type,
            context_t5=context_t5, rng=eta_rng)
        return self.decode_latents(params, latents)

    def __call__(
        self,
        prompt: Sequence[str] | str,
        negative_prompt: Optional[Sequence[str] | str] = None,
        spec: SampleSpec = SampleSpec(),
        first_image_latents=None,
        mask=None,
        fps: float | None = 8.0,
        motion_score: float | None = 20.0,
        camera_motion_type: float | None = None,
        seed: int = 0,
        ip_image=None,
        partial_mask=None,
    ) -> np.ndarray:
        """End-to-end: prompts (+ image latents + click mask + optional
        condition image for IP-Adapter) → video array (B, F, H, W, 3)
        float32 in [0, 1].

        ``ip_image``: CLIP-preprocessed pixel values (B, 224, 224, 3); built
        host-side with ``utils.video_io.clip_preprocess_image``.
        """
        if isinstance(prompt, str):
            prompt = [prompt]
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        input_ids, neg_ids = self.tokenize(prompt, negative_prompt)
        b = input_ids.shape[0]

        t5_kwargs = {}
        if self.t5 is not None and self.config.unet.use_text_encoder_2:
            ids2, m2, nids2, nm2 = self.tokenize_2(prompt, negative_prompt)
            t5_kwargs = dict(
                t5_input_ids=jnp.asarray(ids2),
                t5_attention_mask=jnp.asarray(m2),
                t5_neg_input_ids=jnp.asarray(nids2),
                t5_neg_attention_mask=jnp.asarray(nm2))

        ip_kwargs = {}
        if ip_image is not None:
            assert self.ip_adapter is not None, (
                "pass ip_adapter_params to the pipeline to use ip_image")
            ip_kwargs = dict(ip_pixel_values=jnp.asarray(ip_image))
        elif self.config.unet.use_ip_cross_attention:
            raise ValueError(
                "unet.use_ip_cross_attention is on: the attention layers "
                "treat the last ip_num_tokens of the context as image tokens, "
                "so an ip_image (CLIP pixel values) is required")

        def bcast(v):
            if v is None:
                return None
            return jnp.full((b,), v, dtype=jnp.float32)

        fps_arr = bcast(fps) if self.config.unet.use_fps_condition else None
        ms_arr = (bcast(motion_score)
                  if self.config.unet.use_fps_condition else None)
        cam_arr = (bcast(camera_motion_type)
                   if self.config.unet.use_camera_motion_condition else None)

        video = self._sample_jit(
            self.params, jnp.asarray(input_ids), jnp.asarray(neg_ids),
            jax.random.PRNGKey(seed), spec,
            first_image_latents=first_image_latents, mask=mask,
            fps=fps_arr, motion_score=ms_arr, camera_motion_type=cam_arr,
            partial_mask=partial_mask, **ip_kwargs, **t5_kwargs)
        return np.asarray(video)
