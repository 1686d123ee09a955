"""Stable-Diffusion text-guided inpainting pipeline (masked-latent blending).

Behavior spec: reference ``Inpaint-Anything/stable_diffusion_inpaint.py``
(fill_img_with_sd / replace_img_with_sd drive a diffusers
StableDiffusionInpaintPipeline on the 512-crop produced by brush_utils) and
the vendored legacy inpaint mechanics
(``diffusers/pipelines/stable_diffusion/pipeline_stable_diffusion_inpaint_legacy.py``:
at every step the un-masked region is replaced by the init latents noised to
the current timestep, so any standard SD checkpoint inpaints without the
9-channel inpaint UNet).

TPU design: the whole denoise loop, including the per-step add_noise blend,
is one jitted ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from followyourclick_tpu.config import InferenceConfig
from followyourclick_tpu.models.clip_text import CLIPTextModel
from followyourclick_tpu.models.unet3d import UNet3DConditionModel, UNetConditioning
from followyourclick_tpu.models.vae import AutoencoderKL
from followyourclick_tpu.pipelines.animation import VAE_SCALE
from followyourclick_tpu.schedulers.ddim import DDIMSchedule, add_noise, ddim_step


class InpaintPipeline:
    """image (B,H,W,3 in [0,1]) + mask (B,h,w,1 latent-res, 1=repaint) +
    prompt → inpainted image."""

    def __init__(self, config: InferenceConfig, unet_params, vae_params,
                 text_encoder_params, tokenizer=None, dtype=jnp.float32):
        ucfg = dataclasses.replace(
            config.unet, use_motion_module=False,
            use_first_frame_mask_condition_concat=False,
            use_first_frame_condition_concat=False,
            use_fps_condition=False)
        self.config = config
        self.dtype = dtype
        self.unet = UNet3DConditionModel(ucfg, dtype=dtype)
        self.vae = AutoencoderKL(config.vae, dtype=dtype)
        self.text_encoder = CLIPTextModel(config.clip_text, dtype=dtype)
        self.params = {"unet": unet_params, "vae": vae_params,
                       "text_encoder": text_encoder_params}
        self.tokenizer = tokenizer

    @functools.partial(jax.jit, static_argnums=(0, 5, 6))
    def _sample(self, params, image, mask, input_ids_pair, rng_seed: int,
                steps: int, guidance_scale: float = 7.5):
        input_ids, neg_ids = input_ids_pair
        rng = jax.random.PRNGKey(rng_seed)
        cond_ctx, _ = self.text_encoder.apply(
            {"params": params["text_encoder"]}, input_ids)
        uncond_ctx, _ = self.text_encoder.apply(
            {"params": params["text_encoder"]}, neg_ids)
        context = jnp.concatenate([uncond_ctx, cond_ctx], axis=0)
        cond = UNetConditioning(context=context.astype(self.dtype))

        b = input_ids.shape[0]
        # init latents from the image (deterministic mode of the posterior)
        rng, noise_rng = jax.random.split(rng)
        mean, _ = self.vae.apply(
            {"params": params["vae"]},
            (image * 2.0 - 1.0).astype(self.dtype),
            method=self.vae.encode,
        )
        z0 = (mean * VAE_SCALE).astype(jnp.float32)

        sched = DDIMSchedule.create(self.config.noise_scheduler, steps)
        noise = jax.random.normal(noise_rng, z0.shape, jnp.float32)
        latents = noise  # start from pure noise (strength 1.0)
        mask = mask.astype(jnp.float32)

        def step(lat, i):
            x = jnp.concatenate([lat[:, None]] * 2, axis=0).astype(self.dtype)
            t = jnp.broadcast_to(sched.timesteps[i], (2 * b,))
            pred = self.unet.apply({"params": params["unet"]}, x, t, cond)
            u, c = jnp.split(pred[:, 0], 2, axis=0)
            pred = u + guidance_scale * (c - u)
            new, _ = ddim_step(sched, pred, i, lat)
            # re-noise the init latents to the PREVIOUS timestep and paste
            # them outside the mask (legacy-inpaint blending). On the final
            # step prev_t < 0 → keep z0 clean.
            prev_t = sched.timesteps[i] - (
                sched.cfg.num_train_timesteps // sched.num_inference_steps)
            init_prop = jnp.where(
                prev_t >= 0,
                add_noise(sched, z0, noise,
                          jnp.full((b,), jnp.maximum(prev_t, 0))),
                z0,
            )
            new = init_prop * (1.0 - mask) + new * mask
            return new, ()

        latents, _ = jax.lax.scan(step, latents, jnp.arange(steps))
        img = self.vae.apply({"params": params["vae"]},
                             (latents / VAE_SCALE).astype(self.dtype),
                             method=self.vae.decode)
        return jnp.clip(img / 2 + 0.5, 0.0, 1.0).astype(jnp.float32)

    def __call__(
        self,
        image: np.ndarray,              # (H, W, 3) uint8
        mask: np.ndarray,               # (H, W) {0,255} or bool, 1=repaint
        prompt: str,
        negative_prompt: str = "",
        steps: int = 25,
        guidance_scale: float = 7.5,
        seed: int = 0,
    ) -> np.ndarray:
        import cv2

        h, w = image.shape[:2]
        enc = self.tokenizer([prompt], padding="max_length", max_length=77,
                             truncation=True, return_tensors="np")
        neg = self.tokenizer([negative_prompt], padding="max_length",
                             max_length=77, truncation=True,
                             return_tensors="np")
        img = image.astype(np.float32)[None] / 255.0
        m = (np.asarray(mask) > 0).astype(np.float32)
        m_lat = cv2.resize(m, (w // 8, h // 8),
                           interpolation=cv2.INTER_NEAREST)
        out = self._sample(
            self.params, jnp.asarray(img),
            jnp.asarray(m_lat)[None, ..., None],
            (jnp.asarray(enc.input_ids), jnp.asarray(neg.input_ids)),
            seed, steps, guidance_scale,
        )
        out = (np.asarray(out[0]) * 255).astype(np.uint8)
        # hard-composite outside the pixel-space mask (the crop/paste helpers
        # do this too, but callers may use the pipeline directly)
        sel = m > 0
        res = image.copy()
        res[sel] = out[sel]
        return res
