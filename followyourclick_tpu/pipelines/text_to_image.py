"""Text-to-image pipeline — generates the first frame when no input image is
given (reference ``scripts/inference.py:194-204`` spins up a base
StableDiffusionPipeline; ``inference_org.py`` / ``inference_w_image_cond.py``
use it to synthesize the frame that then conditions the video model).

TPU design: reuses the UNet3D as a 2D SD UNet (motion modules off,
``video_length=1``) — the same weights, no separate model class. Denoise +
decode run as one jitted scan like the video pipeline.
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
from followyourclick_tpu.schedulers.ddim import DDIMSchedule, ddim_step


def slice_conv_in(unet_params, in_channels: int = 4):
    """Video-UNet params → T2I params: cut the widened conv_in kernel back to
    its first ``in_channels`` input channels (the inverse of the 2D→3D
    inflation, reference unet.py:709-717 — channels 0..3 hold the 2D conv)."""
    import jax

    params = jax.tree_util.tree_map(lambda x: x, unet_params)
    node = params["conv_in"]["conv"]
    kernel = node["kernel"]
    if kernel.shape[2] > in_channels:
        node["kernel"] = kernel[:, :, :in_channels]
    return params


class TextToImagePipeline:
    """Standard SD text→image sampling with the 4-channel 2D UNet config.

    ``unet_params`` may be the video pipeline's (9-channel conv_in) params —
    they are sliced back to 4 input channels automatically."""

    def __init__(self, config: InferenceConfig, unet_params, vae_params,
                 text_encoder_params, tokenizer=None, dtype=jnp.float32):
        cin = unet_params.get("conv_in", {}).get("conv", {}).get("kernel")
        if cin is not None and cin.shape[2] != 4:
            unet_params = slice_conv_in(unet_params, 4)
        ucfg = dataclasses.replace(
            config.unet, use_motion_module=False,
            use_first_frame_mask_condition_concat=False,
            use_first_frame_condition_concat=False,
            use_fps_condition=False,
            use_ip_cross_attention=False)
        self.config = config
        self.dtype = dtype
        self.unet = UNet3DConditionModel(ucfg, dtype=dtype)
        self.vae = AutoencoderKL(config.vae, dtype=dtype)
        self.text_encoder = CLIPTextModel(config.clip_text, dtype=dtype)
        self.params = {"unet": unet_params, "vae": vae_params,
                       "text_encoder": text_encoder_params}
        self.tokenizer = tokenizer

    @functools.partial(jax.jit, static_argnums=(0, 4, 5, 6, 7))
    def _sample(self, params, input_ids, neg_ids, rng_seed: int,
                height: int, width: int, steps: int,
                guidance_scale: float = 7.5):
        rng = jax.random.PRNGKey(rng_seed)
        cond_ctx, _ = self.text_encoder.apply(
            {"params": params["text_encoder"]}, input_ids)
        uncond_ctx, _ = self.text_encoder.apply(
            {"params": params["text_encoder"]}, neg_ids)
        context = jnp.concatenate([uncond_ctx, cond_ctx], axis=0)

        b = input_ids.shape[0]
        h, w = height // 8, width // 8
        sched = DDIMSchedule.create(self.config.noise_scheduler, steps)
        latents = jax.random.normal(rng, (b, 1, h, w, 4), dtype=jnp.float32)
        cond = UNetConditioning(context=context.astype(self.dtype))

        def step(lat, i):
            x = jnp.concatenate([lat] * 2, axis=0).astype(self.dtype)
            t = jnp.broadcast_to(sched.timesteps[i], (2 * b,))
            pred = self.unet.apply({"params": params["unet"]}, x, t, cond)
            u, c = jnp.split(pred, 2, axis=0)
            pred = u + guidance_scale * (c - u)
            new, _ = ddim_step(sched, pred, i, lat)
            return new, ()

        latents, _ = jax.lax.scan(step, latents, jnp.arange(steps))
        img = self.vae.apply({"params": params["vae"]},
                             (latents[:, 0] / VAE_SCALE).astype(self.dtype),
                             method=self.vae.decode)
        return jnp.clip(img / 2 + 0.5, 0.0, 1.0).astype(jnp.float32)

    def __call__(self, prompt: Sequence[str] | str,
                 negative_prompt: Optional[Sequence[str] | str] = None,
                 height: int = 512, width: int = 512, steps: int = 25,
                 guidance_scale: float = 7.5, seed: int = 0) -> np.ndarray:
        if isinstance(prompt, str):
            prompt = [prompt]
        if negative_prompt is None:
            negative_prompt = [""] * len(prompt)
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        enc = self.tokenizer(list(prompt), padding="max_length", max_length=77,
                             truncation=True, return_tensors="np")
        neg = self.tokenizer(list(negative_prompt), padding="max_length",
                             max_length=77, truncation=True,
                             return_tensors="np")
        img = self._sample(self.params, jnp.asarray(enc.input_ids),
                           jnp.asarray(neg.input_ids), seed, height, width,
                           steps, guidance_scale)
        return np.asarray(img)
