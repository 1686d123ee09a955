"""Benchmark harness — prints ONE JSON line with the driver metric.

Workload (BASELINE.md): one 16-frame 512×512 clip, 25 DDIM steps, CFG on
(2× UNet evals/step), bf16, single chip — the full jitted pipeline
(CLIP text encode → fused denoise scan → frame-scanned VAE decode).

vs_baseline: the reference publishes no numbers (BASELINE.json
``published: {}``). We compare against an estimated PyTorch+xformers A100
figure for the same workload: ~15 s/clip → ~1.07 frames/s (50 UNet fwd at
~250 ms + ~2 s VAE/overhead). The driver target is ≥5× that per chip.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_BASELINE_FPS = 1.07  # estimated reference throughput (see docstring)


def _zeros_like_tree(tree):
    return jax.tree_util.tree_map(lambda x: jnp.zeros(x.shape, x.dtype), tree)


def main():
    from followyourclick_tpu.config import InferenceConfig
    from followyourclick_tpu.models.clip_text import CLIPTextModel
    from followyourclick_tpu.models.unet3d import (
        UNet3DConditionModel,
        UNetConditioning,
    )
    from followyourclick_tpu.models.vae import AutoencoderKL
    from followyourclick_tpu.schedulers.ddim import DDIMSchedule, ddim_step

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    cfg = InferenceConfig()
    if on_tpu:
        frames, height, width, steps = 16, 512, 512, 25
    else:  # CPU sanity fallback (config 1): tiny workload
        frames, height, width, steps = 8, 256, 256, 3

    unet = UNet3DConditionModel(cfg.unet, dtype=dtype)
    vae = AutoencoderKL(cfg.vae, dtype=dtype)
    text = CLIPTextModel(cfg.clip_text, dtype=dtype)

    b = 1
    h, w = height // 8, width // 8
    rng = jax.random.PRNGKey(0)

    ids = jnp.zeros((b, 77), jnp.int32)
    sample = jnp.zeros((2 * b, frames, h, w, 9), dtype)
    tsteps = jnp.zeros((2 * b,), jnp.int32)
    cond_shape = UNetConditioning(
        context=jnp.zeros((2 * b, 77, 768), dtype),
        fps=jnp.full((2 * b,), 8.0), motion_score=jnp.full((2 * b,), 20.0))

    unet_params = _zeros_like_tree(
        jax.eval_shape(unet.init, rng, sample, tsteps, cond_shape))
    vae_params = _zeros_like_tree(
        jax.eval_shape(vae.init, rng, jnp.zeros((1, height, width, 3), dtype),
                       rng))
    text_params = _zeros_like_tree(jax.eval_shape(text.init, rng, ids))

    sched = DDIMSchedule.create(cfg.noise_scheduler, steps)
    mask = jnp.ones((b, h, w, 1), dtype)
    first_latent = jnp.zeros((b, h, w, 4), dtype)

    @jax.jit
    def clip_pipeline(unet_params, vae_params, text_params, ids, neg_ids,
                      rng):
        ctx_c, _ = text.apply(text_params, ids)
        ctx_u, _ = text.apply(text_params, neg_ids)
        context = jnp.concatenate([ctx_u, ctx_c], axis=0)
        cond = UNetConditioning(context=context,
                                fps=jnp.full((2 * b,), 8.0),
                                motion_score=jnp.full((2 * b,), 20.0))
        noise = jax.random.normal(rng, (b, 1, h, w, 4), dtype=jnp.float32)
        latents = jnp.broadcast_to(noise, (b, frames, h, w, 4)).astype(dtype)

        frame_idx = jnp.arange(frames)[None, :, None, None, None]
        first_block = jnp.where(frame_idx == 0, first_latent[:, None], 0.0)
        first_block = jnp.broadcast_to(first_block, (b, frames, h, w, 4))
        mask_block = jnp.broadcast_to(mask[:, None], (b, frames, h, w, 1))
        cond_channels = jnp.concatenate([mask_block, first_block], axis=-1)
        cond_channels2 = jnp.concatenate([cond_channels] * 2, axis=0)

        def step(lat, i):
            x = jnp.concatenate([lat, cond_channels], axis=-1)
            x2 = jnp.concatenate([x] * 2, axis=0)
            t = jnp.broadcast_to(sched.timesteps[i], (2 * b,))
            pred = unet.apply(unet_params, x2, t, cond)
            u, c = jnp.split(pred, 2, axis=0)
            pred = u + 8.0 * (c - u)
            new, _ = ddim_step(sched, pred, i, lat)
            return new.astype(dtype), ()

        latents, _ = jax.lax.scan(step, latents, jnp.arange(steps))

        z = latents / 0.18215
        # one frame per scan step: measured faster than chunked decode at
        # 512² on v5e (0.53 s vs 0.87 s for 16 frames — activation pressure)
        @jax.checkpoint
        def decode_frame(z_f):
            return vae.apply(vae_params, z_f, method=vae.decode)

        video = jax.lax.map(decode_frame, z.transpose(1, 0, 2, 3, 4))
        video = jnp.clip(video.transpose(1, 0, 2, 3, 4) / 2 + 0.5, 0, 1)
        # scalar checksum: forces full execution through the axon relay,
        # whose block_until_ready does not actually block
        return video, jnp.sum(video)

    neg_ids = jnp.zeros_like(ids)
    # warmup/compile
    _, checksum = clip_pipeline(unet_params, vae_params, text_params, ids,
                                neg_ids, rng)
    float(checksum)

    n_iters = 3 if on_tpu else 1
    times = []
    for i in range(n_iters):
        t0 = time.perf_counter()
        _, checksum = clip_pipeline(unet_params, vae_params, text_params,
                                    ids, neg_ids, jax.random.PRNGKey(i + 1))
        float(checksum)  # force execution (see warmup note)
        times.append(time.perf_counter() - t0)

    p50 = float(np.median(times))
    fps = frames * b / p50
    print(json.dumps({
        "metric": "frames_per_sec_per_chip_16f_512px_25step",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / A100_BASELINE_FPS, 3),
        "p50_clip_latency_s": round(p50, 3),
        "workload": f"{frames}f_{height}px_{steps}steps_cfg",
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
