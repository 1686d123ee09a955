"""Benchmark harness — prints ONE JSON line with the driver metric.

Workload (BASELINE.md): one 16-frame 512×512 clip, 25 DDIM steps, CFG on
(2× UNet evals/step), bf16, single chip — measured through the SHIPPED
pipeline entry (``AnimationPipeline._sample_jit``: CLIP text encode → fused
denoise scan with the 9-channel mask concat → frame-scanned VAE decode), so
any pipeline regression shows up in the driver metric.

The headline ``value`` is exact math (reference-parity CFG). The same JSON
line also reports the opt-in serving approximation (cfg_cache_interval=3,
the CFG-uncond caching family of Pyramid Attention Broadcast) as
``optin_*`` fields — NOT reference behavior, off by default in the pipeline.

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


def _zeros_like_tree(tree, dtype=None):
    """Shape-true zero params; float leaves cast to ``dtype`` (the serving
    path stores half-precision weights — see utils/precision.py)."""
    def mk(x):
        d = x.dtype
        if dtype is not None and jnp.issubdtype(d, jnp.floating):
            d = dtype
        return jnp.zeros(x.shape, d)
    return jax.tree_util.tree_map(mk, tree)


def build_pipeline(dtype):
    """Flagship-config pipeline with zeroed (shape-true) params."""
    from followyourclick_tpu.config import InferenceConfig
    from followyourclick_tpu.models.unet3d import UNetConditioning
    from followyourclick_tpu.pipelines.animation import AnimationPipeline

    cfg = InferenceConfig()
    pipe = AnimationPipeline(cfg, None, None, None, dtype=dtype)

    rng = jax.random.PRNGKey(0)
    b = 1
    ids = jnp.zeros((b, 77), jnp.int32)
    sample = jnp.zeros((2 * b, 4, 32, 32, 9), dtype)
    tsteps = jnp.zeros((2 * b,), jnp.int32)
    cond_shape = UNetConditioning(
        context=jnp.zeros((2 * b, 77, 768), dtype),
        fps=jnp.full((2 * b,), 8.0), motion_score=jnp.full((2 * b,), 20.0))
    pipe.params = {
        "unet": _zeros_like_tree(jax.eval_shape(
            pipe.unet.init, rng, sample, tsteps, cond_shape))["params"],
        "vae": _zeros_like_tree(jax.eval_shape(
            pipe.vae.init, rng, jnp.zeros((1, 64, 64, 3), dtype),
            rng))["params"],
        "text_encoder": _zeros_like_tree(jax.eval_shape(
            pipe.text_encoder.init, rng, ids))["params"],
    }
    if dtype != jnp.float32:
        pipe.params = _zeros_like_tree(pipe.params, dtype=dtype)
    return pipe


def time_spec(pipe, spec, b, n_iters):
    """Median wall time of the real pipeline program for one SampleSpec."""
    h, w = spec.height // 8, spec.width // 8
    dtype = pipe.dtype
    ids = jnp.zeros((b, 77), jnp.int32)
    neg_ids = jnp.zeros_like(ids)
    mask = jnp.ones((b, h, w, 1), dtype)
    first_latent = jnp.zeros((b, h, w, 4), dtype)

    @jax.jit
    def run(params, ids, neg_ids, rng):
        video = pipe._sample_jit(
            params, ids, neg_ids, rng, spec,
            first_image_latents=first_latent, mask=mask,
            fps=jnp.full((b,), 8.0), motion_score=jnp.full((b,), 20.0))
        # scalar checksum: forces full execution through the axon relay,
        # whose block_until_ready does not actually block
        return jnp.sum(video)

    float(run(pipe.params, ids, neg_ids, jax.random.PRNGKey(0)))  # compile
    times = []
    for i in range(n_iters):
        t0 = time.perf_counter()
        float(run(pipe.params, ids, neg_ids, jax.random.PRNGKey(i + 1)))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    from followyourclick_tpu.pipelines.animation import SampleSpec

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    if on_tpu:
        frames, height, width, steps, n_iters = 16, 512, 512, 25, 3
    else:  # CPU sanity fallback (config 1): tiny workload
        frames, height, width, steps, n_iters = 8, 256, 256, 3, 1

    pipe = build_pipeline(dtype)
    b = 1
    spec = SampleSpec(video_length=frames, height=height, width=width,
                      num_inference_steps=steps, guidance_scale=8.0,
                      use_interpolate_noise=True)

    p50 = time_spec(pipe, spec, b, n_iters)
    fps = frames * b / p50

    # opt-in serving approximation A: recompute the CFG uncond branch every
    # 3rd step (SampleSpec.cfg_cache_interval; NOT reference behavior)
    optin_spec = spec.replace(cfg_cache_interval=3)
    optin_p50 = time_spec(pipe, optin_spec, b, n_iters)
    optin_fps = frames * b / optin_p50

    # opt-in serving approximation B: PAB-style attention reuse — refresh
    # every attention kind every 2nd step (SampleSpec.pab_*_interval; NOT
    # reference behavior). A uniform interval keeps the period — and with it
    # the number of distinct UNet step-variant graphs XLA compiles — at 2.
    pab_spec = spec.replace(pab_spatial_interval=2, pab_temporal_interval=2,
                            pab_cross_interval=2)
    pab_p50 = time_spec(pipe, pab_spec, b, n_iters)
    pab_fps = frames * b / pab_p50

    # opt-in serving approximation C: PAB composed with static CFG-uncond
    # caching — cond-half-only UNet steps between uncond refreshes
    # (period-4 schedule: full / half+reuse / half+compute / half+reuse)
    stack_spec = pab_spec.replace(cfg_cache_interval=4)
    stack_p50 = time_spec(pipe, stack_spec, b, n_iters)
    stack_fps = frames * b / stack_p50

    print(json.dumps({
        "metric": "frames_per_sec_per_chip_16f_512px_25step",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / A100_BASELINE_FPS, 3),
        "p50_clip_latency_s": round(p50, 3),
        "optin_cfg_cache3_fps": round(optin_fps, 3),
        "optin_cfg_cache3_p50_s": round(optin_p50, 3),
        "optin_pab_222_fps": round(pab_fps, 3),
        "optin_pab_222_p50_s": round(pab_p50, 3),
        "optin_pab2_cfg4_fps": round(stack_fps, 3),
        "optin_pab2_cfg4_p50_s": round(stack_p50, 3),
        "workload": f"{frames}f_{height}px_{steps}steps_cfg",
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
