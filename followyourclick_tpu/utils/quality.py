"""Serving-schedule quality/throughput harness.

Measures end-to-end output drift of the opt-in serving approximations
(PAB attention reuse ∘ CFG-uncond caching, arXiv 2408.12588 framing)
against the exact sampler, and models per-schedule step-cost so candidate
schedules can be Pareto-ranked on CPU before paying a TPU cold compile.

Used by tools/serving_sweep.py and tests/test_pab.py; results tables live
in docs/PERF.md "Serving quality budget".
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def tiny_unet_cfg():
    from followyourclick_tpu.config import MotionModuleConfig, UNet3DConfig

    return UNet3DConfig(
        sample_size=32, cross_attention_dim=768, attention_head_dim=8,
        block_out_channels=(32, 64, 64, 64), layers_per_block=1,
        norm_num_groups=8,
        motion_module=MotionModuleConfig(num_attention_heads=4),
        use_fps_condition=True,
        use_first_frame_mask_condition_concat=True)


def build_quality_pipeline(size: str = "tiny", dtype=jnp.float32,
                           seed: int = 0):
    """Random-init pipeline for drift measurement (NOT zeros — a zeroed UNet
    collapses all schedules to identical output). ``size='flagship'`` builds
    the real 1.28B-param config (init on-device; bf16 on TPU)."""
    from followyourclick_tpu.config import (
        CLIPTextConfig,
        InferenceConfig,
        VAEConfig,
    )
    from followyourclick_tpu.models.unet3d import UNetConditioning
    from followyourclick_tpu.pipelines.animation import AnimationPipeline

    if size == "tiny":
        cfg = InferenceConfig(
            unet=tiny_unet_cfg(),
            vae=VAEConfig(block_out_channels=(32, 64, 64, 64),
                          layers_per_block=1, norm_num_groups=8,
                          sample_size=64),
            clip_text=CLIPTextConfig(vocab_size=1000, hidden_size=768,
                                     intermediate_size=512,
                                     num_hidden_layers=2,
                                     num_attention_heads=4))
        f, hw, px = 2, 16, 128
    elif size == "flagship":
        cfg = InferenceConfig()
        f, hw, px = 16, 32, 512  # init shapes only; sampling shape is free
    else:
        raise ValueError(size)

    pipe = AnimationPipeline(cfg, None, None, None, dtype=dtype)
    rng = jax.random.PRNGKey(seed)
    b = 1
    ids = jnp.zeros((b, 77), jnp.int32)
    sample = jnp.zeros((2 * b, f, hw, hw, 9), dtype)
    tsteps = jnp.zeros((2 * b,), jnp.int32)
    cond = UNetConditioning(
        context=jnp.zeros((2 * b, 77, cfg.unet.cross_attention_dim), dtype),
        fps=jnp.full((2 * b,), 8.0), motion_score=jnp.full((2 * b,), 20.0))
    k_unet, k_vae, k_txt = jax.random.split(rng, 3)
    pipe.params = {
        "unet": pipe.unet.init(k_unet, sample, tsteps, cond)["params"],
        "vae": pipe.vae.init(k_vae, jnp.zeros((1, px, px, 3), dtype),
                             k_vae)["params"],
        "text_encoder": pipe.text_encoder.init(k_txt, ids)["params"],
    }
    if dtype != jnp.float32:
        pipe.params = jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, pipe.params)
    return pipe


def run_schedule(pipe, spec, frames: int, latent_hw: Tuple[int, int],
                 seed: int = 3) -> np.ndarray:
    """One _sample_jit run with random-but-fixed conditioning inputs."""
    h, w = latent_hw
    dtype = pipe.dtype
    first = (jax.random.normal(jax.random.PRNGKey(7), (1, h, w, 4)) * 0.2
             ).astype(dtype)
    mask = (jax.random.uniform(jax.random.PRNGKey(8), (1, h, w, 1))
            > 0.5).astype(dtype)
    prompt_ids = jax.random.randint(jax.random.PRNGKey(9), (1, 77), 0, 1000)
    neg_ids = jnp.zeros((1, 77), jnp.int32)
    out = pipe._sample_jit(
        pipe.params, prompt_ids, neg_ids, jax.random.PRNGKey(seed), spec,
        first_image_latents=first, mask=mask,
        fps=jnp.full((1,), 8.0), motion_score=jnp.full((1,), 20.0))
    return np.asarray(out, dtype=np.float32)


def drift_metrics(approx: np.ndarray, exact: np.ndarray) -> Dict[str, float]:
    diff = approx - exact
    rel_l2 = float(np.linalg.norm(diff) / (np.linalg.norm(exact) + 1e-12))
    psnr = 10 * math.log10(1.0 / max(float(np.mean(diff ** 2)), 1e-20))
    return {"rel_l2": round(rel_l2, 4), "psnr_db": round(psnr, 2)}


# ── step-cost model for Pareto ranking without a TPU compile ─────────────
#
# v5e flagship step costs FIT from the round-4 measured p50s (docs/PERF.md
# "Serving approximations"): exact 8.382 s, cfg_cache3 5.965, pab244_cfg4
# 4.946, pab244_deep2_cfg4_w2 4.809, pab244_deep4_cfg4_w2 4.461 — the
# five schedules give a consistent least-squares solution for the six step
# classes + fixed overhead (residual < 5 ms).
STEP_COST_MS = {
    "full": 330.0,      # full CFG, record-all (non-prefix-shared PAB body)
    "half_exact": 169.0,  # cond-half, no PAB reuse (plain cfg_cache body)
    "half_sp": 150.0,   # cond-half, spatial recomputed, temporal/cross reused
    "half_all": 116.0,  # cond-half, all attention kinds reused
    # DeepCache trunk-reuse variants (deep_cache_interval > 1): only the
    # outermost UNet level runs (conv_in, down block 0, last up block).
    "full_deep": 190.0,    # full CFG, trunk reused (not yet measured;
    # 2×half_sp_deep + record overhead — no shipped schedule hits it)
    "half_sp_deep": 80.0,  # cond-half, trunk reused, level-0 spatial fresh
    "half_all_deep": 63.0,  # cond-half, trunk + all attention reused
}
FIXED_OVERHEAD_MS = 132.0  # VAE decode + text/noise prep (in-program the
# decode overlaps far better than its 250 ms standalone time)


def schedule_step_classes(spec) -> Dict[str, int]:
    """Simulate the sampler's static schedule; count steps per cost class.
    Mirrors _denoise_pab's warmup/period/tail-prefix/final-exact structure
    exactly (pipelines/animation.py)."""
    S = spec.num_inference_steps
    deep_k = max(1, getattr(spec, "deep_cache_interval", 1))
    intervals = dict(spatial=max(1, spec.pab_spatial_interval),
                     cross=max(1, spec.pab_cross_interval),
                     temporal=max(1, spec.pab_temporal_interval),
                     deep=deep_k)
    cfg_k = spec.cfg_cache_interval if spec.cfg_cache_interval > 1 else 1
    pab_on = any(v > 1 for v in intervals.values())

    if not pab_on and cfg_k == 1:
        return {"full": S, "half_exact": 0, "half_sp": 0, "half_all": 0}
    if not pab_on:  # plain cfg_cache scan path
        fe = min(max(0, spec.cfg_final_exact_steps), S)
        n_full = sum(1 for i in range(S) if i % cfg_k == 0 or i >= S - fe)
        return {"full": n_full, "half_exact": S - n_full,
                "half_sp": 0, "half_all": 0}

    period = math.lcm(cfg_k, *intervals.values())
    fe = min(max(0, spec.cfg_final_exact_steps), S) if cfg_k > 1 else 0
    warmup = min(max(0, spec.pab_warmup_steps), S - fe)
    body = S - warmup - fe
    n_periods = body // period
    tail = body - n_periods * period

    phases = [0] * warmup
    for _ in range(n_periods):
        phases += list(range(period))
    phases += list(range(tail))
    phases += [0] * fe

    counts = {"full": 0, "half_exact": 0, "half_sp": 0, "half_all": 0}
    if deep_k > 1:
        counts.update({"full_deep": 0, "half_sp_deep": 0,
                       "half_all_deep": 0})
    for j in phases:
        deep = deep_k > 1 and j % deep_k != 0
        suffix = "_deep" if deep else ""
        if j % cfg_k == 0:
            counts["full" + suffix] += 1
        else:
            reuse_sp = intervals["spatial"] > 1 and j % intervals["spatial"]
            if reuse_sp:
                counts["half_all" + suffix] += 1
            else:
                counts["half_sp" + suffix] += 1
    assert sum(counts.values()) == S
    return counts


def estimate_clip_seconds(spec) -> float:
    counts = schedule_step_classes(spec)
    ms = sum(STEP_COST_MS[k] * n for k, n in counts.items())
    return (ms + FIXED_OVERHEAD_MS) / 1e3


def estimate_fps(spec, frames: int = 16) -> float:
    return frames / estimate_clip_seconds(spec)
