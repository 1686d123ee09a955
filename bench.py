"""Benchmark harness — prints the driver metric as a JSON line.

Workload (BASELINE.md): one 16-frame 512×512 clip, 25 DDIM steps, CFG on
(2× UNet evals/step), bf16, single chip — measured through the SHIPPED
pipeline entry (``AnimationPipeline._sample_jit``: CLIP text encode → fused
denoise scan with the 9-channel mask concat → frame-scanned VAE decode), so
any pipeline regression shows up in the driver metric.

Output protocol: the EXACT-math headline config is measured FIRST and its
JSON line is printed and flushed immediately — a driver timeout during the
later opt-in variants can no longer destroy the round's perf number
(round-2 failure mode: all four configs measured serially, single print at
the end, rc=124). Each opt-in variant that completes within the wall-clock
budget re-emits an UPDATED full JSON line; consumers should take the LAST
parseable line.

The headline ``value`` is exact math (reference-parity CFG). Opt-in serving
approximations (cfg-uncond caching, Pyramid Attention Broadcast) are
reported as ``optin_*`` fields — NOT reference behavior, off by default in
the pipeline. Cold compiles of the PAB/stacked step-variant graphs cost
8–16 min each through the remote-compile relay (docs/PERF.md), so:
  - each opt-in variant runs only if elapsed time leaves room in the budget
    (``FYC_BENCH_BUDGET_S``, default 1500 s; skipped ones are recorded in
    ``optin_skipped``);
  - variant order = value order (round-4 postmortem: the old order spent
    the whole budget on dominated lines and skipped the flagship serving
    schedules). The default run measures the TWO flagship composed
    schedules, best first: PAB-288 ∘ DeepCache-4 ∘ extrapolated cfg-cache
    (4.23 f/s measured) then PAB-244 ∘ DeepCache-4 ∘ extrapolated
    cfg-cache (the quality-bounded headline). Cold compiles are amortized
    by the persistent in-repo compile cache (utils/compile_cache.py).
    Dominated comparability lines (cfg_cache3, pab244_cfg4), the uniform
    PAB-2 variants, and the reference-default 100-step operating point are
    ``FYC_BENCH_FULL=1`` only. Per-variant compile/elapsed seconds are
    emitted so budget tuning is data-driven.

vs_baseline: the reference publishes no numbers (BASELINE.json
``published: {}``). We compare against an estimated PyTorch+xformers A100
figure for the same workload: ~15 s/clip → ~1.07 frames/s. The full
derivation with itemized assumptions and sensitivity bounds lives in
BASELINE.md, "The A100 denominator". The driver target is ≥5× that per chip.
"""

from __future__ import annotations

import json
import math
import os
import sys
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

    t_c0 = time.perf_counter()
    checksum = float(run(pipe.params, ids, neg_ids,
                         jax.random.PRNGKey(0)))  # compile
    compile_s = time.perf_counter() - t_c0
    # zero-param pipeline still must produce finite output — a NaN-producing
    # perf regression must not bench as a win (VERDICT r02 weak #6)
    assert math.isfinite(checksum), f"non-finite checksum: {checksum}"
    times = []
    for i in range(n_iters):
        t0 = time.perf_counter()
        c = float(run(pipe.params, ids, neg_ids, jax.random.PRNGKey(i + 1)))
        times.append(time.perf_counter() - t0)
        assert math.isfinite(c), f"non-finite checksum (iter {i}): {c}"
    return float(np.median(times)), checksum, compile_s


def main():
    import logging

    from followyourclick_tpu.pipelines.animation import SampleSpec
    from followyourclick_tpu.utils.compile_cache import enable as enable_cache

    cache_dir = enable_cache()  # reuse executables across bench/tool processes
    # surface persistent-cache hits/misses on stderr so a driver run that
    # pays cold relay compiles is diagnosable from its log (VERDICT r04 #1).
    # Filtered to the cache events themselves — DEBUG on these modules emits
    # a line per jit call otherwise.
    h = logging.StreamHandler(sys.stderr)
    h.setFormatter(logging.Formatter("# cache: %(message)s"))
    h.addFilter(lambda rec: "PERSISTENT COMPILATION CACHE" in rec.getMessage())
    for name in ("jax._src.compilation_cache", "jax._src.compiler"):
        lg = logging.getLogger(name)
        lg.setLevel(logging.DEBUG)
        lg.addHandler(h)
        lg.propagate = False
    n_entries = len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0
    print(f"# compile cache: {cache_dir} ({n_entries} entries)",
          file=sys.stderr, flush=True)

    t_start = time.perf_counter()
    budget_s = float(os.environ.get("FYC_BENCH_BUDGET_S", "1500"))
    full = os.environ.get("FYC_BENCH_FULL", "") not in ("", "0")

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    if on_tpu:
        frames, height, width, steps, n_iters = 16, 512, 512, 25, 3
    else:  # CPU sanity fallback (config 1): tiny workload. steps must be
        # >= cfg_cache warmup (2) + the widest composed lcm period (8, the
        # pab288 variant) so every opt-in variant actually exercises its
        # schedule instead of degenerating to all-exact steps (ADVICE r03).
        frames, height, width, steps, n_iters = 8, 256, 256, 10, 1

    pipe = build_pipeline(dtype)
    b = 1
    spec = SampleSpec(video_length=frames, height=height, width=width,
                      num_inference_steps=steps, guidance_scale=8.0,
                      use_interpolate_noise=True)

    # ── EXACT headline first; flush its JSON line before anything else ──
    p50, checksum, compile_s = time_spec(pipe, spec, b, n_iters)
    fps = frames * b / p50

    result = {
        "metric": "frames_per_sec_per_chip_16f_512px_25step",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / A100_BASELINE_FPS, 3),
        "p50_clip_latency_s": round(p50, 3),
        "checksum": checksum,
        "workload": f"{frames}f_{height}px_{steps}steps_cfg",
        "backend": jax.default_backend(),
        "headline_compile_s": round(compile_s, 1),
    }

    def emit():
        print(json.dumps(result), flush=True)

    emit()  # ← the round's perf number is now on stdout, whatever happens

    # ── opt-in serving approximations, each under the wall-clock budget ──
    # (quality bounds for these schedules: tests/test_pab.py + docs/PERF.md)
    #
    # VERDICT r04 weak #1: the round-4 run spent its whole budget on the two
    # DOMINATED variants (cfg_cache3, pab244_cfg4) and budget-skipped the two
    # flagship serving lines. Order now = value order: the best serving
    # schedules run FIRST; the dominated round-over-round comparability lines
    # are FYC_BENCH_FULL-only.
    from followyourclick_tpu.pipelines.serving_schedules import (
        apply_schedule,
    )

    variants = [
        # round-5 best serving line: PAB spatial-4 / temporal-8 / cross-8 ∘
        # DeepCache trunk reuse (lcm-4 refresh) ∘ extrapolated CFG-uncond
        # cache — 4.505 f/s measured; drift 0.056–0.077 over 4 seeds on the
        # unified harness, 0.0897 at the flagship serving shape — the
        # quality-bounded headline (docs/PERF.md "Serving quality budget")
        ("pab488_deep4_cfg4_ex",
         apply_schedule(spec, "pab488_deep4_cfg4_ex"), n_iters),
        # round-4 best serving line: PAB spatial-2 / temporal-8 / cross-8 ∘
        # DeepCache-4 ∘ extrapolated cache — 4.23 f/s measured; flagship
        # drift 0.0815 (docs/PERF.md)
        ("pab288_deep4_cfg4_ex",
         apply_schedule(spec, "pab288_deep4_cfg4_ex"), n_iters),
        # quality-bounded headline schedule (rel-l2 well inside the 0.10
        # cap at the flagship shape): PAB-244 ∘ DeepCache-4 ∘ cfg-cache-4-ex
        ("pab244_deep4_cfg4_ex",
         apply_schedule(spec, "pab244_deep4_cfg4_ex"), n_iters),
    ]
    if full:
        variants += [
            # dominated lines, kept only for round-over-round comparability
            ("cfg_cache3", apply_schedule(spec, "cfg_cache3"), n_iters),
            ("pab244_cfg4", apply_schedule(spec, "pab244_cfg4"), n_iters),
            ("pab_222", spec.replace(pab_spatial_interval=2,
                                     pab_temporal_interval=2,
                                     pab_cross_interval=2), n_iters),
            ("pab2_cfg4", spec.replace(pab_spatial_interval=2,
                                       pab_temporal_interval=2,
                                       pab_cross_interval=2,
                                       cfg_cache_interval=4), n_iters),
            # the reference's own published default operating point: 100
            # steps, cfg 8 (reference configs/prompts/0-StableDiffusion_
            # zero_snr_sd1.5_448x256.yaml `steps: 100`) in exact math, so
            # the rebuild can be compared at the reference's shipped
            # settings, not only the driver's 25-step point (VERDICT r04 #8)
            ("ref_default_100step", spec.replace(num_inference_steps=100),
             1),
        ]
    else:
        result["optin_skipped"] = [
            "cfg_cache3 (FYC_BENCH_FULL unset; dominated)",
            "pab244_cfg4 (FYC_BENCH_FULL unset; dominated)",
            "pab_222 (FYC_BENCH_FULL unset)",
            "pab2_cfg4 (FYC_BENCH_FULL unset)",
            "ref_default_100step (FYC_BENCH_FULL unset)"]

    for key, vspec, it in variants:
        elapsed = time.perf_counter() - t_start
        if elapsed > budget_s:
            result.setdefault("optin_skipped", []).append(
                f"{key} (budget: {elapsed:.0f}s > {budget_s:.0f}s)")
            emit()
            continue
        t_v0 = time.perf_counter()
        try:
            vp50, _, vcompile_s = time_spec(pipe, vspec, b, it)
        except Exception as e:  # an opt-in failure must not kill the headline
            result.setdefault("optin_skipped", []).append(
                f"{key} (error: {type(e).__name__})")
            print(f"# optin {key} failed: {e}", file=sys.stderr, flush=True)
            emit()
            continue
        # raw throughput at the variant's own operating point (the
        # ref_default_100step line is NOT comparable to the 25-step lines)
        result[f"optin_{key}_fps"] = round(vspec.video_length * b / vp50, 3)
        result[f"optin_{key}_p50_s"] = round(vp50, 3)
        # per-variant cost telemetry so budget tuning is data-driven
        # (VERDICT r04 ask #1); compile_s ≪ 60 ⇒ persistent-cache hit
        result[f"optin_{key}_compile_s"] = round(vcompile_s, 1)
        result[f"optin_{key}_elapsed_s"] = round(
            time.perf_counter() - t_v0, 1)
        emit()


if __name__ == "__main__":
    main()
