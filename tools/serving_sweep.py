"""Serving-schedule sweep: quality (drift vs exact) × modeled throughput.

Runs the candidate composed PAB∘cfg-cache schedules through the real
sampler at a CPU-feasible shape (tiny random UNet, 8 frames / 128 px /
25 steps — the same harness tests/test_pab.py gates on) and ranks them by
modeled v5e throughput under a rel-l2 quality cap. The winners then get a
real TPU measurement via bench.py variants.

Usage:
  JAX_PLATFORMS=cpu python tools/serving_sweep.py [--cap 0.10] [--steps 25]
  python tools/serving_sweep.py --shape flagship   # on-TPU, slow: one
      exact + one schedule run at 16f/512px to bound drift at serving shape
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from followyourclick_tpu.pipelines.serving_schedules import (  # noqa: E501,F401
    SCHEDULES,
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=float, default=0.10,
                    help="rel-l2 quality cap for the Pareto pick")
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--shape", choices=["tiny", "flagship"], default="tiny")
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of schedule names to run")
    ap.add_argument("--seeds", type=int, nargs="*", default=[0],
                    help="pipeline init seeds; >1 quantifies the drift "
                    "spread over random-init weights (VERDICT r04 weak #4)")
    args = ap.parse_args(argv)

    if args.shape == "tiny":
        # force CPU in-process: this image's sitecustomize registers the
        # axon TPU plugin at interpreter start, so the env var alone is
        # not enough (see .claude/skills/verify/SKILL.md)
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from followyourclick_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    from followyourclick_tpu.pipelines.animation import SampleSpec
    from followyourclick_tpu.utils.quality import (
        build_quality_pipeline,
        drift_metrics,
        estimate_fps,
        run_schedule,
        schedule_step_classes,
    )

    if args.shape == "tiny":
        frames, px = 8, 128
        dtype = jnp.float32
    else:
        frames, px = 16, 512
        import jax
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" \
            else jnp.float32
    hl = px // 8

    base = dict(video_length=frames, height=px, width=px,
                num_inference_steps=args.steps, guidance_scale=8.0,
                use_interpolate_noise=True)
    names = args.only if args.only else list(SCHEDULES)
    per_seed = {name: [] for name in names}
    rows = []
    for seed in args.seeds:
        t0 = time.time()
        pipe = build_quality_pipeline(args.shape, dtype=dtype, seed=seed)
        print(f"# pipeline (seed {seed}) built in {time.time() - t0:.0f}s",
              file=sys.stderr)
        t0 = time.time()
        exact = run_schedule(pipe, SampleSpec(**base), frames, (hl, hl))
        print(f"# exact run in {time.time() - t0:.0f}s", file=sys.stderr)

        for name in names:
            kw = SCHEDULES[name]
            spec = SampleSpec(**base, **kw)
            t0 = time.time()
            approx = run_schedule(pipe, spec, frames, (hl, hl))
            dt = time.time() - t0
            m = drift_metrics(approx, exact)
            per_seed[name].append(m["rel_l2"])
            flagship_spec = SampleSpec(video_length=16, height=512,
                                       width=512, num_inference_steps=25,
                                       guidance_scale=8.0, **kw)
            row = dict(schedule=name, seed=seed, **m,
                       est_v5e_fps=round(estimate_fps(flagship_spec), 2),
                       step_classes=schedule_step_classes(flagship_spec),
                       run_s=round(dt, 1))
            rows.append(row)
            print(json.dumps(row), flush=True)

    if len(args.seeds) > 1:  # drift spread over random-init weights
        for name in names:
            v = per_seed[name]
            print(json.dumps({
                "schedule": name, "seeds": args.seeds,
                "rel_l2_min": min(v), "rel_l2_max": max(v),
                "rel_l2_mean": round(sum(v) / len(v), 4)}), flush=True)

    best = {}
    for r in rows:  # worst seed decides cap admission
        b = best.setdefault(r["schedule"], dict(r))
        b["rel_l2"] = max(b["rel_l2"], r["rel_l2"])
    ok = [r for r in best.values() if r["rel_l2"] <= args.cap]
    ok.sort(key=lambda r: -r["est_v5e_fps"])
    print(json.dumps({"pareto_best_under_cap": ok[:3], "cap": args.cap}))


if __name__ == "__main__":
    main()
