"""Time one serving schedule on the real chip through the shipped pipeline.

Reuses bench.py's zero-param flagship pipeline + timing protocol so numbers
are directly comparable with BENCH_r*.json lines.

  python tools/measure_schedule.py pab366_cfg6_w2
  python tools/measure_schedule.py --kw pab_spatial_interval=3 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("name", nargs="?", default=None,
                    help="schedule name from tools/serving_sweep.py")
    ap.add_argument("--kw", nargs="*", default=[],
                    help="extra SampleSpec overrides key=int")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from followyourclick_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    import bench
    from followyourclick_tpu.pipelines.animation import SampleSpec
    from tools.serving_sweep import SCHEDULES

    kw = dict(SCHEDULES[args.name]) if args.name else {}
    for item in args.kw:
        k, v = item.split("=")
        kw[k] = int(v)

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    frames, px, steps = (16, 512, 25) if on_tpu else (8, 256, 8)

    pipe = bench.build_pipeline(dtype)
    spec = SampleSpec(video_length=frames, height=px, width=px,
                      num_inference_steps=steps, guidance_scale=8.0,
                      use_interpolate_noise=True, **kw)
    t0 = time.perf_counter()
    p50, checksum, compile_s = bench.time_spec(pipe, spec, 1, args.iters)
    print(json.dumps({
        "schedule": args.name or "custom", "overrides": kw,
        "fps": round(frames / p50, 3), "p50_s": round(p50, 3),
        "compile_s": round(compile_s, 1),
        "compile_plus_run_s": round(time.perf_counter() - t0, 1),
        "workload": f"{frames}f_{px}px_{steps}steps_cfg",
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
