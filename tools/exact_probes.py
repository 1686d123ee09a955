"""Round-5 exact-campaign probes (VERDICT r04 ask #3).

Two named buckets from the roofline audit (docs/PERF.md):
  (a) GroupNorm absorption into adjacent fused kernels (~25 ms bucket):
      the absorbable part is the stats-pass READ at sites where a Pallas
      producer (motion block / GEGLU FF) immediately precedes a GN — this
      probe measures the stats-pass cost at every GN site shape to bound
      the attainable saving before committing to kernel surgery.
  (b) conv scheduling at 55 % of the channel-padded roofline (~60 ms
      bucket): NHWC-vs-NCHW layout probe + im2col-GEMM formulation at the
      hot shapes (the compiler-flag sweep and direct/GN-fused/9-dot Pallas
      convs were measured negative in rounds 3–3b).

Measurement protocol: each op is repeated REPS times INSIDE one jitted
fori_loop with a data dependency chaining iterations (the axon relay costs
~24 ms per dispatch, which would swamp per-op costs measured call-by-call).

Run on the chip:  python tools/exact_probes.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 50


def timed_chain(step, x0, iters=3):
    """Median seconds for REPS chained applications of ``step`` (one
    dispatch). ``step`` must map its input to a same-shaped output."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, REPS, lambda i, y: step(y), x)

    out = run(x0)
    s = float(jnp.sum(out))  # force full execution through the relay
    assert s == s, "NaN"
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        s = float(jnp.sum(run(x0)))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] / REPS


def conv_probe():
    import jax.numpy as jnp
    from jax import lax

    # hot conv shapes per CFG step (B = 2 CFG × 16 frames), flagship widths
    shapes = [
        (32, 64, 64, 320),
        (32, 32, 32, 640),
        (32, 16, 16, 1280),
        (32, 8, 8, 1280),
    ]
    rows = []
    for b, h, w, c in shapes:
        x = jnp.full((b, h, w, c), 0.01, jnp.bfloat16)
        k = jnp.full((3, 3, c, c), 1e-4, jnp.bfloat16)
        xc = jnp.full((b, c, h, w), 0.01, jnp.bfloat16)
        kc = jnp.full((c, c, 3, 3), 1e-4, jnp.bfloat16)

        nhwc = timed_chain(
            lambda y: lax.conv_general_dilated(
                y, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")), x)
        nchw = timed_chain(
            lambda y: lax.conv_general_dilated(
                y, kc, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW")), xc)

        def im2col(y):
            yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = jnp.concatenate(
                [yp[:, i:i + h, j:j + w, :] for i in range(3)
                 for j in range(3)], axis=-1)
            out = cols.reshape(-1, 9 * c) @ k.reshape(9 * c, c)
            return out.reshape(b, h, w, c)

        i2c = timed_chain(im2col, x)
        row = dict(shape=f"{b}x{h}x{w}x{c}",
                   nhwc_ms=round(nhwc * 1e3, 3),
                   nchw_ms=round(nchw * 1e3, 3),
                   im2col_ms=round(i2c * 1e3, 3))
        rows.append(row)
        print(json.dumps({"probe": "conv_layout", **row}), flush=True)
    return rows


def gn_stats_probe():
    import jax.numpy as jnp

    # GN site shapes per CFG step at the flagship config: (rows, C, #sites)
    sites = [
        (32 * 64 * 64, 320, 7),
        (32 * 32 * 32, 640, 8),
        (32 * 16 * 16, 1280, 8),
        (32 * 8 * 8, 1280, 9),
    ]
    groups = 32
    total = 0.0
    for rows_, c, n in sites:
        x = jnp.full((rows_, c), 0.5, jnp.bfloat16)

        def stats_step(y, rows_=rows_, c=c):
            # the pure stats pass: per-group mean + mean-of-squares — the
            # only part of GN a producer-kernel epilogue could absorb.
            # Chained via a zero-cost dependency so iterations serialize.
            yf = y.astype(jnp.float32).reshape(rows_, groups, c // groups)
            s = yf.mean((0, 2)) + (yf * yf).mean((0, 2))
            return y + (0.0 * s.sum()).astype(y.dtype)

        ms = timed_chain(stats_step, x) * 1e3
        total += ms * n
        print(json.dumps({"probe": "gn_stats", "rows": rows_, "C": c,
                          "sites": n, "ms_per_site": round(ms, 4),
                          "ms_total": round(ms * n, 3)}), flush=True)
    print(json.dumps({"probe": "gn_stats_bound",
                      "absorbable_ms_per_step_upper_bound": round(total, 2)}),
          flush=True)
    return total


def main():
    import jax

    from followyourclick_tpu.utils.compile_cache import enable

    enable()
    print(f"# backend: {jax.default_backend()}", file=sys.stderr, flush=True)
    conv_probe()
    gn_stats_probe()


if __name__ == "__main__":
    main()
