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

Run on the chip:  python tools/exact_probes.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    # force real execution through the axon relay: reduce to a scalar
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = float(jax.numpy.sum(out if not isinstance(out, tuple) else out[0]))
    dt = (time.perf_counter() - t0) / iters
    assert s == s, "NaN"
    return dt * 1e3


def conv_probe():
    import jax
    import jax.numpy as jnp
    from jax import lax

    # hot conv shapes per CFG step (B = 2 CFG × 16 frames), flagship widths
    shapes = [
        (32, 64, 64, 320, 320),
        (32, 32, 32, 640, 640),
        (32, 16, 16, 1280, 1280),
        (32, 8, 8, 1280, 1280),
    ]
    rows = []
    for b, h, w, cin, cout in shapes:
        x = jnp.ones((b, h, w, cin), jnp.bfloat16)
        k = jnp.ones((3, 3, cin, cout), jnp.bfloat16) * 1e-3

        @jax.jit
        def nhwc(x, k):
            return lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        xc = jnp.ones((b, cin, h, w), jnp.bfloat16)
        kc = jnp.ones((cout, cin, 3, 3), jnp.bfloat16) * 1e-3

        @jax.jit
        def nchw(x, k):
            return lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))

        @jax.jit
        def im2col(x, k):
            # SAME 3×3 via explicit patch extraction → one GEMM
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = jnp.concatenate(
                [xp[:, i:i + h, j:j + w, :] for i in range(3)
                 for j in range(3)], axis=-1)  # (b,h,w,9*cin)
            return cols.reshape(-1, 9 * cin) @ k.reshape(9 * cin, cout)

        row = dict(shape=f"{b}x{h}x{w}x{cin}->{cout}",
                   nhwc_ms=round(timed(nhwc, x, k), 3),
                   nchw_ms=round(timed(nchw, xc, kc), 3),
                   im2col_ms=round(timed(im2col, x, k), 3))
        rows.append(row)
        print(json.dumps({"probe": "conv_layout", **row}), flush=True)
    return rows


def gn_stats_probe():
    import jax
    import jax.numpy as jnp

    # GN site shapes per CFG step at the flagship config: (rows, C, #sites)
    # resnets have 2 GN each, spatial transformers 1 (proj_in GN);
    # B = 32 (CFG×frames); counts from the 4-level topology at
    # layers_per_block=2
    sites = [
        (32 * 64 * 64, 320, 7),    # level-0 resnet/attn GNs
        (32 * 32 * 32, 640, 8),
        (32 * 16 * 16, 1280, 8),
        (32 * 8 * 8, 1280, 9),     # level-3 + mid
    ]
    groups = 32
    total = 0.0
    for rows_, c, n in sites:
        x = jnp.ones((rows_, c), jnp.bfloat16)

        @jax.jit
        def stats(x):
            # the pure stats pass: per-group mean + mean-of-squares — the
            # only part of GN a producer-kernel epilogue could absorb
            xf = x.astype(jnp.float32).reshape(rows_, groups, c // groups)
            return jnp.stack([xf.mean((0, 2)), (xf * xf).mean((0, 2))])

        ms = timed(stats, x)
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
    print(f"# backend: {jax.default_backend()}", file=sys.stderr)
    conv_probe()
    gn_stats_probe()


if __name__ == "__main__":
    main()
