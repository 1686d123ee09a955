"""VAE decoder ablation bench: where do the ~250 ms/clip go on v5e?

Times the flagship decode (16 frames, 64×64×4 latents → 512² RGB) with
component families patched to identity, plus XLA's own FLOPs count, to
locate the gap between the measured time and the conv roofline
(docs/PERF.md "The exact-math ceiling").

Patching works because flax resolves ``vae.GroupNorm`` / ``vae.
VAEAttentionBlock`` at TRACE time, and identity stand-ins create no params
(flax ignores extra entries in the provided tree).

  python tools/vae_bench.py            # on TPU
  python tools/vae_bench.py --variants base gn_id
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from contextlib import contextmanager

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="*", default=None)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--latent", type=int, default=64)
    args = ap.parse_args(argv)

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from followyourclick_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    from followyourclick_tpu.config import VAEConfig
    from followyourclick_tpu.models import vae as vae_mod

    class IdentityGroupNorm(nn.Module):
        """Skips statistics/normalize; keeps the fused activation so only
        the normalization cost is ablated."""

        num_groups: int = 32
        epsilon: float = 1e-5
        dtype: jnp.dtype = jnp.float32
        use_scale_bias: bool = True
        act: str | None = None

        @nn.compact
        def __call__(self, x):
            return nn.silu(x) if self.act == "silu" else x

    class IdentityAttn(nn.Module):
        channels: int
        groups: int = 32
        dtype: jnp.dtype = jnp.float32

        @nn.compact
        def __call__(self, x):
            return x

    real_gn, real_attn = vae_mod.GroupNorm, vae_mod.VAEAttentionBlock

    @contextmanager
    def patched(gn_id: bool, attn_id: bool):
        vae_mod.GroupNorm = IdentityGroupNorm if gn_id else real_gn
        vae_mod.VAEAttentionBlock = IdentityAttn if attn_id else real_attn
        try:
            yield
        finally:
            vae_mod.GroupNorm = real_gn
            vae_mod.VAEAttentionBlock = real_attn

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    f, hl = args.frames, args.latent

    cfg = VAEConfig()
    model = vae_mod.AutoencoderKL(cfg, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(model.init, rng,
                       jnp.zeros((1, 8 * hl, 8 * hl, 3), dtype),
                       rng))["params"]
    z = jax.random.normal(jax.random.PRNGKey(1), (f, hl, hl, 4), dtype)

    def time_decode():
        @jax.jit
        def run(p, z):
            return jnp.sum(model.apply({"params": p}, z,
                                       method=model.decode))

        float(run(params, z))  # compile (under the active patch context)
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(run(params, z))
            times.append(time.perf_counter() - t0)
        try:
            cost = jax.jit(
                lambda p, z: model.apply({"params": p}, z,
                                         method=model.decode)
            ).lower(params, z).cost_analysis()
            fl = float(cost.get("flops", 0.0))
        except Exception:
            fl = 0.0
        return float(np.median(times)), fl

    variants = args.variants or ["base", "gn_id", "attn_id", "gn_attn_id"]
    rows = {}
    for name in variants:
        gn_id = name != "base" and "gn" in name
        attn_id = "attn" in name
        with patched(gn_id, attn_id):
            t, fl = time_decode()
        rows[name] = dict(ms=round(t * 1e3, 1), tflop=round(fl / 1e12, 2))
        print(json.dumps({name: rows[name]}), flush=True)

    if "base" in rows and rows["base"]["tflop"]:
        peak = 197e12 if on_tpu else 1e12
        ms_floor = rows["base"]["tflop"] * 1e12 / peak * 1e3
        print(json.dumps({"roofline": dict(
            floor_ms=round(ms_floor, 1),
            pct_of_peak=round(100 * ms_floor / rows["base"]["ms"], 1))}))


if __name__ == "__main__":
    main()
