"""Fused short-kv cross-attention kernel (ops/cross_attention.py).

The kernel is correct but NOT routed (measured slower than XLA's in-scan
fused site on v5e — see the module docstring / docs/PERF.md); these tests
keep the measured record honest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from followyourclick_tpu.ops.cross_attention import (
    _ref_fp32,
    fused_ln_cross_attention,
)


def _mk(rng, b=3, s=40, c=32, heads=4, skv=7, ck=24):
    ks = jax.random.split(rng, 9)
    d = c // heads
    return dict(
        x=jax.random.normal(ks[0], (b, s, c)),
        context=jax.random.normal(ks[1], (b, skv, ck)),
        ls=1.0 + jax.random.normal(ks[2], (c,)) * 0.1,
        lb=jax.random.normal(ks[3], (c,)) * 0.1,
        wq=jax.random.normal(ks[4], (c, c)) * 0.1,
        wk=jax.random.normal(ks[5], (ck, c)) * 0.1,
        wv=jax.random.normal(ks[6], (ck, c)) * 0.1,
        wo=jax.random.normal(ks[7], (c, c)) * 0.1,
        bo=jax.random.normal(ks[8], (c,)) * 0.1,
        heads=heads, d=d,
    )


def test_matches_fp32_reference(rng):
    a = _mk(rng)
    got = fused_ln_cross_attention(
        a["x"], a["context"], a["ls"], a["lb"], a["wq"], a["wk"], a["wv"],
        a["wo"], a["bo"], heads=a["heads"], block_s=16)
    ref = _ref_fp32(a["x"], a["context"], a["ls"], a["lb"], a["wq"], a["wk"],
                    a["wv"], a["wo"], a["bo"], a["heads"],
                    a["d"] ** -0.5, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_gradients_match_reference(rng):
    a = _mk(rng, b=2, s=16, c=16, heads=2, skv=5, ck=12)

    def loss_fused(x, wq):
        return jnp.sum(fused_ln_cross_attention(
            x, a["context"], a["ls"], a["lb"], wq, a["wk"], a["wv"],
            a["wo"], a["bo"], heads=a["heads"], block_s=8) ** 2)

    def loss_ref(x, wq):
        return jnp.sum(_ref_fp32(
            x, a["context"], a["ls"], a["lb"], wq, a["wk"], a["wv"],
            a["wo"], a["bo"], a["heads"], a["d"] ** -0.5, 1e-5) ** 2)

    g = jax.grad(loss_fused, argnums=(0, 1))(a["x"], a["wq"])
    r = jax.grad(loss_ref, argnums=(0, 1))(a["x"], a["wq"])
    for gg, rr in zip(g, r):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(rr),
                                   rtol=1e-3, atol=1e-3)


def test_rejects_long_kv(rng):
    a = _mk(rng, skv=7)
    long_ctx = jnp.zeros((3, 200, 24))
    with pytest.raises(ValueError):
        fused_ln_cross_attention(
            a["x"], long_ctx, a["ls"], a["lb"], a["wq"], a["wk"], a["wv"],
            a["wo"], a["bo"], heads=a["heads"])
