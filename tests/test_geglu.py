"""Fused GEGLU kernel (ops/geglu.py) vs the exact-gelu XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np

from followyourclick_tpu.ops.geglu import _ref_fp32, fused_geglu


def _args(c, inner, rows, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    return (jax.random.normal(ks[0], (rows, c)) * 0.5,
            jax.random.normal(ks[1], (c, 2 * inner)) * 0.05,
            jax.random.normal(ks[2], (2 * inner,)) * 0.05,
            jax.random.normal(ks[3], (inner, c)) * 0.05,
            jax.random.normal(ks[4], (c,)) * 0.05)


def test_matches_reference():
    args = _args(64, 256, 100)
    ref = _ref_fp32(*args)
    got = fused_geglu(*args, block_r=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_bf16_and_row_padding():
    args = _args(32, 128, 77)  # 77 % block_r != 0
    args = tuple(a.astype(jnp.bfloat16) for a in args)
    ref = _ref_fp32(*args)
    got = fused_geglu(*args, block_r=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)


def test_gradients_match_reference():
    args = _args(32, 64, 24, key=1)

    def loss_ref(*a):
        return jnp.sum(jnp.sin(_ref_fp32(*a)))

    def loss_kernel(*a):
        return jnp.sum(jnp.sin(fused_geglu(*a, block_r=8, interpret=True)))

    gr = jax.grad(loss_ref, argnums=tuple(range(5)))(*args)
    gk = jax.grad(loss_kernel, argnums=tuple(range(5)))(*args)
    for a, b in zip(gr, gk):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-4)
