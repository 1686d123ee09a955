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


def test_fast_gating_within_bf16_noise():
    """The bf16 tanh-gelu serving mode (fast_gating, default for bf16
    inputs at C<=640) must stay within bf16 resolution of the exact-erf
    fp32 result — the same regime the reference's fp16-autocast gelu
    operates in."""
    args = _args(320, 1280, 256, key=4)
    bargs = tuple(a.astype(jnp.bfloat16) for a in args)
    ref = np.asarray(_ref_fp32(*args))
    fast = np.asarray(
        fused_geglu(*bargs, block_r=64, interpret=True, fast_gating=True),
        np.float32)
    exact_bf16 = np.asarray(
        fused_geglu(*bargs, block_r=64, interpret=True, fast_gating=False),
        np.float32)
    scale = np.abs(ref).mean()
    # the fast path's extra error vs the bf16-exact path is bounded by the
    # bf16 quantization noise itself
    err_fast = np.abs(fast - ref).mean() / scale
    err_exact = np.abs(exact_bf16 - ref).mean() / scale
    assert err_fast < 2.0 * max(err_exact, 1e-3), (err_fast, err_exact)
    assert err_fast < 2e-2, err_fast


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


def test_ln_geglu_residual_matches_reference():
    from followyourclick_tpu.ops.geglu import _ln_ref_fp32, fused_ln_geglu

    ks = jax.random.split(jax.random.PRNGKey(2), 7)
    c, inner, rows = 64, 256, 100
    args = (jax.random.normal(ks[0], (rows, c)) * 2.0 + 1.0,
            jax.random.normal(ks[1], (c,)) * 0.1 + 1.0,
            jax.random.normal(ks[2], (c,)) * 0.1,
            jax.random.normal(ks[3], (c, 2 * inner)) * 0.05,
            jax.random.normal(ks[4], (2 * inner,)) * 0.05,
            jax.random.normal(ks[5], (inner, c)) * 0.05,
            jax.random.normal(ks[6], (c,)) * 0.05)
    for residual in (True, False):
        ref = _ln_ref_fp32(*args, 1e-5, residual)
        got = fused_ln_geglu(*args, eps=1e-5, residual=residual,
                             block_r=64, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-5, rtol=5e-5)


def test_ln_geglu_gradients():
    from followyourclick_tpu.ops.geglu import _ln_ref_fp32, fused_ln_geglu

    ks = jax.random.split(jax.random.PRNGKey(3), 7)
    c, inner, rows = 32, 64, 16
    args = (jax.random.normal(ks[0], (rows, c)),
            jax.random.normal(ks[1], (c,)) * 0.1 + 1.0,
            jax.random.normal(ks[2], (c,)) * 0.1,
            jax.random.normal(ks[3], (c, 2 * inner)) * 0.1,
            jax.random.normal(ks[4], (2 * inner,)) * 0.1,
            jax.random.normal(ks[5], (inner, c)) * 0.1,
            jax.random.normal(ks[6], (c,)) * 0.1)

    def loss_ref(*a):
        return jnp.sum(jnp.sin(_ln_ref_fp32(*a, 1e-5, True)))

    def loss_kernel(*a):
        return jnp.sum(jnp.sin(fused_ln_geglu(
            *a, eps=1e-5, residual=True, block_r=8, interpret=True)))

    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    gk = jax.grad(loss_kernel, argnums=tuple(range(7)))(*args)
    for a, b in zip(gr, gk):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-4)
