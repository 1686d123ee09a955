"""Parity of the fused Pallas packed temporal-attention kernel vs the XLA
reference path (interpret mode off-TPU).

Reference behavior: plain multi-head softmax attention over the frame axis
(``animatediff/models/motion_module.py:328-464`` VersatileAttention with
xformers math).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from followyourclick_tpu.ops.attention import _xla_attention
from followyourclick_tpu.ops.temporal_attention import temporal_attention


def _rand(rng, shape, dtype=jnp.float32):
    return jax.random.normal(rng, shape, dtype=dtype)


@pytest.mark.parametrize("b,s,h,d", [
    (64, 16, 8, 40),    # 64² motion-module shape (scaled-down batch)
    (32, 16, 8, 80),    # 32²
    (16, 16, 8, 160),   # 8²/16²
    (24, 8, 8, 40),     # shorter clip
    (10, 16, 8, 40),    # batch not divisible by block_b
    (8, 1, 8, 40),      # single-frame (video_scale per-frame pass)
    (8, 32, 8, 40),     # 32-frame clip: m = 256
])
def test_matches_xla_attention(b, s, h, d):
    rng = jax.random.PRNGKey(0)
    rq, rk, rv = jax.random.split(rng, 3)
    q, k, v = _rand(rq, (b, s, h, d)), _rand(rk, (b, s, h, d)), _rand(rv, (b, s, h, d))
    scale = d ** -0.5
    ref = _xla_attention(q, k, v, None, scale)
    got = temporal_attention(q, k, v, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_bf16_close_to_fp32_reference():
    rng = jax.random.PRNGKey(1)
    rq, rk, rv = jax.random.split(rng, 3)
    shape = (32, 16, 8, 40)
    q, k, v = _rand(rq, shape), _rand(rk, shape), _rand(rv, shape)
    ref = _xla_attention(q, k, v, None, 40 ** -0.5)
    got = temporal_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                             v.astype(jnp.bfloat16), interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)


def test_gradients_match_xla():
    rng = jax.random.PRNGKey(2)
    rq, rk, rv = jax.random.split(rng, 3)
    shape = (8, 16, 4, 40)
    q, k, v = _rand(rq, shape), _rand(rk, shape), _rand(rv, shape)
    scale = 40 ** -0.5

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, None, scale)))

    def loss_kernel(q, k, v):
        return jnp.sum(jnp.sin(
            temporal_attention(q, k, v, scale=scale, interpret=True)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gk):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-4)


def test_fused_block_matches_modular():
    """fused_temporal_block (projections + attention in one kernel) vs the
    modular path: Dense q/k/v -> per-head XLA attention -> Dense out."""
    from followyourclick_tpu.ops.temporal_attention import fused_temporal_block

    rng = jax.random.PRNGKey(3)
    ks = jax.random.split(rng, 6)
    bd, f, c, h = 48, 16, 320, 8
    d = c // h
    x = _rand(ks[0], (bd, f, c))
    wq = _rand(ks[1], (c, c)) * 0.1
    wk = _rand(ks[2], (c, c)) * 0.1
    wv = _rand(ks[3], (c, c)) * 0.1
    wo = _rand(ks[4], (c, c)) * 0.1
    bo = _rand(ks[5], (c,)) * 0.1

    q = (x @ wq).reshape(bd, f, h, d)
    k = (x @ wk).reshape(bd, f, h, d)
    v = (x @ wv).reshape(bd, f, h, d)
    o = _xla_attention(q, k, v, None, d ** -0.5).reshape(bd, f, c)
    ref = o @ wo + bo

    got = fused_temporal_block(x, wq, wk, wv, wo, bo, heads=h,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_fused_block_gradients():
    from followyourclick_tpu.ops.temporal_attention import (
        _fused_ref_fp32,
        fused_temporal_block,
    )

    rng = jax.random.PRNGKey(4)
    ks = jax.random.split(rng, 6)
    bd, f, c, h = 8, 8, 64, 4
    args = (_rand(ks[0], (bd, f, c)),
            _rand(ks[1], (c, c)) * 0.1, _rand(ks[2], (c, c)) * 0.1,
            _rand(ks[3], (c, c)) * 0.1, _rand(ks[4], (c, c)) * 0.1,
            _rand(ks[5], (c,)) * 0.1)

    def loss_ref(*a):
        return jnp.sum(jnp.sin(_fused_ref_fp32(*a, (c // h) ** -0.5, h)))

    def loss_kernel(*a):
        return jnp.sum(jnp.sin(fused_temporal_block(
            *a, heads=h, interpret=True)))

    gr = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    gk = jax.grad(loss_kernel, argnums=tuple(range(6)))(*args)
    for a, b in zip(gr, gk):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=5e-4)
