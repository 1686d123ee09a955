"""Flash-attention kernel correctness (interpret mode on CPU) and the
dispatcher's impl selection."""

import numpy as np
import pytest


@pytest.mark.parametrize("shape", [
    (2, 128, 4, 40),      # unpadded head dim, small seq
    (2, 300, 4, 64),      # ragged seq (kv padding path)
    (1, 512, 2, 160),     # wide head dim
])
def test_flash_matches_xla_interpret(shape):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from followyourclick_tpu.ops.attention import _xla_attention
    from followyourclick_tpu.ops.flash_attention import flash_attention

    b, s, h, d = shape
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, s, h, d), dtype=jnp.float32)
    k = jax.random.normal(kk, (b, s, h, d), dtype=jnp.float32)
    v = jax.random.normal(kv, (b, s, h, d), dtype=jnp.float32)

    ref = _xla_attention(q, k, v, None, d ** -0.5)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_flash_cross_attention_shape():
    """kv seq != q seq (cross attention)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from followyourclick_tpu.ops.attention import _xla_attention
    from followyourclick_tpu.ops.flash_attention import flash_attention

    q = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 4, 40))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 4, 40))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 4, 40))
    ref = _xla_attention(q, k, v, None, 40 ** -0.5)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_flash_gradient():
    """Custom VJP backward matches XLA autodiff."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from followyourclick_tpu.ops.attention import _xla_attention
    from followyourclick_tpu.ops.flash_attention import flash_attention

    q = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 2, 40))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 2, 40))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 128, 2, 40))

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, None, 40 ** -0.5) ** 2)

    def loss_flash(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(flash_attention(q, k, v, block_q=128,
                                           block_k=128) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_dispatcher_selects_xla_on_cpu():
    import jax

    from followyourclick_tpu.ops.attention import dot_product_attention

    q = jax.random.normal(jax.random.PRNGKey(0), (1, 600, 2, 40))
    out = dot_product_attention(q, q, q)  # would pick flash on TPU
    assert out.shape == q.shape


def test_packed_small_seq_matches_xla():
    """The head-packed tiny-seq path (temporal attention) must equal plain
    per-head attention, with and without an additive bias."""
    import jax
    import jax.numpy as jnp

    from followyourclick_tpu.ops.attention import (
        _packed_small_seq_attention,
        _xla_attention,
    )

    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    B, S, H, D = 3, 16, 8, 40
    q = jax.random.normal(k1, (B, S, H, D))
    k = jax.random.normal(k2, (B, S, H, D))
    v = jax.random.normal(k3, (B, S, H, D))
    scale = D ** -0.5
    ref = _xla_attention(q, k, v, None, scale)
    out = _packed_small_seq_attention(q, k, v, None, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    bias = jax.random.normal(k4, (B, H, S, S))
    ref_b = _xla_attention(q, k, v, bias, scale)
    out_b = _packed_small_seq_attention(q, k, v, bias, scale)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(ref_b),
                               atol=2e-5)


def test_dispatcher_uses_packed_for_temporal_shape():
    import jax

    from followyourclick_tpu.ops.attention import dot_product_attention

    q = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 8, 40))
    out = dot_product_attention(q, q, q)
    assert out.shape == q.shape


def test_batch_chunked_attention_exact(monkeypatch):
    """FYC_ATTN_BATCH_CHUNK (the 24-frame training memory lever,
    docs/PERF.md): chunked self-attention is bit-exact vs the one-shot
    path, engages only above the score-size threshold, and never engages
    for biased or non-divisible batches."""
    import jax
    import jax.numpy as jnp

    from followyourclick_tpu.ops.attention import (
        _batch_chunked_attention,
        _xla_attention,
        dot_product_attention,
    )

    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (8, 64, 2, 16))
    k = jax.random.normal(kk, (8, 64, 2, 16))
    v = jax.random.normal(kv, (8, 64, 2, 16))
    ref = _xla_attention(q, k, v, None, 0.25)
    out = _batch_chunked_attention(q, k, v, 0.25, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)

    # dispatcher: below the 256 MB score threshold the chunk flag is inert
    monkeypatch.setenv("FYC_ATTN_BATCH_CHUNK", "2")
    small = dot_product_attention(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(small),
                               np.asarray(_xla_attention(q, k, v, None,
                                                         16 ** -0.5)),
                               atol=1e-6, rtol=1e-6)

    # gradients flow through the chunked path (the lever exists FOR the
    # backward) and match the one-shot gradients
    def loss(fn):
        return lambda q_: jnp.sum(fn(q_) ** 2)

    g_ref = jax.grad(loss(lambda q_: _xla_attention(q_, k, v, None, 0.25)))(q)
    g_chk = jax.grad(loss(
        lambda q_: _batch_chunked_attention(q_, k, v, 0.25, 2)))(q)
    np.testing.assert_allclose(np.asarray(g_chk), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-5)
