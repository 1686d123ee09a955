"""Fused single-pass GroupNorm(+SiLU) kernel (ops/groupnorm.py) vs the
torch-equivalent fp32 reference, in interpret mode (CPU CI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from followyourclick_tpu.ops.groupnorm import (
    _ref_fp32,
    fits_vmem,
    fused_group_norm,
)


@pytest.mark.parametrize("b,n,c,g", [(4, 64, 320, 32), (2, 256, 64, 8),
                                     (3, 100, 96, 4)])
@pytest.mark.parametrize("act", [None, "silu"])
def test_matches_reference(b, n, c, g, act):
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (b, n, c)) * 3.0 + 5.0  # offset: pilot path
    scale = jax.random.normal(k2, (c,)) * 0.2 + 1.0
    bias = jax.random.normal(k3, (c,)) * 0.2
    ref = _ref_fp32(x, scale, bias, g, 1e-5, act)
    got = fused_group_norm(x, scale, bias, groups=g, eps=1e-5, act=act,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_bf16_inputs():
    rng = jax.random.PRNGKey(1)
    x = (jax.random.normal(rng, (2, 128, 64)) * 2.0).astype(jnp.bfloat16)
    scale = jnp.ones((64,))
    bias = jnp.zeros((64,))
    ref = _ref_fp32(x, scale, bias, 8, 1e-6, "silu")
    got = fused_group_norm(x, scale, bias, groups=8, eps=1e-6, act="silu",
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)


def test_gradients_match_reference():
    rng = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (2, 32, 64))
    scale = jax.random.normal(k2, (64,)) * 0.1 + 1.0
    bias = jax.random.normal(k3, (64,)) * 0.1

    def loss_ref(x, s, b):
        return jnp.sum(jnp.sin(_ref_fp32(x, s, b, 8, 1e-5, "silu")))

    def loss_kernel(x, s, b):
        return jnp.sum(jnp.sin(fused_group_norm(
            x, s, b, groups=8, eps=1e-5, act="silu", interpret=True)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gr, gk):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=1e-4, rtol=1e-4)


def test_fits_vmem_gate():
    assert fits_vmem(4096, 320)      # 64² UNet slab
    assert not fits_vmem(512 * 512, 128)  # VAE decoder at full res
