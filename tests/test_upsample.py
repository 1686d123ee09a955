"""Phase-decomposed nearest-2×-upsample+conv (ops/upsample.py).

Reference semantics: diffusers Upsample2D (interpolate nearest ×2 → SAME 3×3
conv), used by the VAE decoder and the UNet's Upsample3D."""

import jax
import jax.numpy as jnp
import numpy as np

from followyourclick_tpu.ops.upsample import (
    conv3x3_nearest_up2,
    reference_up2_conv,
)


def test_matches_materializing_formulation(rng):
    ks = jax.random.split(rng, 3)
    x = jax.random.normal(ks[0], (2, 5, 7, 6))
    w = jax.random.normal(ks[1], (3, 3, 6, 4)) * 0.2
    b = jax.random.normal(ks[2], (4,)) * 0.1
    got = conv3x3_nearest_up2(x, w, b)
    ref = reference_up2_conv(x, w, b)
    assert got.shape == (2, 10, 14, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_no_bias(rng):
    ks = jax.random.split(rng, 2)
    x = jax.random.normal(ks[0], (1, 4, 4, 3))
    w = jax.random.normal(ks[1], (3, 3, 3, 5)) * 0.3
    np.testing.assert_allclose(
        np.asarray(conv3x3_nearest_up2(x, w, None)),
        np.asarray(reference_up2_conv(x, w, None)), rtol=1e-5, atol=1e-5)


def test_upsample3d_module_unchanged(rng):
    """Upsample3D output (and param tree) matches the pre-rewrite
    repeat→nn.Conv formulation."""
    import flax.linen as nn

    from followyourclick_tpu.models.resnet import Upsample3D

    x = jax.random.normal(rng, (1, 3, 4, 4, 6))
    mod = Upsample3D(features=6)
    params = mod.init(jax.random.PRNGKey(0), x)
    # tree identical to nn.Conv(name="conv")
    assert set(params["params"].keys()) == {"conv"}
    assert params["params"]["conv"]["kernel"].shape == (3, 3, 6, 6)

    out = mod.apply(params, x)

    class OldUpsample(nn.Module):
        @nn.compact
        def __call__(self, folded):
            up = jnp.repeat(jnp.repeat(folded, 2, axis=1), 2, axis=2)
            return nn.Conv(6, (3, 3), padding=((1, 1), (1, 1)),
                           name="conv")(up)

    old = OldUpsample().apply(
        {"params": {"conv": params["params"]["conv"]}},
        x.reshape(3, 4, 4, 6))
    np.testing.assert_allclose(np.asarray(out.reshape(3, 8, 8, 6)),
                               np.asarray(old), rtol=1e-5, atol=1e-5)


def test_upsample3d_output_size_path(rng):
    """Non-2× output_size keeps the materializing path and still works."""
    from followyourclick_tpu.models.resnet import Upsample3D

    x = jax.random.normal(rng, (1, 2, 4, 4, 6))
    mod = Upsample3D(features=6)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x, output_size=(12, 12))
    assert out.shape == (1, 2, 12, 12, 6)
