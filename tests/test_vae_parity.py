"""Golden parity: AutoencoderKL vs reference diffusers VAE (vae.py:501)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # oracle/compile-heavy (deselect via -m 'not slow')

from followyourclick_tpu.config import VAEConfig
from followyourclick_tpu.models.vae import AutoencoderKL
from followyourclick_tpu.utils.convert import audit_params, convert_vae_state_dict

from tests._oracle import setup_reference_path

TINY = dict(
    in_channels=3, out_channels=3, latent_channels=4,
    block_out_channels=(32, 64, 64, 64), layers_per_block=1,
    norm_num_groups=8, sample_size=64,
)


@pytest.fixture(scope="module")
def models():
    setup_reference_path()
    import jax
    import jax.numpy as jnp
    import torch

    from diffusers.models.vae import AutoencoderKL as RefVAE

    torch.manual_seed(0)
    ref = RefVAE(
        in_channels=3, out_channels=3, latent_channels=4,
        down_block_types=("DownEncoderBlock2D",) * 4,
        up_block_types=("UpDecoderBlock2D",) * 4,
        block_out_channels=TINY["block_out_channels"],
        layers_per_block=TINY["layers_per_block"],
        norm_num_groups=TINY["norm_num_groups"],
        sample_size=64,
    )
    ref.eval()

    cfg = VAEConfig(**{k: v for k, v in TINY.items()})
    model = AutoencoderKL(cfg)
    converted = convert_vae_state_dict(ref.state_dict())

    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                      jax.random.PRNGKey(1))["params"]
    missing, unexpected, mismatched = audit_params(converted, init)
    assert not missing, missing[:10]
    assert not unexpected, unexpected[:10]
    assert not mismatched, mismatched[:10]
    return ref, model, {"params": converted}


def test_encode_parity(models):
    import jax.numpy as jnp
    import torch

    ref, model, params = models
    rs = np.random.RandomState(0)
    img = rs.randn(2, 3, 64, 64).astype(np.float32)

    with torch.no_grad():
        ref_moments = ref.encode(torch.from_numpy(img)).latent_dist
        ref_mean = ref_moments.mean.numpy()
        ref_std = ref_moments.std.numpy()

    mean, logvar = model.apply(params, jnp.asarray(img.transpose(0, 2, 3, 1)),
                               method=model.encode)
    got_mean = np.asarray(mean).transpose(0, 3, 1, 2)
    got_std = np.exp(0.5 * np.asarray(logvar)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_mean, ref_mean, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(got_std, ref_std, rtol=2e-3, atol=1e-4)


def test_decode_parity(models):
    import jax.numpy as jnp
    import torch

    ref, model, params = models
    rs = np.random.RandomState(1)
    z = rs.randn(2, 4, 8, 8).astype(np.float32)

    with torch.no_grad():
        ref_img = ref.decode(torch.from_numpy(z)).sample.numpy()

    img = model.apply(params, jnp.asarray(z.transpose(0, 2, 3, 1)),
                      method=model.decode)
    got = np.asarray(img).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref_img, rtol=2e-3, atol=2e-4)
