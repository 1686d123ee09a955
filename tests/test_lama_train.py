"""LaMa training-stack tests: losses, discriminator, GAN steps, metrics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # oracle/compile-heavy (deselect via -m 'not slow')

from followyourclick_tpu.inpaint.lama import FFCResNetGenerator, LamaConfig
from followyourclick_tpu.inpaint.losses import (
    NLayerDiscriminator,
    discriminator_nsgan_r1_loss,
    feature_matching_loss,
    frechet_distance,
    generator_nsgan_loss,
    masked_l1_loss,
    masked_l2_loss,
    psnr,
    ssim,
)
from followyourclick_tpu.inpaint.train import (
    LamaTrainConfig,
    discriminator_step,
    generator_step,
    init_training,
)

TINY = LamaConfig(input_nc=4, output_nc=3, ngf=8, n_downsampling=2,
                  n_blocks=1, resnet_ratio=0.5)


class TestLosses:
    def test_masked_l1_weighting(self):
        pred = jnp.ones((1, 4, 4, 3))
        target = jnp.zeros((1, 4, 4, 3))
        mask = jnp.zeros((1, 4, 4, 1)).at[:, :2].set(1.0)
        # only the KNOWN region contributes with weight_missing=0
        loss = masked_l1_loss(pred, target, mask, weight_known=10.0,
                              weight_missing=0.0)
        assert float(loss) == pytest.approx(5.0)
        loss2 = masked_l2_loss(pred, target, mask, 10.0, 0.0)
        assert float(loss2) == pytest.approx(5.0)

    def test_feature_matching(self):
        f = [jnp.ones((1, 8, 8, 4)), jnp.ones((1, 4, 4, 8))]
        assert float(feature_matching_loss(f, f)) == 0.0
        g = [x + 1 for x in f]
        assert float(feature_matching_loss(g, f)) == pytest.approx(1.0)
        mask = jnp.ones((1, 16, 16, 1))
        # fully-masked: all errors ignored
        assert float(feature_matching_loss(g, f, mask)) == pytest.approx(0.0, abs=1e-6)

    def test_nsgan_directions(self):
        good = jnp.full((1, 4, 4, 1), 5.0)   # D confident fake is real
        bad = jnp.full((1, 4, 4, 1), -5.0)
        assert float(generator_nsgan_loss(good)) < float(
            generator_nsgan_loss(bad))

    def test_r1_discriminator_loss(self):
        disc = NLayerDiscriminator(ndf=8, n_layers=2)
        x = jnp.zeros((1, 32, 32, 3))
        variables = disc.init(jax.random.PRNGKey(0), x)

        def discr_fn(params, inp):
            return disc.apply({"params": params,
                               "batch_stats": variables.get("batch_stats", {})},
                              inp)

        real = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        fake = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
        mask = jnp.ones((2, 32, 32, 1)) * 0.5
        loss, metrics = discriminator_nsgan_r1_loss(
            discr_fn, variables["params"], real, fake, mask)
        assert np.isfinite(float(loss))
        assert {"discr_real_out", "discr_fake_out", "r1"} <= set(metrics)


class TestMetrics:
    def test_ssim_identical_and_different(self):
        img = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3),
                          jnp.float32)
        assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
        other = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3),
                            jnp.float32)
        assert float(ssim(img, other)) < 0.5

    def test_psnr(self):
        img = jnp.zeros((1, 8, 8, 3))
        noisy = img + 0.1
        assert float(psnr(img, noisy)) == pytest.approx(20.0, abs=0.1)

    def test_frechet_distance(self):
        rs = np.random.RandomState(0)
        a = rs.randn(500, 8)
        b = rs.randn(500, 8)
        same = frechet_distance(a, a)
        diff = frechet_distance(a, b + 5.0)
        assert same == pytest.approx(0.0, abs=1e-6)
        assert diff > 100


class TestGANSteps:
    def test_alternating_steps_run_and_update(self):
        gen = FFCResNetGenerator(TINY)
        disc = NLayerDiscriminator(ndf=8, n_layers=2)
        cfg = LamaTrainConfig()
        gen_vars, discr_vars, gen_opt, discr_opt = init_training(
            gen, disc, cfg, image_size=32)
        rs = np.random.RandomState(0)
        batch = {
            "image": jnp.asarray(rs.rand(1, 32, 32, 3), jnp.float32),
            "mask": jnp.asarray(
                (rs.rand(1, 32, 32, 1) > 0.7).astype(np.float32)),
        }
        old_kernel = np.asarray(gen_vars["params"]["head"]["kernel"])
        gen_vars, gen_opt, gmetrics, inpainted = generator_step(
            gen, disc, cfg, gen_vars, discr_vars, gen_opt, batch)
        assert np.isfinite(float(gmetrics["gen_total"]))
        assert inpainted.shape == (1, 32, 32, 3)
        assert not np.allclose(
            np.asarray(gen_vars["params"]["head"]["kernel"]), old_kernel)

        discr_vars, discr_opt, dmetrics = discriminator_step(
            disc, cfg, discr_vars, discr_opt, batch, inpainted)
        assert np.isfinite(float(dmetrics["discr_total"]))

    def test_unmasked_region_preserved_in_composite(self):
        gen = FFCResNetGenerator(TINY)
        disc = NLayerDiscriminator(ndf=8, n_layers=2)
        cfg = LamaTrainConfig()
        gen_vars, discr_vars, gen_opt, _ = init_training(
            gen, disc, cfg, image_size=32)
        rs = np.random.RandomState(1)
        image = jnp.asarray(rs.rand(1, 32, 32, 3), jnp.float32)
        mask = jnp.zeros((1, 32, 32, 1)).at[:, 8:16, 8:16].set(1.0)
        _, _, _, inpainted = generator_step(
            gen, disc, cfg, gen_vars, discr_vars, gen_opt,
            {"image": image, "mask": mask})
        outside = np.asarray(inpainted)[0][np.asarray(mask)[0, ..., 0] == 0]
        ref = np.asarray(image)[0][np.asarray(mask)[0, ..., 0] == 0]
        np.testing.assert_allclose(outside, ref, atol=1e-6)
