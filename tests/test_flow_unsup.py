"""Occlusion BCE + unsupervised flow loss tests (analytic invariants)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from followyourclick_tpu.flow.unsup_losses import (
    binary_cross_entropy,
    census_loss,
    multi_level_bce,
    smooth_1st_loss,
    smooth_2nd_loss,
)


class TestBCE:
    def test_confident_correct_beats_wrong(self):
        target = jnp.ones((1, 4, 4, 1))
        good = jnp.full((1, 4, 4, 1), 5.0)    # logits → sigmoid ≈ 1
        bad = jnp.full((1, 4, 4, 1), -5.0)
        assert float(binary_cross_entropy(good, target)) < float(
            binary_cross_entropy(bad, target))

    def test_reductions_and_balance(self, rng):
        pred = jax.random.normal(rng, (2, 8, 8, 1))
        target = (jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 1))
                  > 0.8).astype(jnp.float32)
        none = binary_cross_entropy(pred, target, reduction="none")
        assert none.shape == (2, 8, 8)
        s = float(binary_cross_entropy(pred, target, reduction="sum"))
        m = float(binary_cross_entropy(pred, target, reduction="mean"))
        assert s == pytest.approx(m * 8 * 8, rel=1e-5)
        bal = float(binary_cross_entropy(pred, target, balance=True))
        assert np.isfinite(bal)

    def test_multi_level_with_irr_lists(self, rng):
        target = (jax.random.uniform(rng, (1, 32, 32, 1)) > 0.5).astype(
            jnp.float32)
        preds = {
            "level6": jnp.zeros((1, 4, 4, 1)),
            "level5": jnp.zeros((1, 8, 8, 1)),
            "level4": [jnp.zeros((1, 16, 16, 1)), jnp.zeros((1, 16, 16, 1))],
            "level3": jnp.zeros((1, 32, 32, 1)),
            "level2": jnp.zeros((1, 32, 32, 1)),
        }
        loss = multi_level_bce(preds, target)
        assert float(loss) > 0


class TestUnsupervised:
    def test_census_identical_images_zero(self, rng):
        img = jax.random.uniform(rng, (1, 16, 16, 3))
        assert float(census_loss(img, img)) == pytest.approx(0.0, abs=1e-6)
        other = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 3))
        assert float(census_loss(img, other)) > 0.01

    def test_smooth_losses_zero_for_constant_flow(self, rng):
        img = jax.random.uniform(rng, (1, 16, 16, 3))
        const = jnp.ones((1, 16, 16, 2)) * 3.0
        assert float(smooth_1st_loss(const, img)) == pytest.approx(0.0,
                                                                   abs=1e-6)
        # a linear ramp has zero SECOND-order smoothness but nonzero first
        ramp = jnp.broadcast_to(
            jnp.arange(16.0)[None, None, :, None], (1, 16, 16, 2))
        assert float(smooth_2nd_loss(ramp, img)) == pytest.approx(0.0,
                                                                  abs=1e-5)
        assert float(smooth_1st_loss(ramp, img)) > 0.1
        rough = jax.random.normal(rng, (1, 16, 16, 2)) * 5
        assert float(smooth_1st_loss(rough, img)) > float(
            smooth_1st_loss(const, img))

    def test_edge_weighting_reduces_penalty(self, rng):
        # strong image edges downweight flow gradients there (alpha > 0)
        img = jnp.zeros((1, 16, 16, 3)).at[:, :, 8:].set(1.0)
        flow = jnp.zeros((1, 16, 16, 2)).at[:, :, 8:].set(4.0)
        unweighted = float(smooth_1st_loss(flow, img, alpha=0.0))
        weighted = float(smooth_1st_loss(flow, img, alpha=10.0))
        assert weighted < unweighted
