"""FlowNet2 full-stack tests (CSS + SD + fusion)."""

import pytest

pytestmark = pytest.mark.slow  # oracle/compile-heavy (deselect via -m 'not slow')

import numpy as np
import jax
import jax.numpy as jnp


def test_flownet2_forward(rng):
    from followyourclick_tpu.flow.registry import build_flow_estimator

    model = build_flow_estimator({"type": "FlowNet2"})
    img = jax.random.uniform(rng, (1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), img, img)
    # all three branches exist
    top = set(params["params"])
    assert {"flownetCSS", "flownetSD", "fusion_encoder",
            "fusion_decoder"} <= top
    preds = model.apply(params, img, img)
    # fusion predicts at levels 3..1; level1 is FULL resolution (stride-1
    # first level), flow_div 1
    assert preds["level1"].shape == (1, 64, 64, 2)
    assert preds["level2"].shape == (1, 32, 32, 2)
    flow = model.apply(params, img, img, inference=True)
    assert flow.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_flownet_sd_branch(rng):
    from followyourclick_tpu.flow.flownet2 import FlowNetSD

    model = FlowNetSD()
    img = jax.random.uniform(rng, (1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), img, img)
    preds = model.apply(params, img, img)
    assert preds["level2"].shape == (1, 16, 16, 2)
    # inter convs present in the SD decoder blocks
    assert "inter" in params["params"]["decoder"]["level5"]
