"""Full two-stage MaskFlowNet test."""

import pytest

pytestmark = pytest.mark.slow  # oracle/compile-heavy (deselect via -m 'not slow')

import numpy as np
import jax


def test_maskflownet_two_stage(rng):
    from followyourclick_tpu.flow.registry import build_flow_estimator

    model = build_flow_estimator({"type": "MaskFlowNet"})
    img = jax.random.uniform(rng, (1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), img, img)
    top = set(params["params"])
    # stage-1 submodel + stage-2 encoder/decoders present
    assert "maskflownetS" in top and "encoder" in top
    assert "decoder_level2" in top
    preds = model.apply(params, img, img)
    assert set(preds) == {"level2", "level3", "level4", "level5", "level6"}
    flow = model.apply(params, img, img, inference=True)
    assert flow.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(flow)).all()
