"""LiteFlowNet progressive stage loading (reference
mmflow/core/hooks/liteflownet_stage_loading.py:8)."""

import numpy as np

from followyourclick_tpu.flow.liteflownet import liteflownet_stage_load


def test_stage_load_copies_matching_leaves():
    params = {
        "NetM_level3": {"conv": {"kernel": np.ones((3, 3, 4, 4)),
                                 "bias": np.ones(4)}},
        "NetM_level2": {"conv": {"kernel": np.zeros((3, 3, 4, 4)),
                                 "bias": np.zeros(4)}},
        "NetS_level3": {"conv": {"kernel": np.full((3, 3, 2, 2), 7.0)}},
        "NetS_level2": {"conv": {"kernel": np.zeros((3, 3, 9, 9))}},
        "encoder": {"k": np.zeros(3)},
    }
    new = liteflownet_stage_load(params, 3, 2)
    assert (new["NetM_level2"]["conv"]["kernel"] == 1).all()
    assert (new["NetM_level2"]["conv"]["bias"] == 1).all()
    # shape-mismatched leaf keeps its init (non-strict load semantics)
    assert (new["NetS_level2"]["conv"]["kernel"] == 0).all()
    # source + untouched trees intact; input not mutated
    assert (new["NetM_level3"]["conv"]["kernel"] == 1).all()
    assert (params["NetM_level2"]["conv"]["kernel"] == 0).all()
    assert (new["encoder"]["k"] == 0).all()
