"""The shipped flow config zoo (configs/flow/*.yaml): every yaml builds a
real estimator through the registry and a valid train config, mirroring the
reference's per-family recipes (mmflow/configs/<family>/*.py — see each
yaml's header for the exact source file)."""

import glob
import os

import numpy as np
import pytest
import yaml

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs", "flow")
CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))

# one yaml per reference family (mmflow/configs/: flownet, flownet2, gma,
# irr, liteflownet, liteflownet2, maskflownet, pwcnet, raft)
REFERENCE_FAMILIES = {
    "flownet": ["flownets", "flownetc", "flownet_css"],
    "flownet2": ["flownet2"],
    "gma": ["gma"],
    "irr": ["irrpwc"],
    "liteflownet": ["liteflownet_pre"],
    "liteflownet2": ["liteflownet2"],
    "maskflownet": ["maskflownet", "maskflownets"],
    "pwcnet": ["pwcnet"],
    "raft": ["raft"],
}


def test_zoo_covers_every_reference_family():
    names = [os.path.basename(p) for p in CONFIGS]
    for family, prefixes in REFERENCE_FAMILIES.items():
        assert any(n.startswith(p) for p in prefixes for n in names), (
            f"no shipped config for reference family {family!r}")
    assert len(CONFIGS) >= 9


@pytest.mark.parametrize("path", CONFIGS,
                         ids=[os.path.basename(p) for p in CONFIGS])
def test_config_roundtrips_through_registry(path):
    from followyourclick_tpu.flow.registry import build_flow_estimator
    from followyourclick_tpu.flow.train import (
        FlowTrainConfig,
        make_optimizer,
    )

    with open(path) as f:
        cfg = yaml.safe_load(f)
    model = build_flow_estimator(cfg["model"])
    assert model is not None

    tcfg = FlowTrainConfig(**cfg.get("train", {}))
    # the optimizer must be constructible and hashable-static for jit
    tx = make_optimizer(tcfg)
    state = tx.init({"w": np.zeros((3, 3), np.float32)})
    assert state is not None
    hash(tcfg)


def test_step_schedule_matches_mmcv_step_policy():
    """schedule_s_long semantics: lr halves at each milestone."""
    from followyourclick_tpu.flow.train import FlowTrainConfig, make_schedule

    cfg = FlowTrainConfig(lr=1e-4, lr_policy="step",
                          lr_milestones=(400000, 600000), lr_gamma=0.5,
                          total_steps=1200000)
    s = make_schedule(cfg)
    np.testing.assert_allclose(float(s(0)), 1e-4)
    np.testing.assert_allclose(float(s(399999)), 1e-4)
    np.testing.assert_allclose(float(s(400000)), 5e-5)
    np.testing.assert_allclose(float(s(600000)), 2.5e-5)
    np.testing.assert_allclose(float(s(1199999)), 2.5e-5)


def test_adam_l2_differs_from_adamw_exactly_when_weights_nonzero():
    """optimizer: adam is torch-Adam L2 (decay folded into the gradient
    before the moments), not decoupled AdamW."""
    import jax.numpy as jnp

    from followyourclick_tpu.flow.train import FlowTrainConfig, make_optimizer

    grads = {"w": jnp.ones((2,), jnp.float32)}
    params = {"w": jnp.full((2,), 10.0, jnp.float32)}

    outs = {}
    for opt in ("adam", "adamw"):
        cfg = FlowTrainConfig(lr=1e-3, weight_decay=0.1, optimizer=opt,
                              lr_policy="step", lr_milestones=(),
                              grad_clip_norm=0.0, total_steps=10)
        tx = make_optimizer(cfg)
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        outs[opt] = np.asarray(updates["w"])
    # L2: decay rides through the Adam normalizer → update magnitude stays
    # ~lr; AdamW subtracts lr·wd·param on top (10× larger here)
    assert not np.allclose(outs["adam"], outs["adamw"])
    assert abs(outs["adamw"][0]) > abs(outs["adam"][0]) * 1.5


def test_grad_clip_zero_disables_clipping():
    import jax.numpy as jnp

    from followyourclick_tpu.flow.train import FlowTrainConfig, make_optimizer

    cfg = FlowTrainConfig(grad_clip_norm=0.0, lr=1.0, weight_decay=0.0,
                          lr_policy="step", lr_milestones=(), total_steps=10)
    tx = make_optimizer(cfg)
    big = {"w": jnp.full((2,), 1e6, jnp.float32)}
    params = {"w": jnp.zeros((2,), jnp.float32)}
    state = tx.init(params)
    updates, _ = tx.update(big, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()
