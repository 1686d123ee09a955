"""Multi-device tests on the 8-device virtual CPU mesh: TP+DP sharded UNet
forward matches single-device, and the sharded training step runs."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_setup():
    import jax
    import jax.numpy as jnp

    from followyourclick_tpu.config import MotionModuleConfig, UNet3DConfig
    from followyourclick_tpu.models.unet3d import (
        UNet3DConditionModel,
        UNetConditioning,
    )

    cfg = UNet3DConfig(
        block_out_channels=(32, 64, 64, 64), layers_per_block=1,
        norm_num_groups=8,
        motion_module=MotionModuleConfig(num_attention_heads=4))
    model = UNet3DConditionModel(cfg)
    rng = jax.random.PRNGKey(0)
    b, f, h, w = 4, 2, 16, 16
    sample = jax.random.normal(rng, (b, f, h, w, 9))
    t = jnp.full((b,), 500, jnp.int32)
    cond = UNetConditioning(
        context=jax.random.normal(jax.random.PRNGKey(1), (b, 77, 768)),
        fps=jnp.full((b,), 8.0), motion_score=jnp.full((b,), 20.0))
    params = model.init(rng, sample, t, cond)["params"]
    return model, params, sample, t, cond


def test_eight_devices_present():
    import jax

    assert jax.local_device_count() == 8


def test_tp_dp_forward_matches_single_device(tiny_setup):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from followyourclick_tpu.parallel.mesh import create_mesh
    from followyourclick_tpu.parallel.sharding import shard_params

    model, params, sample, t, cond = tiny_setup
    expected = model.apply({"params": params}, sample, t, cond)

    mesh = create_mesh(data=4, model=2)
    with mesh:
        sharded = shard_params(params, mesh)
        data = NamedSharding(mesh, P("data"))
        sample_s = jax.device_put(sample, data)
        t_s = jax.device_put(t, data)
        cond_s = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, data), cond)

        out = jax.jit(
            lambda p, s, t, c: model.apply({"params": p}, s, t, c)
        )(sharded, sample_s, t_s, cond_s)

    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


def test_sharding_rules_split_attention(tiny_setup):
    from jax.sharding import PartitionSpec as P

    from followyourclick_tpu.parallel.sharding import param_sharding_rules

    _, params, *_ = tiny_setup
    specs = param_sharding_rules(params)
    attn = specs["down_blocks_0"]["attentions_0"]["transformer_blocks_0"]["attn1"]
    assert attn["to_q"]["kernel"] == P(None, "model")
    assert attn["to_out"]["kernel"] == P("model", None)
    conv = specs["conv_in"]["conv"]["kernel"]
    assert conv == P(None, None, None, None)


def test_train_step_sharded(tiny_setup):
    """One full DP+TP training step on the virtual mesh (what the driver's
    dryrun_multichip exercises)."""
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
