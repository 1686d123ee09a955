"""Training-step tests: trainable-module filters freeze the right params,
loss decreases on a fixed batch, conditioning corruption applies."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # oracle/compile-heavy (deselect via -m 'not slow')


@pytest.fixture(scope="module")
def setup():
    import jax
    import jax.numpy as jnp

    from followyourclick_tpu.config import (
        CLIPTextConfig,
        MotionModuleConfig,
        NoiseScheduleConfig,
        UNet3DConfig,
    )
    from followyourclick_tpu.models.clip_text import CLIPTextModel
    from followyourclick_tpu.models.unet3d import (
        UNet3DConditionModel,
        UNetConditioning,
    )
    from followyourclick_tpu.schedulers.ddim import DDIMSchedule
    from followyourclick_tpu.training.train_step import (
        TrainBatch,
        TrainConfig,
        create_train_state,
    )

    tcfg_text = CLIPTextConfig(vocab_size=100, hidden_size=32,
                               intermediate_size=64, num_hidden_layers=1,
                               num_attention_heads=2)
    ucfg = UNet3DConfig(
        block_out_channels=(32, 64, 64, 64), layers_per_block=1,
        norm_num_groups=8, cross_attention_dim=32,
        motion_module=MotionModuleConfig(num_attention_heads=4))
    unet = UNet3DConditionModel(ucfg)
    text = CLIPTextModel(tcfg_text)

    rng = jax.random.PRNGKey(0)
    b, f, h, w = 2, 2, 16, 16
    cond = UNetConditioning(context=jnp.zeros((b, 77, 32)),
                            fps=jnp.zeros((b,)),
                            motion_score=jnp.zeros((b,)))
    unet_params = unet.init(rng, jnp.zeros((b, f, h, w, 9)),
                            jnp.zeros((b,), jnp.int32), cond)["params"]
    text_params = text.init(rng, jnp.zeros((1, 77), jnp.int32))["params"]
    sched = DDIMSchedule.create(NoiseScheduleConfig(), 25)
    tc = TrainConfig(learning_rate=1e-3, gradient_checkpointing=False)
    state = create_train_state(unet_params, tc)
    batch = TrainBatch(
        latents=jax.random.normal(jax.random.PRNGKey(2), (b, f, h, w, 4)),
        input_ids=jnp.zeros((b, 77), jnp.int32),
        mask=jnp.ones((b, h, w, 1)),
        fps=jnp.full((b,), 8.0),
        motion_score=jnp.full((b,), 20.0))
    return dict(unet=unet, text=text, text_params=text_params, sched=sched,
                tc=tc, state=state, batch=batch)


def test_trainable_mask_filters():
    from followyourclick_tpu.training.train_step import trainable_mask

    params = {
        "conv_in": {"conv": {"kernel": 1}},
        "down_blocks_0": {
            "motion_modules_0": {"proj_in": {"kernel": 1}},
            "resnets_0": {"conv1": {"conv": {"kernel": 1}}},
        },
        "fps_embedding": {"linear_1": {"kernel": 1}},
        "time_embedding": {"linear_1": {"kernel": 1}},
    }
    mask = trainable_mask(params, ("motion_modules", "conv_in",
                                   "motion_embedding", "fps_embedding"))
    assert mask["conv_in"]["conv"]["kernel"] is True
    assert mask["down_blocks_0"]["motion_modules_0"]["proj_in"]["kernel"] is True
    assert mask["down_blocks_0"]["resnets_0"]["conv1"]["conv"]["kernel"] is False
    assert mask["fps_embedding"]["linear_1"]["kernel"] is True
    assert mask["time_embedding"]["linear_1"]["kernel"] is False


def test_train_step_updates_only_trainable(setup):
    import jax

    from followyourclick_tpu.training.train_step import train_step

    s = setup
    new_state, metrics = train_step(
        s["state"], s["batch"], jax.random.PRNGKey(3), unet=s["unet"],
        text_encoder=s["text"], text_params=s["text_params"],
        sched=s["sched"], cfg=s["tc"])
    assert np.isfinite(float(metrics["loss"]))

    before = s["state"].params
    after = new_state.params
    # frozen: spatial resnet conv
    b0 = np.asarray(before["down_blocks_0"]["resnets_0"]["conv1"]["conv"]["kernel"])
    a0 = np.asarray(after["down_blocks_0"]["resnets_0"]["conv1"]["conv"]["kernel"])
    np.testing.assert_array_equal(b0, a0)
    # trained: motion module proj_out (zero-init ⇒ nonzero grad at step 1;
    # everything upstream of it inside the module has exactly-zero grad until
    # proj_out becomes nonzero — correct zero-init semantics)
    b1 = np.asarray(before["down_blocks_0"]["motion_modules_0"]["proj_out"]["kernel"])
    a1 = np.asarray(after["down_blocks_0"]["motion_modules_0"]["proj_out"]["kernel"])
    assert np.abs(a1 - b1).max() > 0
    b2 = np.asarray(before["conv_in"]["conv"]["kernel"])
    a2 = np.asarray(after["conv_in"]["conv"]["kernel"])
    assert np.abs(a2 - b2).max() > 0

    # after a second step, gradients flow into proj_in through the now
    # nonzero proj_out
    new_state2, _ = train_step(
        new_state, s["batch"], jax.random.PRNGKey(4), unet=s["unet"],
        text_encoder=s["text"], text_params=s["text_params"],
        sched=s["sched"], cfg=s["tc"])
    p_in_1 = np.asarray(
        new_state.params["down_blocks_0"]["motion_modules_0"]["proj_in"]["kernel"])
    p_in_2 = np.asarray(
        new_state2.params["down_blocks_0"]["motion_modules_0"]["proj_in"]["kernel"])
    assert np.abs(p_in_2 - p_in_1).max() > 0


def test_loss_decreases_over_steps(setup):
    import functools

    import jax

    from followyourclick_tpu.training.train_step import train_step

    s = setup
    step_fn = jax.jit(functools.partial(
        train_step, unet=s["unet"], text_encoder=s["text"],
        text_params=s["text_params"], sched=s["sched"], cfg=s["tc"]))
    state = s["state"]
    losses = []
    for i in range(8):
        state, metrics = step_fn(state, s["batch"],
                                 jax.random.PRNGKey(42))  # fixed noise
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_separate_lr_trains_all_params(setup):
    """use_spatial_temporal_separate_lr: every param group trains; with the
    spatial LR set to 0 only the motion (temporal) params move."""
    import jax
    import jax.numpy as jnp

    from followyourclick_tpu.training.train_step import (
        TrainConfig,
        create_train_state,
        train_step,
    )

    tc = TrainConfig(learning_rate=1e-3, spatial_learning_rate=0.0,
                     use_spatial_temporal_separate_lr=True,
                     gradient_checkpointing=False)
    state = create_train_state(setup["state"].params, tc)
    new_state, _ = train_step(
        state, setup["batch"], jax.random.PRNGKey(0), unet=setup["unet"],
        text_encoder=setup["text"], text_params=setup["text_params"],
        sched=setup["sched"], cfg=tc)

    def changed(a, b):
        return bool(jnp.any(a != b))

    moved_temporal = moved_spatial = 0
    flat_old = jax.tree_util.tree_flatten_with_path(state.params)[0]
    flat_new = jax.tree_util.tree_flatten_with_path(new_state.params)[0]
    for (path, old), (_, new) in zip(flat_old, flat_new):
        is_temporal = any("motion_modules" in str(k) for k in path)
        if changed(old, new):
            if is_temporal:
                moved_temporal += 1
            else:
                moved_spatial += 1
    assert moved_temporal > 0
    # adamw(lr=0) produces exactly zero updates -> spatial params frozen
    assert moved_spatial == 0


def test_partitioned_step_matches_full_step(setup):
    """With fp32 frozen params and clipping inactive, the partitioned step
    (grads over the trainable subtree only) reproduces the full-tree
    train_step update exactly. (With clipping ACTIVE they legitimately
    differ: the full-tree state's global norm includes frozen-param grads
    that are then zeroed; the partitioned step clips over trainable grads
    only — matching the reference recipe, which calls clip_grad_norm_ on
    the trainable params.)"""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from followyourclick_tpu.training.train_step import (
        create_partitioned_train_state,
        create_train_state,
        train_step,
        train_step_partitioned,
    )

    s = setup
    tc = dataclasses.replace(s["tc"], max_grad_norm=1e9)
    full = create_train_state(s["state"].params, tc)
    part = create_partitioned_train_state(
        s["state"].params, tc, frozen_dtype=jnp.float32)

    kw = dict(unet=s["unet"], text_encoder=s["text"],
              text_params=s["text_params"], sched=s["sched"], cfg=tc)
    rng = jax.random.PRNGKey(7)
    full2, m_full = train_step(full, s["batch"], rng, **kw)
    part2, m_part = train_step_partitioned(part, s["batch"], rng, **kw)

    np.testing.assert_allclose(float(m_full["loss"]), float(m_part["loss"]),
                               rtol=1e-6)
    merged = part2.params
    for path, leaf in jax.tree_util.tree_flatten_with_path(full2.params)[0]:
        other = merged
        for k in path:
            other = other[k.key]
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(other),
                                   rtol=1e-5, atol=1e-7,
                                   err_msg=str(path))


def test_partitioned_state_memory_layout(setup):
    """bf16 frozen leaves, optimizer state only over trainable leaves, and
    a bf16-frozen step runs finite without touching frozen params."""
    import jax
    import jax.numpy as jnp

    from followyourclick_tpu.training.train_step import (
        create_partitioned_train_state,
        train_step_partitioned,
        trainable_mask,
    )

    s = setup
    state = create_partitioned_train_state(s["state"].params, s["tc"])

    frozen_leaves = jax.tree_util.tree_leaves(state.frozen)
    assert frozen_leaves, "freeze recipe must leave frozen params"
    assert all(l.dtype == jnp.bfloat16 for l in frozen_leaves
               if jnp.issubdtype(l.dtype, jnp.floating))

    n_trainable = len(jax.tree_util.tree_leaves(state.trainable))
    mask = trainable_mask(s["state"].params, tuple(s["tc"].trainable_modules))
    n_expected = sum(jax.tree_util.tree_leaves(mask))
    assert n_trainable == n_expected
    # AdamW mu moments exist ONLY for trainable leaves (the ~9 GB saving)
    mus = [l for l in jax.tree_util.tree_leaves(state.opt_state)]
    total_param_leaves = len(jax.tree_util.tree_leaves(s["state"].params))
    assert n_trainable < total_param_leaves
    n_moment_arrays = sum(1 for l in mus if hasattr(l, "shape") and l.ndim)
    # chain(clip, adamw): mu + nu per trainable leaf
    assert n_moment_arrays <= 2 * n_trainable

    new_state, metrics = train_step_partitioned(
        state, s["batch"], jax.random.PRNGKey(3), unet=s["unet"],
        text_encoder=s["text"], text_params=s["text_params"],
        sched=s["sched"], cfg=s["tc"])
    assert np.isfinite(float(metrics["loss"]))
    for old, new in zip(jax.tree_util.tree_leaves(state.frozen),
                        jax.tree_util.tree_leaves(new_state.frozen)):
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
    # trainable moved (conv_in has nonzero grads at step 1)
    b = np.asarray(state.trainable["conv_in"]["conv"]["kernel"])
    a = np.asarray(new_state.trainable["conv_in"]["conv"]["kernel"])
    assert np.abs(a - b).max() > 0


def test_partitioned_checkpoint_roundtrip(setup, tmp_path):
    """Orbax save/restore works for the split trainable/frozen payload."""
    import jax
    import jax.numpy as jnp

    from followyourclick_tpu.training.loop import (
        make_checkpoint_manager,
        restore_checkpoint,
        save_checkpoint,
    )
    from followyourclick_tpu.training.train_step import (
        create_partitioned_train_state,
    )

    s = setup
    state = create_partitioned_train_state(s["state"].params, s["tc"])
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    manager = make_checkpoint_manager(str(tmp_path / "ckpt"), keep=1)
    save_checkpoint(manager, 7, state)
    manager.wait_until_finished()

    fresh = create_partitioned_train_state(s["state"].params, s["tc"])
    restored, step = restore_checkpoint(manager, fresh)
    assert step == 7
    for old, new in zip(jax.tree_util.tree_leaves(state.trainable),
                        jax.tree_util.tree_leaves(restored.trainable)):
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
    for old, new in zip(jax.tree_util.tree_leaves(state.frozen),
                        jax.tree_util.tree_leaves(restored.frozen)):
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new))


def test_validation_schedule():
    """validation_fn fires at validation_steps intervals and at the one-off
    steps in validation_steps_tuple (reference validation_steps_tuple)."""
    import jax
    import jax.numpy as jnp

    from followyourclick_tpu.training.loop import LoopConfig, train_loop

    calls = []

    class DummyState:
        params = {"w": jnp.zeros(())}
        step = jnp.zeros((), jnp.int32)
        opt_state = ()

        def replace(self, **kw):
            return self

    def step_fn(state, batch, rng):
        return state, {"loss": jnp.zeros(())}

    def data():
        while True:
            yield None

    cfg = LoopConfig(max_train_steps=6, checkpointing_steps=100,
                     log_every=100, need_resume=False,
                     temporal_multi_scale=False,
                     validation_steps=3, validation_steps_tuple=(1,),
                     output_dir="/tmp/test_val_sched")
    train_loop(DummyState(), data(), step_fn, cfg,
               rng=jax.random.PRNGKey(0),
               validation_fn=lambda step, params: calls.append(step))
    assert calls == [1, 3, 6]


def test_remat_blocks_matches_plain(setup):
    """Per-block gradient checkpointing (UNet3DConditionModel.remat_blocks
    — the memory lever that fits the 24-frame reference recipe on one
    chip, docs/PERF.md) must not change the forward output, the gradients,
    or the parameter tree."""
    import jax
    import jax.numpy as jnp

    from followyourclick_tpu.models.unet3d import UNet3DConditionModel

    unet = setup["unet"]
    remat = UNet3DConditionModel(unet.config, remat_blocks=True)
    params = setup["state"].params
    b, f, h, w = setup["batch"].latents.shape[:4]
    x = jnp.concatenate([setup["batch"].latents,
                         jnp.ones((b, f, h, w, 5))], axis=-1)
    t = jnp.full((b,), 500, jnp.int32)
    cond_kw = dict(context=jnp.zeros((b, 77, unet.config.cross_attention_dim)),
                   fps=jnp.full((b,), 8.0),
                   motion_score=jnp.full((b,), 20.0))
    from followyourclick_tpu.models.unet3d import UNetConditioning

    cond = UNetConditioning(**cond_kw)

    # identical param tree: remat params drop into the plain model unchanged
    p1 = remat.init(jax.random.PRNGKey(0), x, t, cond)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p1))

    out0 = unet.apply({"params": params}, x, t, cond)
    out1 = remat.apply({"params": params}, x, t, cond)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               atol=1e-5, rtol=1e-5)

    def loss(m):
        return lambda p: jnp.sum(m.apply({"params": p}, x, t, cond) ** 2)

    g0 = jax.grad(loss(unet))(params)
    g1 = jax.grad(loss(remat))(params)
    for a, b_ in zip(jax.tree_util.tree_leaves(g0),
                     jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=1e-3)
