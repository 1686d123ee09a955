"""Multi-device tests on the 8-device virtual CPU mesh: TP+DP sharded UNet
forward matches single-device, and the sharded training step runs."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # oracle/compile-heavy (deselect via -m 'not slow')


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


def test_dp_serving_sampler_collectives_negligible():
    """Fleet-serving evidence (docs/PERF.md "Fleet serving"): under a pure
    data-parallel mesh (clips sharded, params replicated) the compiled
    sampler moves NO material data between devices — GSPMD inserts a
    handful of tiny reshard all-to-alls (measured: 27 ops, largest
    per-shard output 59 KB, ~1.1 MB total per program vs ~10 GB of
    per-step HBM traffic), so N-chip DP serving throughput is
    N × per-chip f/s with no meaningful ICI term."""
    import re

    import jax
    import jax.numpy as jnp

    from followyourclick_tpu.config import (
        CLIPTextConfig,
        InferenceConfig,
        MotionModuleConfig,
        UNet3DConfig,
        VAEConfig,
    )
    from followyourclick_tpu.parallel.mesh import create_mesh
    from followyourclick_tpu.pipelines.animation import (
        AnimationPipeline,
        SampleSpec,
    )

    cfg = InferenceConfig(
        unet=UNet3DConfig(
            sample_size=32, cross_attention_dim=768, attention_head_dim=8,
            block_out_channels=(32, 64, 64, 64), layers_per_block=1,
            norm_num_groups=8,
            motion_module=MotionModuleConfig(num_attention_heads=4),
            use_fps_condition=True,
            use_first_frame_mask_condition_concat=True),
        vae=VAEConfig(block_out_channels=(32, 64, 64, 64),
                      layers_per_block=1, norm_num_groups=8, sample_size=64),
        clip_text=CLIPTextConfig(vocab_size=1000, hidden_size=768,
                                 intermediate_size=512, num_hidden_layers=2,
                                 num_attention_heads=4))
    rng = jax.random.PRNGKey(0)
    mesh = create_mesh(data=8, model=1)
    b = 8  # one clip per device

    from followyourclick_tpu.models.unet3d import UNetConditioning

    with mesh:
        pipe = AnimationPipeline(cfg, None, None, None, mesh=mesh)
        ids0 = jnp.zeros((1, 77), jnp.int32)
        sample0 = jnp.zeros((2, 2, 8, 8, 9))
        cond0 = UNetConditioning(context=jnp.zeros((2, 77, 768)),
                                 fps=jnp.full((2,), 8.0),
                                 motion_score=jnp.full((2,), 20.0))
        pipe.params = {  # replicated (no shard_params): pure DP
            "unet": pipe.unet.init(rng, sample0, jnp.zeros((2,), jnp.int32),
                                   cond0)["params"],
            "vae": pipe.vae.init(rng, jnp.zeros((1, 64, 64, 3)),
                                 rng)["params"],
            "text_encoder": pipe.text_encoder.init(rng, ids0)["params"],
        }
        spec = SampleSpec(video_length=2, height=64, width=64,
                          num_inference_steps=3, guidance_scale=7.5)
        ids = jnp.zeros((b, 77), jnp.int32)
        # .lower on the bound method drops self; go through the class attr
        lowered = AnimationPipeline._sample_jit.lower(
            pipe, pipe.params, ids, jnp.zeros_like(ids), rng, spec,
            first_image_latents=jnp.zeros((b, 8, 8, 4)),
            mask=jnp.ones((b, 8, 8, 1)),
            fps=jnp.full((b,), 8.0), motion_score=jnp.full((b,), 20.0))
        hlo = lowered.compile().as_text()

    dtype_bytes = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                   "pred": 1, "s8": 1, "u8": 1, "f64": 8}
    coll_re = re.compile(
        r"= \(?((?:\w+\[[\d,]*\][^)]*?))\)? (all-reduce|all-gather"
        r"|reduce-scatter|collective-permute|all-to-all"
        r"|collective-broadcast)\(")
    shape_re = re.compile(r"(\w+)\[([\d,]*)\]")
    total_bytes, max_bytes, n_ops = 0, 0, 0
    for ln in hlo.splitlines():
        m = coll_re.search(ln)
        if not m:
            continue
        n_ops += 1
        for dt, dims in shape_re.findall(m.group(1)):
            if dt not in dtype_bytes:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            sz = n * dtype_bytes[dt]
            total_bytes += sz
            max_bytes = max(max_bytes, sz)
    # actual cross-device data movement must be immaterial: no single
    # collective output ≥ 64 KB per shard, < 2 MB total per program
    # (vs ~10 GB HBM traffic per denoise step)
    assert max_bytes < 64 * 1024, (n_ops, max_bytes)
    assert total_bytes < 2 * 1024 * 1024, (n_ops, total_bytes)


def test_sampler_sharded_serving_matches_single_device():
    """Batched serving (BASELINE config 5): the full sampler under a
    data=4 x model=2 mesh — params TP-sharded, clips DP-sharded via the
    pipeline's with_sharding_constraint — reproduces the single-device
    videos."""
    import types

    import jax
    import jax.numpy as jnp

    from followyourclick_tpu.config import (
        CLIPTextConfig,
        InferenceConfig,
        MotionModuleConfig,
        UNet3DConfig,
        VAEConfig,
    )
    from followyourclick_tpu.models.unet3d import UNetConditioning
    from followyourclick_tpu.parallel.mesh import create_mesh
    from followyourclick_tpu.parallel.sharding import shard_params
    from followyourclick_tpu.pipelines.animation import (
        AnimationPipeline,
        SampleSpec,
    )

    class FakeTokenizer:
        model_max_length = 77

        def __call__(self, texts, padding=None, max_length=None,
                     truncation=False, return_tensors="np"):
            ids = np.zeros((len(texts), 77), dtype=np.int64)
            for i, t in enumerate(texts):
                rs = np.random.RandomState(abs(hash(t)) % (2 ** 31))
                ids[i] = rs.randint(0, 1000, size=77)
            return types.SimpleNamespace(input_ids=ids)

    cfg = InferenceConfig(
        unet=UNet3DConfig(
            sample_size=32, cross_attention_dim=768, attention_head_dim=8,
            block_out_channels=(32, 64, 64, 64), layers_per_block=1,
            norm_num_groups=8,
            motion_module=MotionModuleConfig(num_attention_heads=4),
            use_fps_condition=True,
            use_first_frame_mask_condition_concat=True),
        vae=VAEConfig(block_out_channels=(32, 64, 64, 64),
                      layers_per_block=1, norm_num_groups=8, sample_size=64),
        clip_text=CLIPTextConfig(vocab_size=1000, hidden_size=768,
                                 intermediate_size=512, num_hidden_layers=2,
                                 num_attention_heads=4))
    rng = jax.random.PRNGKey(0)

    def build(mesh=None):
        pipe = AnimationPipeline(cfg, None, None, None,
                                 tokenizer=FakeTokenizer(), mesh=mesh)
        ids = jnp.zeros((1, 77), jnp.int32)
        sample = jnp.zeros((2, 2, 8, 8, 9))
        cond = UNetConditioning(context=jnp.zeros((2, 77, 768)),
                                fps=jnp.full((2,), 8.0),
                                motion_score=jnp.full((2,), 20.0))
        pipe.params = {
            "unet": pipe.unet.init(rng, sample, jnp.zeros((2,), jnp.int32),
                                   cond)["params"],
            "vae": pipe.vae.init(rng, jnp.zeros((1, 64, 64, 3)),
                                 rng)["params"],
            "text_encoder": pipe.text_encoder.init(
                rng, ids)["params"],
        }
        return pipe

    prompts = [f"prompt {i}" for i in range(4)]  # 4 clips, DP axis = 4
    spec = SampleSpec(video_length=2, height=64, width=64,
                      num_inference_steps=3, guidance_scale=7.5)
    first = jnp.zeros((4, 8, 8, 4))
    mask = jnp.ones((4, 8, 8, 1))

    ref_pipe = build()
    ref = ref_pipe(prompts, spec=spec, first_image_latents=first,
                   mask=mask, seed=0)

    mesh = create_mesh(data=4, model=2)
    with mesh:
        pipe = build(mesh=mesh)
        pipe.params = shard_params(pipe.params, mesh)
        video = pipe(prompts, spec=spec, first_image_latents=first,
                     mask=mask, seed=0)

    assert video.shape == ref.shape
    np.testing.assert_allclose(video, ref, atol=2e-4, rtol=2e-4)


def test_dp_wrap_shard_map_plumbing():
    """ops/fused.dp_wrap: inside data_parallel_kernels the call runs under
    shard_map (dim 0 of row args sharded over 'data', weights replicated)
    and matches the unwrapped result; outside the context it is the
    identity wrapper. On CPU the fused kernels never dispatch, so this
    pins the wrapper itself with a row-independent toy op; the Mosaic
    composition is proven by tools/dp_kernels_check.py (1-chip equality +
    AOT 2-device compile of the real fused_geglu kernel)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from followyourclick_tpu.ops.fused import data_parallel_kernels, dp_wrap

    def toy(x, w, b, scale=1.0):
        return (x @ w + b) * scale

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (16, 8))
    w = jax.random.normal(jax.random.PRNGKey(1), (8, 4))
    b = jnp.ones((4,))

    assert dp_wrap(toy) is toy  # no context: identity

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    ref = toy(x, w, b, scale=0.5)
    with data_parallel_kernels(mesh, "data"):
        wrapped = dp_wrap(toy)
        assert wrapped is not toy
        out = jax.jit(wrapped, static_argnames="scale")(x, w, b, scale=0.5)
        # multiple row args (q/k/v-style sites)
        out3 = dp_wrap(lambda a, c, s: a + c * s, n_row_args=3)(x, x, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(x + x * x),
                               atol=1e-6, rtol=1e-6)
    assert dp_wrap(toy) is toy  # context restored
