"""PAB-style attention reuse (models/pab.py + the sampler's _denoise_pab).

OPT-IN approximation — these tests pin the mechanics, not parity:
  * record mode populates the "pab" collection at every attention site
  * reuse mode actually READS the cache (doctoring it changes the output)
  * reuse with a cache recorded from the same input reproduces the exact
    output bit-for-bit (the skipped sublayers contribute identical values)
  * the pipeline runs end-to-end with intervals > 1 and stays finite
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # oracle/compile-heavy (deselect via -m 'not slow')

from followyourclick_tpu.config import (
    CLIPTextConfig,
    InferenceConfig,
    MotionModuleConfig,
    UNet3DConfig,
    VAEConfig,
)
from followyourclick_tpu.models.pab import PabMode
from followyourclick_tpu.models.unet3d import UNet3DConditionModel, UNetConditioning


def tiny_cfg():
    return UNet3DConfig(
        sample_size=32, cross_attention_dim=768, attention_head_dim=8,
        block_out_channels=(32, 64, 64, 64), layers_per_block=1,
        norm_num_groups=8,
        motion_module=MotionModuleConfig(num_attention_heads=4),
        use_fps_condition=True,
        use_first_frame_mask_condition_concat=True)


@pytest.fixture(scope="module")
def unet_setup():
    cfg = tiny_cfg()
    unet = UNet3DConditionModel(cfg)
    rng = jax.random.PRNGKey(0)
    b, f, hw = 1, 2, 16
    sample = jax.random.normal(rng, (b, f, hw, hw, 9)) * 0.1
    t = jnp.zeros((b,), jnp.int32)
    cond = UNetConditioning(
        context=jax.random.normal(rng, (b, 77, 768)) * 0.02,
        fps=jnp.full((b,), 8.0), motion_score=jnp.full((b,), 20.0))
    params = unet.init(rng, sample, t, cond)["params"]
    return cfg, params, sample, t, cond


RECORD_ALL = PabMode(record_spatial=True, record_cross=True,
                     record_temporal=True)
REUSE_ALL = PabMode(reuse_spatial=True, reuse_cross=True, reuse_temporal=True,
                    record_spatial=True, record_cross=True,
                    record_temporal=True)


def test_record_populates_all_sites(unet_setup):
    cfg, params, sample, t, cond = unet_setup
    unet = UNet3DConditionModel(cfg, pab=RECORD_ALL)
    out, mut = unet.apply({"params": params}, sample, t, cond,
                          mutable=["pab"])
    leaves = jax.tree_util.tree_leaves(mut["pab"])
    # every spatial transformer contributes attn1+attn2, every motion module
    # 2 temporal attentions; the tiny config has 3+1+3 CrossAttn blocks and
    # motion modules in all non-mid blocks
    assert len(leaves) >= 20, len(leaves)
    # exact forward is unchanged by recording
    ref = UNet3DConditionModel(cfg).apply({"params": params}, sample, t, cond)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_reuse_reproduces_exact_and_reads_cache(unet_setup):
    cfg, params, sample, t, cond = unet_setup
    rec = UNet3DConditionModel(cfg, pab=RECORD_ALL)
    out_rec, mut = rec.apply({"params": params}, sample, t, cond,
                             mutable=["pab"])
    cache = mut["pab"]

    reuse = UNet3DConditionModel(cfg, pab=REUSE_ALL)
    out_reuse, mut2 = reuse.apply({"params": params, "pab": cache},
                                  sample, t, cond, mutable=["pab"])
    # same input + same cache → bit-identical output
    np.testing.assert_array_equal(np.asarray(out_rec), np.asarray(out_reuse))
    # the write-back keeps the collection tree identical (scan-carry shape)
    assert (jax.tree_util.tree_structure(dict(mut["pab"]))
            == jax.tree_util.tree_structure(dict(mut2["pab"])))

    # doctor one cached attention output → output must change (proves the
    # reuse path reads the cache instead of recomputing)
    doctored = jax.tree_util.tree_map(lambda x: x + 1.0, cache)
    out_doc = reuse.apply({"params": params, "pab": doctored},
                          sample, t, cond, mutable=["pab"])[0]
    assert not np.allclose(np.asarray(out_doc), np.asarray(out_rec))


def test_deep_trunk_record_and_reuse(unet_setup):
    """DeepCache-style trunk reuse (PabMode.reuse_deep): recording writes
    the trunk output into the "pab" collection; reusing against a cache
    recorded from the SAME input is bit-exact; the reuse path actually
    reads the cache (doctoring it changes the output); and a trunk-reuse
    application returns a SUBTREE of the cache (the sampler's _merge_cache
    carries the untouched interior-site entries forward)."""
    import dataclasses

    cfg, params, sample, t, cond = unet_setup
    rec_mode = dataclasses.replace(RECORD_ALL, record_deep=True)
    rec = UNet3DConditionModel(cfg, pab=rec_mode)
    out_rec, mut = rec.apply({"params": params}, sample, t, cond,
                             mutable=["pab"])
    cache = mut["pab"]
    assert "deep_trunk" in cache

    reuse_mode = dataclasses.replace(rec_mode, reuse_deep=True)
    reuse = UNet3DConditionModel(cfg, pab=reuse_mode)
    out_reuse, mut2 = reuse.apply({"params": params, "pab": cache},
                                  sample, t, cond, mutable=["pab"])
    np.testing.assert_array_equal(np.asarray(out_rec), np.asarray(out_reuse))

    # the returned collection keeps the full tree structure (flax passes
    # untouched entries through), so the sampler's scan carry stays uniform
    assert (jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda x: 0, dict(mut2["pab"])))
        == jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda x: 0, dict(cache))))

    # the trunk is genuinely SKIPPED, not recomputed: the reuse variant's
    # lowered FLOPs must be well below the record variant's
    def flops(unet, extra):
        lowered = jax.jit(lambda p, s: unet.apply(
            {"params": p, **extra}, s, t, cond, mutable=["pab"])).lower(
            params, sample)
        return lowered.cost_analysis()["flops"]

    f_rec = flops(rec, {})
    f_reuse = flops(reuse, {"pab": cache})
    assert f_reuse < 0.7 * f_rec, (f_reuse, f_rec)

    doctored = dict(cache)
    doctored["deep_trunk"] = doctored["deep_trunk"] + 1.0
    out_doc = reuse.apply({"params": params, "pab": doctored},
                          sample, t, cond, mutable=["pab"])[0]
    assert not np.allclose(np.asarray(out_doc), np.asarray(out_rec))


def test_deep_trunk_extrapolation(unet_setup):
    """First-order trunk forecast (PabMode.deep_extrapolate, models/pab.py
    _deep_ex_site): the first record sets prev = cur (slope 0) so reuse at
    any coefficient matches plain reuse bit-exactly; a second record shifts
    the old trunk into prev; and with prev != cur a positive coefficient
    produces an output different from plain (coeff-0) reuse while coeff 0
    still matches it."""
    import dataclasses

    cfg, params, sample, t, cond = unet_setup
    rec_mode = dataclasses.replace(RECORD_ALL, record_deep=True,
                                   deep_extrapolate=True)
    rec = UNet3DConditionModel(cfg, pab=rec_mode)
    out_rec, mut = rec.apply({"params": params}, sample, t, cond,
                             mutable=["pab"])
    cache = dict(mut["pab"])
    for k in ("deep_trunk", "deep_trunk_prev", "deep_trunk_valid"):
        assert k in cache, k
    np.testing.assert_array_equal(np.asarray(cache["deep_trunk"]),
                                  np.asarray(cache["deep_trunk_prev"]))
    assert float(cache["deep_trunk_valid"]) == 1.0

    # slope 0 (first period): forecast reuse == plain reuse == exact output
    reuse_mode = dataclasses.replace(rec_mode, reuse_deep=True,
                                     deep_ex_coeff=0.75)
    reuse = UNet3DConditionModel(cfg, pab=reuse_mode)
    out_reuse = reuse.apply({"params": params, "pab": cache},
                            sample, t, cond, mutable=["pab"])[0]
    np.testing.assert_array_equal(np.asarray(out_rec), np.asarray(out_reuse))

    # a second record from a different input shifts cur → prev
    out_rec2, mut2 = rec.apply({"params": params, "pab": cache},
                               sample + 0.05, t, cond, mutable=["pab"])
    cache2 = dict(mut2["pab"])
    np.testing.assert_array_equal(np.asarray(cache2["deep_trunk_prev"]),
                                  np.asarray(cache["deep_trunk"]))
    assert not np.allclose(np.asarray(cache2["deep_trunk"]),
                           np.asarray(cache2["deep_trunk_prev"]))

    # with a real slope: coeff 0 == plain reuse, coeff > 0 differs from it
    plain_mode = dataclasses.replace(rec_mode, reuse_deep=True,
                                     deep_extrapolate=False)
    out_plain = UNet3DConditionModel(cfg, pab=plain_mode).apply(
        {"params": params, "pab": cache2}, sample, t, cond,
        mutable=["pab"])[0]
    out_c0 = UNet3DConditionModel(
        cfg, pab=dataclasses.replace(reuse_mode, deep_ex_coeff=0.0)).apply(
        {"params": params, "pab": cache2}, sample, t, cond,
        mutable=["pab"])[0]
    np.testing.assert_allclose(np.asarray(out_c0), np.asarray(out_plain),
                               atol=1e-6)
    out_c = reuse.apply({"params": params, "pab": cache2},
                        sample, t, cond, mutable=["pab"])[0]
    assert not np.allclose(np.asarray(out_c), np.asarray(out_plain))

    # reuse never writes: the trunk entries pass through UNCHANGED (writing
    # the forecast back would corrupt the slope base of later steps)
    _, mut3 = reuse.apply({"params": params, "pab": cache2},
                          sample, t, cond, mutable=["pab"])
    for k in ("deep_trunk", "deep_trunk_prev", "deep_trunk_valid"):
        np.testing.assert_array_equal(np.asarray(dict(mut3["pab"])[k]),
                                      np.asarray(cache2[k]))


def _tiny_pipe():
    from followyourclick_tpu.pipelines.animation import AnimationPipeline

    class FakeTokenizer:
        model_max_length = 77

        def __call__(self, texts, padding=None, max_length=None,
                     truncation=False, return_tensors="np"):
            import types
            ids = np.zeros((len(texts), 77), dtype=np.int64)
            for i, t in enumerate(texts):
                rs = np.random.RandomState(abs(hash(t)) % (2 ** 31))
                ids[i] = rs.randint(0, 1000, size=77)
            return types.SimpleNamespace(input_ids=ids)

    cfg = InferenceConfig(
        unet=tiny_cfg(),
        vae=VAEConfig(block_out_channels=(32, 64, 64, 64), layers_per_block=1,
                      norm_num_groups=8, sample_size=64),
        clip_text=CLIPTextConfig(vocab_size=1000, hidden_size=768,
                                 intermediate_size=512, num_hidden_layers=2,
                                 num_attention_heads=4))
    rng = jax.random.PRNGKey(0)
    pipe = AnimationPipeline(cfg, None, None, None, tokenizer=FakeTokenizer())
    ids = jnp.zeros((1, 77), jnp.int32)
    sample = jnp.zeros((2, 2, 8, 8, 9))
    cond = UNetConditioning(context=jnp.zeros((2, 77, 768)),
                            fps=jnp.full((2,), 8.0),
                            motion_score=jnp.full((2,), 20.0))
    pipe.params = {
        "unet": pipe.unet.init(rng, sample, jnp.zeros((2,), jnp.int32),
                               cond)["params"],
        "vae": pipe.vae.init(rng, jnp.zeros((1, 64, 64, 3)), rng)["params"],
        "text_encoder": pipe.text_encoder.init(rng, ids)["params"],
    }
    return pipe


def test_pipeline_pab_end_to_end():
    from followyourclick_tpu.pipelines.animation import SampleSpec

    pipe = _tiny_pipe()

    spec = SampleSpec(video_length=2, height=64, width=64,
                      num_inference_steps=5, guidance_scale=7.5,
                      pab_spatial_interval=2, pab_cross_interval=2,
                      pab_temporal_interval=2)
    first = jnp.zeros((1, 8, 8, 4))
    mask = jnp.ones((1, 8, 8, 1))
    video = pipe(["a prompt"], spec=spec, first_image_latents=first,
                 mask=mask, seed=0)
    assert video.shape == (1, 2, 64, 64, 3)
    assert np.isfinite(video).all()

    # intervals=1 goes through the exact scan path and still works
    spec1 = SampleSpec(video_length=2, height=64, width=64,
                       num_inference_steps=3, guidance_scale=7.5)
    video1 = pipe(["a prompt"], spec=spec1, first_image_latents=first,
                  mask=mask, seed=0)
    assert np.isfinite(video1).all()


def test_pipeline_deep_only_cfg_cache_runs():
    """Regression: a PAB-less DeepCache ∘ cfg-cache composition (attention
    kinds not in the reuse schedule) used to trip the half-batch cache
    assert in pab_site — non-participating kinds must just compute. Also
    covers deep_cache_extrapolate end-to-end (finite, and actually changes
    the output vs the plain trunk cache)."""
    from followyourclick_tpu.pipelines.animation import SampleSpec

    pipe = _tiny_pipe()
    first = jnp.zeros((1, 8, 8, 4))
    mask = jnp.ones((1, 8, 8, 1))
    base = dict(video_length=2, height=64, width=64,
                num_inference_steps=6, guidance_scale=7.5)

    plain = pipe(["a prompt"], spec=SampleSpec(
        **base, deep_cache_interval=2, cfg_cache_interval=4),
        first_image_latents=first, mask=mask, seed=0)
    assert np.isfinite(plain).all()

    dex = pipe(["a prompt"], spec=SampleSpec(
        **base, deep_cache_interval=2, cfg_cache_interval=4,
        deep_cache_extrapolate=True),
        first_image_latents=first, mask=mask, seed=0)
    assert np.isfinite(dex).all()
    assert not np.allclose(np.asarray(dex), np.asarray(plain)), \
        "trunk extrapolation had no effect on the sampled video"


def test_half_mode_matches_cond_half(unet_setup):
    """A cond-half application with half=True reuse must reproduce the cond
    half of the full-CFG application exactly (rows are independent)."""
    cfg, params, sample, t, cond = unet_setup
    # build a CFG-like batch of 2 by stacking two different samples
    sample2 = jnp.concatenate([sample, sample * 0.5 + 0.1], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    cond2 = UNetConditioning(
        context=jnp.concatenate([cond.context, cond.context * 0.7], axis=0),
        fps=jnp.concatenate([cond.fps, cond.fps]),
        motion_score=jnp.concatenate([cond.motion_score, cond.motion_score]))

    rec = UNet3DConditionModel(cfg, pab=RECORD_ALL)
    out_full, mut = rec.apply({"params": params}, sample2, t2, cond2,
                              mutable=["pab"])
    cache = mut["pab"]

    import dataclasses
    half_mode = dataclasses.replace(REUSE_ALL, half=True)
    half = UNet3DConditionModel(cfg, pab=half_mode)
    b = sample.shape[0]
    cond_half = UNetConditioning(context=cond2.context[b:],
                                 fps=cond2.fps[b:],
                                 motion_score=cond2.motion_score[b:])
    out_half, _ = half.apply({"params": params, "pab": cache},
                             sample2[b:], t2[b:], cond_half, mutable=["pab"])
    np.testing.assert_allclose(np.asarray(out_half),
                               np.asarray(out_full[b:]), atol=1e-5,
                               rtol=1e-5)


def test_pipeline_pab_cfg_composition():
    from followyourclick_tpu.pipelines.animation import (
        AnimationPipeline,
        SampleSpec,
    )

    class FakeTokenizer:
        model_max_length = 77

        def __call__(self, texts, padding=None, max_length=None,
                     truncation=False, return_tensors="np"):
            import types
            ids = np.zeros((len(texts), 77), dtype=np.int64)
            for i, t in enumerate(texts):
                rs = np.random.RandomState(abs(hash(t)) % (2 ** 31))
                ids[i] = rs.randint(0, 1000, size=77)
            return types.SimpleNamespace(input_ids=ids)

    cfg = InferenceConfig(
        unet=tiny_cfg(),
        vae=VAEConfig(block_out_channels=(32, 64, 64, 64), layers_per_block=1,
                      norm_num_groups=8, sample_size=64),
        clip_text=CLIPTextConfig(vocab_size=1000, hidden_size=768,
                                 intermediate_size=512, num_hidden_layers=2,
                                 num_attention_heads=4))
    rng = jax.random.PRNGKey(0)
    pipe = AnimationPipeline(cfg, None, None, None, tokenizer=FakeTokenizer())
    ids = jnp.zeros((1, 77), jnp.int32)
    sample = jnp.zeros((2, 2, 8, 8, 9))
    cond = UNetConditioning(context=jnp.zeros((2, 77, 768)),
                            fps=jnp.full((2,), 8.0),
                            motion_score=jnp.full((2,), 20.0))
    pipe.params = {
        "unet": pipe.unet.init(rng, sample, jnp.zeros((2,), jnp.int32),
                               cond)["params"],
        "vae": pipe.vae.init(rng, jnp.zeros((1, 64, 64, 3)), rng)["params"],
        "text_encoder": pipe.text_encoder.init(rng, ids)["params"],
    }
    spec = SampleSpec(video_length=2, height=64, width=64,
                      num_inference_steps=9, guidance_scale=7.5,
                      pab_spatial_interval=2, pab_cross_interval=2,
                      pab_temporal_interval=2, cfg_cache_interval=4)
    first = jnp.zeros((1, 8, 8, 4))
    mask = jnp.ones((1, 8, 8, 1))
    video = pipe(["a prompt"], spec=spec, first_image_latents=first,
                 mask=mask, seed=0)
    assert video.shape == (1, 2, 64, 64, 3)
    assert np.isfinite(video).all()


def test_pab_cfg_composed_schedule_quality_budget():
    """End-to-end quality budget for the shipped composed serving schedules
    vs the exact sampler. Round-5 change (VERDICT r04 ask #7): the gate now
    runs the SAME harness as tools/serving_sweep.py — utils/quality.py's
    build_quality_pipeline("tiny", seed=0) + run_schedule — so the gate and
    the sweep can never again disagree (the round-4 34 % discrepancy on
    pab288 was two different random-init weight sets: this test used to
    init with an unsplit PRNGKey(0) while the sweep splits it 3-way).

    Thresholds are the 5-seed MAX drift measured on this harness + ~30 %
    rel-l2 / − 3 dB (seed spread quantified per VERDICT r04 weak #4;
    docs/PERF.md "Serving quality budget" carries the per-seed table).
    Each schedule must also actually differ from exact (a spec-plumbing
    break that silently disables the approximation also fails).
    PAB framing: arXiv 2408.12588; DeepCache trunk reuse: arXiv 2312.00858
    family."""
    from followyourclick_tpu.pipelines.animation import SampleSpec
    from followyourclick_tpu.utils.quality import (
        build_quality_pipeline,
        drift_metrics,
        run_schedule,
    )

    pipe = build_quality_pipeline("tiny", seed=0)
    f, px, hl = 8, 128, 16
    base = dict(video_length=f, height=px, width=px,
                num_inference_steps=25, guidance_scale=8.0,
                use_interpolate_noise=True)
    exact = run_schedule(pipe, SampleSpec(**base), f, (hl, hl))

    # (schedule overrides, rel-l2 ceiling, PSNR floor) — bounds are the
    # round-5 multi-seed max + ~30 % / − 3 dB (tools/serving_sweep.py
    # --seeds 0 1 2 3 4; per-seed table in docs/PERF.md). Measured maxima:
    # pab222 0.0701, pab244 0.0710, pab244_deep 0.0749, pab288_deep 0.0764
    # (flagship-shape: 0.0815), pab488_deep 0.0769.
    schedules = {
        "pab222_cfg4": (dict(pab_spatial_interval=2, pab_temporal_interval=2,
                             pab_cross_interval=2, cfg_cache_interval=4),
                        0.092, 24.0),
        "pab244_cfg4": (dict(pab_spatial_interval=2, pab_temporal_interval=4,
                             pab_cross_interval=4, cfg_cache_interval=4),
                        0.093, 24.0),
        "pab244_deep4_cfg4_ex": (
            dict(pab_spatial_interval=2, pab_temporal_interval=4,
                 pab_cross_interval=4, cfg_cache_interval=4,
                 deep_cache_interval=4, cfg_cache_extrapolate=True),
            0.098, 23.5),
        "pab288_deep4_cfg4_ex": (
            dict(pab_spatial_interval=2, pab_temporal_interval=8,
                 pab_cross_interval=8, cfg_cache_interval=4,
                 deep_cache_interval=4, cfg_cache_extrapolate=True),
            0.100, 23.5),
        "pab488_deep4_cfg4_ex": (
            dict(pab_spatial_interval=4, pab_temporal_interval=8,
                 pab_cross_interval=8, cfg_cache_interval=4,
                 deep_cache_interval=4, cfg_cache_extrapolate=True),
            0.100, 23.5),
    }
    for name, (kw, l2_max, psnr_min) in schedules.items():
        approx = run_schedule(pipe, SampleSpec(**base, **kw), f, (hl, hl))
        m = drift_metrics(approx, exact)
        assert m["rel_l2"] <= l2_max, f"{name} drifted: {m}"
        assert m["psnr_db"] >= psnr_min, f"{name} drifted: {m}"
        # the schedule must be live — identical output means the opt-in
        # approximation flags silently stopped reaching the sampler
        assert m["rel_l2"] > 1e-4, f"{name} inactive (identical to exact)"


def test_pab_warmup_full_equals_exact():
    """pab_warmup_steps >= num_inference_steps makes every step a
    full-compute record step — the result must match the exact scan path."""
    import types

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
        unet=tiny_cfg(),
        vae=VAEConfig(block_out_channels=(32, 64, 64, 64), layers_per_block=1,
                      norm_num_groups=8, sample_size=64),
        clip_text=CLIPTextConfig(vocab_size=1000, hidden_size=768,
                                 intermediate_size=512, num_hidden_layers=2,
                                 num_attention_heads=4))
    rng = jax.random.PRNGKey(0)
    pipe = AnimationPipeline(cfg, None, None, None, tokenizer=FakeTokenizer())
    ids = jnp.zeros((1, 77), jnp.int32)
    sample = jnp.zeros((2, 2, 8, 8, 9))
    cond = UNetConditioning(context=jnp.zeros((2, 77, 768)),
                            fps=jnp.full((2,), 8.0),
                            motion_score=jnp.full((2,), 20.0))
    pipe.params = {
        "unet": pipe.unet.init(rng, sample, jnp.zeros((2,), jnp.int32),
                               cond)["params"],
        "vae": pipe.vae.init(rng, jnp.zeros((1, 64, 64, 3)), rng)["params"],
        "text_encoder": pipe.text_encoder.init(rng, ids)["params"],
    }
    first = jnp.zeros((1, 8, 8, 4))
    mask = jnp.ones((1, 8, 8, 1))

    exact_spec = SampleSpec(video_length=2, height=64, width=64,
                            num_inference_steps=3, guidance_scale=7.5)
    ref = pipe(["p"], spec=exact_spec, first_image_latents=first,
               mask=mask, seed=0)

    warm_spec = exact_spec.replace(pab_spatial_interval=2,
                                   pab_cross_interval=2,
                                   pab_temporal_interval=2,
                                   pab_warmup_steps=3)
    got = pipe(["p"], spec=warm_spec, first_image_latents=first,
               mask=mask, seed=0)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_decode_latents_chunked_matches_batched():
    """frame_chunk>0 (the rematerialized scanned decode for memory-bound
    shapes) must reproduce the default one-batch decode."""
    from followyourclick_tpu.models.vae import AutoencoderKL
    from followyourclick_tpu.config import VAEConfig
    from followyourclick_tpu.pipelines.animation import AnimationPipeline

    cfg = InferenceConfig(
        unet=tiny_cfg(),
        vae=VAEConfig(block_out_channels=(32, 64, 64, 64), layers_per_block=1,
                      norm_num_groups=8, sample_size=64),
        clip_text=CLIPTextConfig(vocab_size=1000, hidden_size=768,
                                 intermediate_size=512, num_hidden_layers=2,
                                 num_attention_heads=4))
    pipe = AnimationPipeline(cfg, None, None, None)
    rng = jax.random.PRNGKey(0)
    pipe.params = {"vae": pipe.vae.init(
        rng, jnp.zeros((1, 64, 64, 3)), rng)["params"]}

    lat = jax.random.normal(rng, (2, 3, 8, 8, 4)) * 0.5
    batched = pipe.decode_latents(pipe.params, lat)            # one batch
    for chunk in (1, 2, 3):
        scanned = pipe.decode_latents(pipe.params, lat, frame_chunk=chunk)
        np.testing.assert_allclose(np.asarray(scanned), np.asarray(batched),
                                   atol=1e-5, rtol=1e-5)


def test_cfg_cache_extrapolate_paths():
    """cfg_cache_extrapolate (first-order uncond forecast) runs on BOTH
    cfg-cache paths — the exact-scan lax.cond path and the PAB composed
    static schedule — changes the output vs the plain hold-cache, and is
    inert when no caching is active (pipelines/animation.py)."""
    from followyourclick_tpu.pipelines.animation import SampleSpec
    from followyourclick_tpu.utils.quality import (
        build_quality_pipeline,
        run_schedule,
    )

    pipe = build_quality_pipeline("tiny")
    frames, hl = 2, 8
    base = dict(video_length=frames, height=64, width=64,
                num_inference_steps=8, guidance_scale=7.5,
                use_interpolate_noise=True)

    exact = run_schedule(pipe, SampleSpec(**base), frames, (hl, hl))

    # pure cfg-cache scan path
    plain = run_schedule(pipe, SampleSpec(**base, cfg_cache_interval=3),
                         frames, (hl, hl))
    ex = run_schedule(
        pipe, SampleSpec(**base, cfg_cache_interval=3,
                         cfg_cache_extrapolate=True), frames, (hl, hl))
    assert np.isfinite(ex).all()
    assert np.abs(ex - plain).max() > 1e-6, "extrapolation inactive"

    # composed PAB ∘ cfg-cache static schedule
    pab_kw = dict(pab_spatial_interval=2, pab_temporal_interval=4,
                  pab_cross_interval=4, cfg_cache_interval=4)
    plain_pab = run_schedule(pipe, SampleSpec(**base, **pab_kw),
                             frames, (hl, hl))
    ex_pab = run_schedule(
        pipe, SampleSpec(**base, **pab_kw, cfg_cache_extrapolate=True),
        frames, (hl, hl))
    assert np.isfinite(ex_pab).all()
    assert np.abs(ex_pab - plain_pab).max() > 1e-6, "extrapolation inactive"

    # no caching → the flag must be a no-op (exact math)
    noop = run_schedule(pipe, SampleSpec(**base, cfg_cache_extrapolate=True),
                        frames, (hl, hl))
    np.testing.assert_array_equal(noop, exact)
