"""End-to-end wiring of the round-2 conditioning paths: IP-Adapter image
prompts through the sampler (reference scripts/inference_w_image_cond.py:283-310),
the T5 second text tower through ``__call__``/``_sample_jit`` (reference
``_encode_prompt_2``, pipeline_animation.py:248-398), and first-frame
generation via the shared-weight TextToImagePipeline (reference
scripts/inference.py:194-204,299-309).
"""

import dataclasses

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
from followyourclick_tpu.models.ip_adapter import CLIPVisionConfig
from followyourclick_tpu.models.t5_text import T5Config
from followyourclick_tpu.pipelines.animation import AnimationPipeline, SampleSpec

from tests._oracle import setup_reference_path, tiny_unet3d_kwargs
from tests.test_pipeline_parity import FakeTokenizer

F, H, W = 4, 64, 64
LH, LW = H // 8, W // 8

TINY_VISION = CLIPVisionConfig(
    hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, image_size=32, patch_size=16, projection_dim=1024)

TINY_T5 = T5Config(vocab_size=1000, d_model=48, d_kv=8, d_ff=96,
                   num_layers=2, num_heads=4)


class FakeT5Tokenizer:
    def __call__(self, texts, padding=None, max_length=77, truncation=False,
                 return_tensors="np"):
        import types

        ids = np.zeros((len(texts), max_length), dtype=np.int64)
        for i, t in enumerate(texts):
            rs = np.random.RandomState(abs(hash("t5" + t)) % (2 ** 31))
            ids[i] = rs.randint(0, 1000, size=max_length)
        mask = np.ones_like(ids)
        return types.SimpleNamespace(input_ids=ids, attention_mask=mask)


def _tiny_cfg(**unet_overrides) -> InferenceConfig:
    return InferenceConfig(
        unet=UNet3DConfig(
            cross_attention_dim=768, attention_head_dim=8,
            block_out_channels=(32, 64, 64, 64), layers_per_block=1,
            norm_num_groups=8,
            motion_module=MotionModuleConfig(num_attention_heads=4),
            use_fps_condition=True,
            use_first_frame_mask_condition_concat=True,
            **unet_overrides),
        vae=VAEConfig(block_out_channels=(32, 32, 32, 32),
                      layers_per_block=1, norm_num_groups=8, sample_size=32),
        clip_text=CLIPTextConfig(vocab_size=1000, hidden_size=768,
                                 intermediate_size=512, num_hidden_layers=2,
                                 num_attention_heads=4))


def _init_pipeline(cfg: InferenceConfig, **pipe_kwargs) -> AnimationPipeline:
    """Randomly-initialized tiny pipeline exercising the full model graph."""
    import jax
    import jax.numpy as jnp

    from followyourclick_tpu.models.clip_text import CLIPTextModel
    from followyourclick_tpu.models.unet3d import (
        UNet3DConditionModel,
        UNetConditioning,
    )
    from followyourclick_tpu.models.vae import AutoencoderKL

    rng = jax.random.PRNGKey(0)
    ucfg = cfg.unet
    ctx_len = 77 + (ucfg.ip_num_tokens if ucfg.use_ip_cross_attention else 0)
    cond = UNetConditioning(
        context=jnp.zeros((1, ctx_len, ucfg.cross_attention_dim)),
        fps=jnp.zeros((1,)), motion_score=jnp.zeros((1,)),
        context_t5=(jnp.zeros((1, 77, ucfg.text_encoder_2_dim))
                    if ucfg.use_text_encoder_2 else None))
    unet = UNet3DConditionModel(ucfg)
    unet_params = unet.init(
        rng, jnp.zeros((1, F, LH, LW, ucfg.conv_in_channels)),
        jnp.zeros((1,), jnp.int32), cond)["params"]
    vae = AutoencoderKL(cfg.vae)
    vae_params = vae.init(rng, jnp.zeros((1, H, W, 3)), rng)["params"]
    text = CLIPTextModel(cfg.clip_text)
    text_params = text.init(rng, jnp.zeros((1, 77), jnp.int32))["params"]
    return AnimationPipeline(
        cfg, unet_params, vae_params, text_params,
        tokenizer=FakeTokenizer(), **pipe_kwargs)


def test_ip_denoise_step_parity():
    """One full UNet forward with ip tokens vs the reference UNet's in-forward
    projection + concat (unet.py:592-594) and IPCrossAttention decoupled k/v
    (attention.py:20-127), shared weights."""
    setup_reference_path()
    import jax.numpy as jnp
    import torch

    from animatediff.models.unet import UNet3DConditionModel as RefUNet
    from ip_adapter.my_ip_adapter import ImageProjModel as RefImageProj

    from followyourclick_tpu.models.ip_adapter import ImageProjModel
    from followyourclick_tpu.models.unet3d import (
        UNet3DConditionModel,
        UNetConditioning,
    )
    from followyourclick_tpu.utils.convert import (
        convert_image_proj_state_dict,
        convert_unet3d_state_dict,
    )

    torch.manual_seed(0)
    kwargs = tiny_unet3d_kwargs()
    kwargs["use_ip_cross_attention"] = True
    ref = RefUNet(**kwargs).eval()
    ref.image_proj_model = RefImageProj(
        cross_attention_dim=768, clip_embeddings_dim=1024,
        clip_extra_context_tokens=4).eval()

    rs = np.random.RandomState(0)
    sample = rs.randn(2, 9, F, LH, LW).astype(np.float32)
    context = rs.randn(2, 77, 768).astype(np.float32)
    clip_feat = rs.randn(2, 1024).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(sample), torch.tensor([5, 5]),
            encoder_hidden_states=torch.from_numpy(context),
            use_ip_cross_attention=True,
            reference_images_clip_feat=torch.from_numpy(clip_feat),
            use_fps_condition=True,
            fps_tensor=torch.tensor([8.0, 8.0]),
            flow_control=torch.tensor([20.0, 20.0]),
        ).sample.numpy()

    state = {k: v for k, v in ref.state_dict().items()}
    proj_sd = {k[len("image_proj_model."):]: v for k, v in state.items()
               if k.startswith("image_proj_model.")}
    unet_sd = {k: v for k, v in state.items()
               if not k.startswith("image_proj_model.")}

    cfg = _tiny_cfg(use_ip_cross_attention=True, ip_num_tokens=4).unet
    model = UNet3DConditionModel(cfg)
    params = convert_unet3d_state_dict(unet_sd)

    proj = ImageProjModel(cross_attention_dim=768, num_tokens=4)
    proj_params = convert_image_proj_state_dict(proj_sd)
    ip_tokens = proj.apply({"params": proj_params}, jnp.asarray(clip_feat))

    full_ctx = jnp.concatenate([jnp.asarray(context), ip_tokens], axis=1)
    cond = UNetConditioning(context=full_ctx, fps=jnp.array([8.0, 8.0]),
                            motion_score=jnp.array([20.0, 20.0]))
    got = model.apply({"params": params},
                      jnp.asarray(sample.transpose(0, 2, 3, 4, 1)),
                      jnp.array([5, 5]), cond)
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, ref_out, rtol=2e-3, atol=2e-3)


def test_ip_pipeline_end_to_end():
    """__call__ with a condition image: CLIP-vision encode → projection →
    token concat → decoupled ip attention, all inside one jitted sample."""
    import jax
    import jax.numpy as jnp

    from followyourclick_tpu.models.ip_adapter import IPAdapter

    cfg = _tiny_cfg(use_ip_cross_attention=True, ip_num_tokens=4)
    ip_module = IPAdapter(vision_config=TINY_VISION,
                          cross_attention_dim=768, num_tokens=4, plus=False)
    ip_params = ip_module.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, TINY_VISION.image_size, TINY_VISION.image_size, 3)),
    )["params"]
    pipe = _init_pipeline(cfg, ip_adapter_params=ip_params,
                          ip_vision_config=TINY_VISION)

    rs = np.random.RandomState(0)
    ip_image = rs.randn(1, TINY_VISION.image_size,
                        TINY_VISION.image_size, 3).astype(np.float32)
    spec = SampleSpec(video_length=F, height=H, width=W,
                      num_inference_steps=2, guidance_scale=7.5)
    video = pipe(
        ["a cat"], spec=spec,
        first_image_latents=jnp.asarray(
            rs.randn(1, LH, LW, 4).astype(np.float32)),
        mask=jnp.ones((1, LH, LW, 1)),
        ip_image=ip_image)
    assert video.shape == (1, F, H, W, 3)
    assert np.isfinite(video).all()

    # config demands ip tokens: calling without an image must fail loudly
    with pytest.raises(ValueError, match="ip_image"):
        pipe(["a cat"], spec=spec,
             first_image_latents=jnp.asarray(
                 rs.randn(1, LH, LW, 4).astype(np.float32)),
             mask=jnp.ones((1, LH, LW, 1)))


def test_t5_pipeline_end_to_end():
    """__call__ with the second text tower: T5 tokenize+encode → CFG-batched
    context_t5 → zero-init UNet projection + attn_t5 blocks."""
    import jax
    import jax.numpy as jnp

    from followyourclick_tpu.models.t5_text import T5EncoderModel

    cfg = _tiny_cfg(use_text_encoder_2=True, text_encoder_2_dim=TINY_T5.d_model)
    t5 = T5EncoderModel(TINY_T5)
    t5_params = t5.init(jax.random.PRNGKey(2),
                        jnp.zeros((1, 77), jnp.int32))["params"]
    pipe = _init_pipeline(cfg, t5_params=t5_params, t5_config=TINY_T5,
                          tokenizer_2=FakeT5Tokenizer())

    rs = np.random.RandomState(0)
    spec = SampleSpec(video_length=F, height=H, width=W,
                      num_inference_steps=2, guidance_scale=7.5)
    video = pipe(
        ["a dog"], spec=spec,
        first_image_latents=jnp.asarray(
            rs.randn(1, LH, LW, 4).astype(np.float32)),
        mask=jnp.ones((1, LH, LW, 1)))
    assert video.shape == (1, F, H, W, 3)
    assert np.isfinite(video).all()


def test_first_frame_generation_shared_weights():
    """TextToImagePipeline built from the video pipeline's 9-channel params
    (conv_in sliced back to 4) produces a first frame — the no-input-image
    path (reference scripts/inference.py:299-309)."""
    from followyourclick_tpu.pipelines.text_to_image import TextToImagePipeline

    cfg = _tiny_cfg()
    pipe = _init_pipeline(cfg)
    assert pipe.params["unet"]["conv_in"]["conv"]["kernel"].shape[2] == 9

    t2i = TextToImagePipeline(cfg, pipe.params["unet"], pipe.params["vae"],
                              pipe.params["text_encoder"],
                              tokenizer=pipe.tokenizer)
    img = t2i("a house", height=H, width=W, steps=2, seed=0)
    assert img.shape == (1, H, W, 3)
    assert np.isfinite(img).all()
