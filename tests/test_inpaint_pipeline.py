"""Functional tests for the SD-inpaint pipeline and the fill/replace
compositions (tiny random models)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # oracle/compile-heavy (deselect via -m 'not slow')

from followyourclick_tpu.config import (
    CLIPTextConfig,
    InferenceConfig,
    NoiseScheduleConfig,
    UNet3DConfig,
    VAEConfig,
)
from followyourclick_tpu.models.clip_text import CLIPTextModel
from followyourclick_tpu.models.unet3d import UNet3DConditionModel, UNetConditioning
from followyourclick_tpu.models.vae import AutoencoderKL
from followyourclick_tpu.pipelines.inpaint import InpaintPipeline


class FakeTokenizer:
    model_max_length = 77

    def __call__(self, texts, padding=None, max_length=None, truncation=False,
                 return_tensors="np"):
        import types

        ids = np.zeros((len(texts), 77), dtype=np.int64)
        for i, t in enumerate(texts):
            rs = np.random.RandomState(abs(hash(t)) % (2**31))
            ids[i] = rs.randint(0, 1000, size=77)
        return types.SimpleNamespace(input_ids=ids)


@pytest.fixture(scope="module")
def pipeline():
    cfg = InferenceConfig(
        unet=UNet3DConfig(
            block_out_channels=(32, 64, 64, 64), layers_per_block=1,
            norm_num_groups=8, use_motion_module=False,
            use_first_frame_mask_condition_concat=False,
            use_fps_condition=False),
        noise_scheduler=NoiseScheduleConfig(),
        vae=VAEConfig(block_out_channels=(32, 64, 64, 64), layers_per_block=1,
                      norm_num_groups=8, sample_size=64),
        clip_text=CLIPTextConfig(vocab_size=1000, hidden_size=768,
                                 intermediate_size=512, num_hidden_layers=2,
                                 num_attention_heads=4))
    rng = jax.random.PRNGKey(0)
    ucfg = dataclasses.replace(cfg.unet)
    unet = UNet3DConditionModel(ucfg)
    sample = jnp.zeros((2, 1, 8, 8, 4))
    cond = UNetConditioning(context=jnp.zeros((2, 77, 768)))
    unet_params = unet.init(rng, sample, jnp.zeros((2,)), cond)["params"]
    vae = AutoencoderKL(cfg.vae)
    vae_params = vae.init(rng, jnp.zeros((1, 64, 64, 3)), rng)["params"]
    text = CLIPTextModel(cfg.clip_text)
    text_params = text.init(rng, jnp.zeros((1, 77), jnp.int32))["params"]
    return InpaintPipeline(cfg, unet_params, vae_params, text_params,
                           tokenizer=FakeTokenizer())


def test_inpaint_preserves_unmasked(pipeline):
    rs = np.random.RandomState(0)
    img = (rs.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 64), np.uint8)
    mask[16:48, 16:48] = 255
    out = pipeline(img, mask, "a red ball", steps=3, seed=1)
    assert out.shape == img.shape and out.dtype == np.uint8
    np.testing.assert_array_equal(out[mask == 0], img[mask == 0])
    assert (out[mask > 0] != img[mask > 0]).any()


def test_fill_and_replace_compositions(pipeline):
    from followyourclick_tpu.inpaint.fill import (
        fill_img_with_sd,
        replace_img_with_sd,
    )

    rs = np.random.RandomState(1)
    img = (rs.rand(128, 160, 3) * 255).astype(np.uint8)
    mask = np.zeros((128, 160), np.uint8)
    mask[40:80, 50:100] = 255
    filled = fill_img_with_sd(img, mask, "a cat", pipeline, steps=2)
    assert filled.shape == img.shape
    np.testing.assert_array_equal(filled[mask == 0], img[mask == 0])

    replaced = replace_img_with_sd(img, mask, "beach", pipeline, steps=2,
                                   target_size=64)
    assert replaced.shape == img.shape
