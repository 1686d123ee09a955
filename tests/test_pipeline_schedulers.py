"""SampleSpec.scheduler dispatch: the sampler runs its fused scan under any
of the solvers the reference AnimationPipeline accepts
(pipeline_animation.py:50-57 — DDIM/PNDM/LMS/Euler(-A)/DPM-Solver), via the
uniform protocol in schedulers/dispatch.py. Solver math itself is
golden-tested in tests/test_solvers.py; here we pin the pipeline wiring:
every name produces a finite video, the k-diffusion family actually applies
its sigma scaling (output differs from DDIM), and the default stays DDIM.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # one XLA:CPU pipeline compile per scheduler

from followyourclick_tpu.config import (
    CLIPTextConfig,
    InferenceConfig,
    MotionModuleConfig,
    UNet3DConfig,
    VAEConfig,
)
from followyourclick_tpu.models.unet3d import UNetConditioning
from followyourclick_tpu.schedulers.dispatch import SCHEDULERS, make_solver


@pytest.fixture(scope="module")
def pipe():
    from followyourclick_tpu.pipelines.animation import AnimationPipeline

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
    p = AnimationPipeline(cfg, None, None, None)
    ids = jnp.zeros((1, 77), jnp.int32)
    sample = jnp.zeros((2, 2, 8, 8, 9))
    cond = UNetConditioning(context=jnp.zeros((2, 77, 768)),
                            fps=jnp.full((2,), 8.0),
                            motion_score=jnp.full((2,), 20.0))
    p.params = {
        "unet": p.unet.init(rng, sample, jnp.zeros((2,), jnp.int32),
                            cond)["params"],
        "vae": p.vae.init(rng, jnp.zeros((1, 64, 64, 3)), rng)["params"],
        "text_encoder": p.text_encoder.init(rng, ids)["params"],
    }
    return p


def _run(pipe, scheduler, steps=3, **spec_kw):
    from followyourclick_tpu.pipelines.animation import SampleSpec

    spec = SampleSpec(video_length=2, height=64, width=64,
                      num_inference_steps=steps, guidance_scale=7.5,
                      scheduler=scheduler, **spec_kw)
    first = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 4)) * 0.2
    mask = jnp.ones((1, 8, 8, 1))
    ids = jax.random.randint(jax.random.PRNGKey(9), (1, 77), 0, 1000)
    return np.asarray(pipe._sample_jit(
        pipe.params, ids, jnp.zeros((1, 77), jnp.int32),
        jax.random.PRNGKey(3), spec,
        first_image_latents=first, mask=mask,
        fps=jnp.full((1,), 8.0), motion_score=jnp.full((1,), 20.0)))


@pytest.mark.parametrize("scheduler", [s for s in SCHEDULERS
                                       if s != "pndm_prk"])
def test_every_scheduler_samples_finite(pipe, scheduler):
    video = _run(pipe, scheduler)
    assert video.shape == (1, 2, 64, 64, 3)
    assert np.isfinite(video).all()


def test_pndm_prk_grid_runs(pipe):
    # PRK needs >=4 coarse steps for its 12-call warmup grid
    video = _run(pipe, "pndm_prk", steps=5)
    assert video.shape == (1, 2, 64, 64, 3)
    assert np.isfinite(video).all()


def test_solvers_actually_differ_from_ddim(pipe):
    ddim = _run(pipe, "ddim")
    euler = _run(pipe, "euler")
    dpm = _run(pipe, "dpm++")
    # same seed, same model — a solver that silently fell through to DDIM
    # would match it exactly
    assert not np.allclose(euler, ddim, atol=1e-4)
    assert not np.allclose(dpm, ddim, atol=1e-4)


def test_cfg_prefix_share_matches_duplicated(pipe):
    """CFG prefix sharing (SampleSpec.share_cfg_prefix, exact math: the
    UNet stem runs once at half batch, duplication happens at the first
    cross-attention) must reproduce the reference-style pre-duplicated
    call to numerical noise."""
    shared = _run(pipe, "ddim")                          # default: True
    duped = _run(pipe, "ddim", share_cfg_prefix=False)
    np.testing.assert_allclose(shared, duped, atol=2e-4, rtol=2e-4)


def test_solver_call_counts():
    from followyourclick_tpu.config import NoiseScheduleConfig

    cfg = NoiseScheduleConfig()
    assert make_solver("ddim", cfg, 8).n_calls == 8
    assert make_solver("pndm", cfg, 8).n_calls == 9       # PLMS dup step
    assert make_solver("pndm_prk", cfg, 8).n_calls == 17  # 12 PRK + S-3
    assert make_solver("euler", cfg, 8).n_calls == 8
    assert make_solver("lms", cfg, 8).n_calls == 8
    assert make_solver("dpm++3", cfg, 8).sched.solver_order == 3


def test_unknown_scheduler_raises():
    from followyourclick_tpu.config import NoiseScheduleConfig

    with pytest.raises(ValueError, match="unknown scheduler"):
        make_solver("heun", NoiseScheduleConfig(), 8)
