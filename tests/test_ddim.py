"""Golden parity tests for the DDIM scheduler vs the PyTorch reference
(diffusers 0.11.1 + zero-SNR backport, scheduling_ddim.py)."""

import numpy as np
import pytest

from followyourclick_tpu.config import NoiseScheduleConfig
from followyourclick_tpu.schedulers import (
    DDIMSchedule,
    add_noise,
    ddim_step,
    get_velocity,
)

from tests._oracle import setup_reference_path


def _ref_scheduler(cfg: NoiseScheduleConfig):
    setup_reference_path()
    from diffusers.schedulers.scheduling_ddim import DDIMScheduler

    return DDIMScheduler(
        num_train_timesteps=cfg.num_train_timesteps,
        beta_start=cfg.beta_start,
        beta_end=cfg.beta_end,
        beta_schedule=cfg.beta_schedule,
        steps_offset=cfg.steps_offset,
        clip_sample=cfg.clip_sample,
        set_alpha_to_one=cfg.set_alpha_to_one,
        prediction_type=cfg.prediction_type,
        rescale_betas_zero_snr=cfg.rescale_betas_zero_snr,
    )


CONFIGS = [
    NoiseScheduleConfig(),  # the Follow-Your-Click regime: v-pred + zero-SNR
    NoiseScheduleConfig(prediction_type="epsilon", rescale_betas_zero_snr=False),
    NoiseScheduleConfig(prediction_type="epsilon", beta_schedule="scaled_linear",
                        rescale_betas_zero_snr=False),
    NoiseScheduleConfig(prediction_type="sample", rescale_betas_zero_snr=False,
                        clip_sample=True),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=[c.prediction_type + (
    "-zsnr" if c.rescale_betas_zero_snr else "") + "-" + c.beta_schedule
    for c in CONFIGS])
def test_tables_match_reference(cfg):
    ref = _ref_scheduler(cfg)
    ref.set_timesteps(25)
    sched = DDIMSchedule.create(cfg, 25)

    np.testing.assert_allclose(
        np.asarray(sched.alphas_cumprod),
        ref.alphas_cumprod.numpy(),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_array_equal(
        np.asarray(sched.timesteps), ref.timesteps.numpy())
    assert float(sched.final_alpha_cumprod) == float(ref.final_alpha_cumprod)


def test_zero_snr_terminal_alpha_is_zero():
    sched = DDIMSchedule.create(NoiseScheduleConfig(), 25)
    assert abs(float(sched.alphas_cumprod[-1])) < 1e-10


@pytest.mark.parametrize("cfg", CONFIGS, ids=[c.prediction_type + (
    "-zsnr" if c.rescale_betas_zero_snr else "") for c in CONFIGS])
def test_step_matches_reference(cfg):
    import torch

    ref = _ref_scheduler(cfg)
    num_steps = 25
    ref.set_timesteps(num_steps)
    sched = DDIMSchedule.create(cfg, num_steps)

    rs = np.random.RandomState(0)
    sample = rs.randn(2, 4, 8, 8).astype(np.float32)
    model_out = rs.randn(2, 4, 8, 8).astype(np.float32)

    for step_index in [0, 7, 12, 24]:
        t = int(ref.timesteps[step_index])
        ref_prev = ref.step(
            torch.from_numpy(model_out), t, torch.from_numpy(sample)
        ).prev_sample.numpy()
        got_prev, _ = ddim_step(sched, model_out, step_index, sample)
        np.testing.assert_allclose(np.asarray(got_prev), ref_prev,
                                   rtol=2e-4, atol=2e-5)


def test_full_denoise_trajectory_matches_reference():
    """Run all 25 steps with a fake 'model' = fixed linear map; trajectories
    must track the reference end to end (accumulated error bound)."""
    import torch

    cfg = NoiseScheduleConfig()
    ref = _ref_scheduler(cfg)
    ref.set_timesteps(25)
    sched = DDIMSchedule.create(cfg, 25)

    rs = np.random.RandomState(1)
    x_ref = rs.randn(1, 4, 8, 8).astype(np.float32)
    x_jax = x_ref.copy()
    w = rs.randn(4, 4).astype(np.float32) * 0.1

    def fake_model(x):
        return np.einsum("oc,bchw->bohw", w, x)

    for i in range(25):
        mo = fake_model(x_ref)
        x_ref = ref.step(torch.from_numpy(mo), int(ref.timesteps[i]),
                         torch.from_numpy(x_ref)).prev_sample.numpy()
        mo_j = fake_model(x_jax)
        x_jax = np.asarray(ddim_step(sched, mo_j, i, x_jax)[0])

    np.testing.assert_allclose(x_jax, x_ref, rtol=1e-3, atol=1e-4)


def test_add_noise_and_velocity_match_reference():
    import torch

    cfg = NoiseScheduleConfig()
    ref = _ref_scheduler(cfg)
    sched = DDIMSchedule.create(cfg, 25)

    rs = np.random.RandomState(2)
    x0 = rs.randn(3, 4, 8, 8).astype(np.float32)
    noise = rs.randn(3, 4, 8, 8).astype(np.float32)
    ts = np.array([0, 499, 998], dtype=np.int64)  # 999 has alpha=0 (zsnr)

    ref_noisy = ref.add_noise(torch.from_numpy(x0), torch.from_numpy(noise),
                              torch.from_numpy(ts)).numpy()
    got_noisy = np.asarray(add_noise(sched, x0, noise, ts))
    np.testing.assert_allclose(got_noisy, ref_noisy, rtol=1e-4, atol=1e-5)

    ref_v = ref.get_velocity(torch.from_numpy(x0), torch.from_numpy(noise),
                             torch.from_numpy(ts)).numpy()
    got_v = np.asarray(get_velocity(sched, x0, noise, ts))
    np.testing.assert_allclose(got_v, ref_v, rtol=1e-4, atol=1e-5)


def test_step_is_scan_compatible():
    """The step must trace under jit/scan with a traced step_index."""
    import jax
    import jax.numpy as jnp

    sched = DDIMSchedule.create(NoiseScheduleConfig(), 25)
    x = jnp.ones((1, 4, 8, 8))

    def body(carry, i):
        out, _ = ddim_step(sched, carry * 0.1, i, carry)
        return out, ()

    final, _ = jax.jit(
        lambda x: jax.lax.scan(body, x, jnp.arange(25))
    )(x)
    assert final.shape == x.shape
    assert np.isfinite(np.asarray(final)).all()
