"""Golden parity tests for the Euler / Euler-Ancestral / PNDM / DPM-Solver /
LMS samplers against the vendored diffusers 0.11.1 schedulers (the exact
code the reference AnimationPipeline dispatches to,
pipeline_animation.py:50-57). Full-trajectory comparison with a shared fake
model."""

import numpy as np
import pytest
import jax.numpy as jnp

from tests._oracle import setup_reference_path

setup_reference_path()

torch = pytest.importorskip("torch")

from diffusers import (  # noqa: E402
    DPMSolverMultistepScheduler,
    EulerAncestralDiscreteScheduler,
    EulerDiscreteScheduler,
    LMSDiscreteScheduler,
    PNDMScheduler,
)

from followyourclick_tpu.config import NoiseScheduleConfig
from followyourclick_tpu.schedulers import (
    DPMSolverSchedule,
    EulerAncestralSchedule,
    EulerSchedule,
    LMSSchedule,
    PNDMSchedule,
    dpm_solver_step,
    euler_ancestral_step,
    euler_step,
    lms_step,
    pndm_step,
)

SHAPE = (1, 4, 8, 8)
STEPS = 12


def _cfg(prediction_type="epsilon"):
    return NoiseScheduleConfig(
        beta_start=0.00085, beta_end=0.012, beta_schedule="linear",
        steps_offset=1, prediction_type=prediction_type,
        rescale_betas_zero_snr=False, set_alpha_to_one=False,
    )


def _torch_kwargs(prediction_type):
    return dict(
        num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
        beta_schedule="linear", prediction_type=prediction_type,
    )


def _fake_model(sample: np.ndarray, t: float) -> np.ndarray:
    return np.sin(sample * 1.7 + t / 250.0).astype(np.float32)


@pytest.mark.parametrize("pred", ["epsilon", "v_prediction"])
def test_euler_trajectory_parity(pred):
    ref = EulerDiscreteScheduler(**_torch_kwargs(pred))
    ref.set_timesteps(STEPS)
    x_ref = np.random.RandomState(0).randn(*SHAPE).astype(np.float32)
    x_ref = x_ref * float(ref.init_noise_sigma)
    xt = torch.from_numpy(x_ref.copy())
    for t in ref.timesteps:
        inp = ref.scale_model_input(xt, t)
        out = torch.from_numpy(_fake_model(inp.numpy(), float(t)))
        xt = ref.step(out, t, xt).prev_sample

    sched = EulerSchedule.create(_cfg(pred), STEPS)
    np.testing.assert_allclose(
        np.asarray(sched.timesteps), ref.timesteps.numpy(), atol=1e-4
    )
    x = jnp.asarray(x_ref)
    for i in range(STEPS):
        inp = sched.scale_model_input(x, i)
        out = jnp.asarray(_fake_model(np.asarray(inp), float(sched.timesteps[i])))
        x = euler_step(sched, out, i, x)
    np.testing.assert_allclose(np.asarray(x), xt.numpy(), rtol=2e-4, atol=1e-3)


@pytest.mark.parametrize("pred", ["epsilon", "v_prediction"])
def test_euler_ancestral_trajectory_parity(pred, monkeypatch):
    ref = EulerAncestralDiscreteScheduler(**_torch_kwargs(pred))
    ref.set_timesteps(STEPS)
    noises = [
        np.random.RandomState(100 + i).randn(*SHAPE).astype(np.float32)
        for i in range(STEPS)
    ]
    it = iter(noises)
    real_randn = torch.randn

    def fake_randn(*args, **kwargs):
        try:
            return torch.from_numpy(next(it))
        except StopIteration:
            return real_randn(*args, **kwargs)

    monkeypatch.setattr(torch, "randn", fake_randn)

    x_ref = np.random.RandomState(1).randn(*SHAPE).astype(np.float32)
    x_ref = x_ref * float(ref.init_noise_sigma)
    xt = torch.from_numpy(x_ref.copy())
    for t in ref.timesteps:
        inp = ref.scale_model_input(xt, t)
        out = torch.from_numpy(_fake_model(inp.numpy(), float(t)))
        xt = ref.step(out, t, xt).prev_sample

    sched = EulerAncestralSchedule.create(_cfg(pred), STEPS)
    x = jnp.asarray(x_ref)
    for i in range(STEPS):
        inp = sched.scale_model_input(x, i)
        out = jnp.asarray(_fake_model(np.asarray(inp), float(sched.timesteps[i])))
        x = euler_ancestral_step(sched, out, i, x, jnp.asarray(noises[i]))
    np.testing.assert_allclose(np.asarray(x), xt.numpy(), rtol=2e-4, atol=1e-3)


@pytest.mark.parametrize("pred", ["epsilon", "v_prediction"])
def test_pndm_trajectory_parity(pred):
    ref = PNDMScheduler(
        **_torch_kwargs(pred), skip_prk_steps=True, steps_offset=1,
        set_alpha_to_one=False,
    )
    ref.set_timesteps(STEPS)
    x_ref = np.random.RandomState(2).randn(*SHAPE).astype(np.float32)
    xt = torch.from_numpy(x_ref.copy())
    for t in ref.timesteps:
        out = torch.from_numpy(_fake_model(xt.numpy(), float(t)))
        xt = ref.step(out, t, xt).prev_sample

    sched = PNDMSchedule.create(_cfg(pred), STEPS)
    np.testing.assert_array_equal(
        np.asarray(sched.timesteps), ref.timesteps.numpy()
    )
    x = jnp.asarray(x_ref)
    state = sched.init_state(SHAPE)
    for i in range(sched.timesteps.shape[0]):
        out = jnp.asarray(_fake_model(np.asarray(x), float(sched.timesteps[i])))
        x, state = pndm_step(sched, state, out, i, x)
    np.testing.assert_allclose(np.asarray(x), xt.numpy(), rtol=2e-4, atol=1e-3)


@pytest.mark.parametrize("pred", ["epsilon", "v_prediction"])
def test_pndm_prk_trajectory_parity(pred):
    """skip_prk_steps=False: 12 Runge-Kutta warmup calls then PLMS
    (scheduling_pndm.py step_prk :223-276, grid :177-186)."""
    ref = PNDMScheduler(
        **_torch_kwargs(pred), skip_prk_steps=False, steps_offset=1,
        set_alpha_to_one=False,
    )
    ref.set_timesteps(STEPS)
    x_ref = np.random.RandomState(5).randn(*SHAPE).astype(np.float32)
    xt = torch.from_numpy(x_ref.copy())
    for t in ref.timesteps:
        out = torch.from_numpy(_fake_model(xt.numpy(), float(t)))
        xt = ref.step(out, t, xt).prev_sample

    sched = PNDMSchedule.create(_cfg(pred), STEPS, skip_prk_steps=False)
    assert sched.num_prk_steps == 12
    np.testing.assert_array_equal(
        np.asarray(sched.timesteps), ref.timesteps.numpy()
    )
    # 12 PRK + (S-3) PLMS model calls
    assert sched.timesteps.shape[0] == 12 + STEPS - 3
    x = jnp.asarray(x_ref)
    state = sched.init_state(SHAPE)
    for i in range(sched.timesteps.shape[0]):
        out = jnp.asarray(_fake_model(np.asarray(x), float(sched.timesteps[i])))
        x, state = pndm_step(sched, state, out, i, x)
    np.testing.assert_allclose(np.asarray(x), xt.numpy(), rtol=2e-4, atol=1e-3)


@pytest.mark.parametrize("pred", ["epsilon", "v_prediction"])
@pytest.mark.parametrize("algo", ["dpmsolver++", "dpmsolver"])
def test_dpm_solver_trajectory_parity(pred, algo):
    ref = DPMSolverMultistepScheduler(
        **_torch_kwargs(pred), algorithm_type=algo, solver_type="midpoint",
        solver_order=2,
    )
    ref.set_timesteps(STEPS)
    x_ref = np.random.RandomState(3).randn(*SHAPE).astype(np.float32)
    xt = torch.from_numpy(x_ref.copy())
    for t in ref.timesteps:
        out = torch.from_numpy(_fake_model(xt.numpy(), float(t)))
        xt = ref.step(out, t, xt).prev_sample

    sched = DPMSolverSchedule.create(_cfg(pred), STEPS, algorithm_type=algo)
    np.testing.assert_array_equal(
        np.asarray(sched.timesteps), ref.timesteps.numpy()
    )
    x = jnp.asarray(x_ref)
    state = sched.init_state(SHAPE)
    for i in range(STEPS):
        out = jnp.asarray(_fake_model(np.asarray(x), float(sched.timesteps[i])))
        x, state = dpm_solver_step(sched, state, out, i, x)
    np.testing.assert_allclose(np.asarray(x), xt.numpy(), rtol=2e-4, atol=1e-3)


@pytest.mark.parametrize("steps", [12, 20])  # 12 exercises the S<15
# lower-order final/penultimate caps; 20 runs third order to the end
@pytest.mark.parametrize("algo", ["dpmsolver++", "dpmsolver"])
def test_dpm_solver_third_order_parity(algo, steps):
    """solver_order=3 golden trajectory vs the reference
    multistep_dpm_solver_third_order_update
    (scheduling_dpmsolver_multistep.py:373-427 + order selection :471-487)."""
    ref = DPMSolverMultistepScheduler(
        **_torch_kwargs("epsilon"), algorithm_type=algo,
        solver_type="midpoint", solver_order=3,
    )
    ref.set_timesteps(steps)
    x_ref = np.random.RandomState(9).randn(*SHAPE).astype(np.float32)
    xt = torch.from_numpy(x_ref.copy())
    for t in ref.timesteps:
        out = torch.from_numpy(_fake_model(xt.numpy(), float(t)))
        xt = ref.step(out, t, xt).prev_sample

    sched = DPMSolverSchedule.create(_cfg("epsilon"), steps,
                                     algorithm_type=algo, solver_order=3)
    x = jnp.asarray(x_ref)
    state = sched.init_state(SHAPE)
    for i in range(steps):
        out = jnp.asarray(_fake_model(np.asarray(x), float(sched.timesteps[i])))
        x, state = dpm_solver_step(sched, state, out, i, x)
    np.testing.assert_allclose(np.asarray(x), xt.numpy(), rtol=2e-4, atol=1e-3)


@pytest.mark.parametrize("pred", ["epsilon", "v_prediction"])
def test_lms_trajectory_parity(pred):
    ref = LMSDiscreteScheduler(**_torch_kwargs(pred))
    ref.set_timesteps(STEPS)
    x_ref = np.random.RandomState(4).randn(*SHAPE).astype(np.float32)
    x_ref = x_ref * float(ref.init_noise_sigma)
    xt = torch.from_numpy(x_ref.copy())
    for t in ref.timesteps:
        inp = ref.scale_model_input(xt, t)
        out = torch.from_numpy(_fake_model(inp.numpy(), float(t)))
        xt = ref.step(out, t, xt).prev_sample

    sched = LMSSchedule.create(_cfg(pred), STEPS)
    x = jnp.asarray(x_ref)
    hist = sched.init_state(SHAPE)
    for i in range(STEPS):
        inp = sched.scale_model_input(x, i)
        out = jnp.asarray(_fake_model(np.asarray(inp), float(sched.timesteps[i])))
        x, hist = lms_step(sched, hist, out, i, x)
    np.testing.assert_allclose(np.asarray(x), xt.numpy(), rtol=2e-4, atol=1e-3)


def test_scan_compatible():
    """The whole PNDM trajectory runs inside one lax.scan (the reference
    mutates host-side Python state every step — SURVEY.md §3.2 TPU note)."""
    import jax

    sched = PNDMSchedule.create(_cfg(), STEPS)
    x0 = jnp.asarray(np.random.RandomState(5).randn(*SHAPE), jnp.float32)

    def body(carry, i):
        x, state = carry
        out = jnp.sin(x * 1.7 + sched.timesteps[i] / 250.0)
        x, state = pndm_step(sched, state, out, i, x)
        return (x, state), ()

    (x_scan, _), _ = jax.lax.scan(
        body, (x0, sched.init_state(SHAPE)),
        jnp.arange(sched.timesteps.shape[0]),
    )
    x_loop = x0
    state = sched.init_state(SHAPE)
    for i in range(sched.timesteps.shape[0]):
        out = jnp.sin(x_loop * 1.7 + sched.timesteps[i] / 250.0)
        x_loop, state = pndm_step(sched, state, out, i, x_loop)
    np.testing.assert_allclose(
        np.asarray(x_scan), np.asarray(x_loop), atol=1e-4
    )
