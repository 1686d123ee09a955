"""Uniform solver interface for the sampler's denoise scan.

The reference ``AnimationPipeline`` accepts any of DDIM / PNDM / LMS /
Euler / Euler-Ancestral / DPM-Solver (``pipeline_animation.py:50-57``) —
whichever the ``noise_scheduler_kwargs`` config built. This module gives the
TPU sampler the same surface: :func:`make_solver` wraps each scan-compatible
schedule (``schedulers/ddim.py``, ``schedulers/solvers.py``) behind one
protocol —

  * ``n_calls``            — number of UNet evaluations (PNDM's grids differ
                             from S: S+1 for PLMS, S+9 with the PRK warmup)
  * ``timestep(i)``        — the value fed to the UNet time embedding
                             (float sigma-grid timesteps for Euler/LMS)
  * ``scale_model_input``  — sigma pre-scaling for the k-diffusion family
  * ``init_noise_sigma``   — initial latent scaling (sigma_max for
                             Euler/LMS; 1 for the alpha-bar family)
  * ``init_state(shape)``  — solver state carried through the scan (``()``
                             for the stateless DDIM/Euler steps)
  * ``step(out, i, x, state, eta=, noise=)`` → ``(x', state')``

Every solver keeps static shapes, so the whole trajectory stays inside one
``lax.scan``; ``SampleSpec.scheduler`` is a static field and each choice
compiles its own program.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from followyourclick_tpu.config import NoiseScheduleConfig
from followyourclick_tpu.schedulers.ddim import DDIMSchedule, ddim_step
from followyourclick_tpu.schedulers.solvers import (
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

SCHEDULERS = (
    "ddim", "pndm", "pndm_prk", "euler", "euler_a", "lms",
    "dpm++", "dpm++3", "dpm",
)


@dataclasses.dataclass(frozen=True)
class Solver:
    """One scan-ready solver: schedule pytree + uniform step protocol."""

    name: str
    sched: Any
    supports_eta: bool = False       # DDIM's stochastic eta path
    needs_step_noise: bool = False   # ancestral samplers draw fresh noise

    @property
    def n_calls(self) -> int:
        return int(self.sched.timesteps.shape[0])

    @property
    def init_noise_sigma(self) -> float:
        return getattr(self.sched, "init_noise_sigma", 1.0)

    def timestep(self, i):
        return self.sched.timesteps[i]

    def scale_model_input(self, sample, i):
        if hasattr(self.sched, "scale_model_input"):
            return self.sched.scale_model_input(sample, i)
        return sample

    def init_state(self, sample_shape, dtype=jnp.float32):
        if hasattr(self.sched, "init_state"):
            return self.sched.init_state(sample_shape, dtype)
        return ()

    def step(self, model_output, i, sample, state, *, eta=0.0, noise=None):
        if self.name == "ddim":
            new, _ = ddim_step(self.sched, model_output, i, sample,
                               eta=eta, noise=noise)
            return new, state
        if self.name in ("pndm", "pndm_prk"):
            return pndm_step(self.sched, state, model_output, i, sample)
        if self.name == "euler":
            return euler_step(self.sched, model_output, i, sample), state
        if self.name == "euler_a":
            assert noise is not None, "euler_a draws fresh noise every step"
            return euler_ancestral_step(
                self.sched, model_output, i, sample, noise), state
        if self.name == "lms":
            return lms_step(self.sched, state, model_output, i, sample)
        assert self.name in ("dpm++", "dpm++3", "dpm"), self.name
        return dpm_solver_step(self.sched, state, model_output, i, sample)


def make_solver(
    name: str, cfg: NoiseScheduleConfig, num_inference_steps: int
) -> Solver:
    # schedule construction is host math on static config (numpy interp /
    # scipy LMS coefficients); keep it concrete even when the sampler traces
    # this under jit
    with jax.ensure_compile_time_eval():
        return _make_solver(name, cfg, num_inference_steps)


def _make_solver(
    name: str, cfg: NoiseScheduleConfig, num_inference_steps: int
) -> Solver:
    if name == "ddim":
        return Solver("ddim", DDIMSchedule.create(cfg, num_inference_steps),
                      supports_eta=True)
    if name == "pndm":
        return Solver("pndm", PNDMSchedule.create(cfg, num_inference_steps))
    if name == "pndm_prk":
        return Solver("pndm_prk", PNDMSchedule.create(
            cfg, num_inference_steps, skip_prk_steps=False))
    if name == "euler":
        return Solver("euler", EulerSchedule.create(cfg, num_inference_steps))
    if name == "euler_a":
        return Solver(
            "euler_a", EulerAncestralSchedule.create(cfg, num_inference_steps),
            needs_step_noise=True)
    if name == "lms":
        return Solver("lms", LMSSchedule.create(cfg, num_inference_steps))
    if name in ("dpm++", "dpm++3", "dpm"):
        return Solver(name, DPMSolverSchedule.create(
            cfg, num_inference_steps,
            algorithm_type="dpmsolver" if name == "dpm" else "dpmsolver++",
            solver_order=3 if name == "dpm++3" else 2))
    raise ValueError(
        f"unknown scheduler {name!r}; expected one of {SCHEDULERS}")
