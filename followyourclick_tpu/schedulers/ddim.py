"""DDIM scheduler as pure functions over a precomputed schedule pytree.

Behavior spec: reference ``diffusers/schedulers/scheduling_ddim.py`` (v0.11.1 with
the back-ported zero-terminal-SNR patch): ``rescale_zero_terminal_snr`` (:78-112),
``set_timesteps`` (:238), ``step`` with epsilon/sample/v-prediction branches
(:254-340), ``add_noise`` (:378), ``get_velocity`` (:401).

TPU-first design: the scheduler is a frozen pytree of precomputed fp32 tables, and
``ddim_step`` is a pure function indexed by *loop position* so the whole denoise
loop fuses into one ``jax.lax.scan`` with no host round-trips (the reference drives
its loop from Python, one device sync per step).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from followyourclick_tpu.config import NoiseScheduleConfig


def make_beta_schedule(cfg: NoiseScheduleConfig) -> jnp.ndarray:
    """β schedule; fp64-free but matches torch fp32 linspace semantics."""
    t = cfg.num_train_timesteps
    if cfg.beta_schedule == "linear":
        betas = jnp.linspace(cfg.beta_start, cfg.beta_end, t, dtype=jnp.float32)
    elif cfg.beta_schedule == "scaled_linear":
        betas = (
            jnp.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5, t,
                         dtype=jnp.float32) ** 2
        )
    elif cfg.beta_schedule == "squaredcos_cap_v2":
        # Glide cosine schedule (reference scheduling_ddim.py:49-75)
        steps = jnp.arange(t + 1, dtype=jnp.float32) / t

        def alpha_bar(x):
            return jnp.cos((x + 0.008) / 1.008 * jnp.pi / 2) ** 2

        betas = jnp.minimum(1 - alpha_bar(steps[1:]) / alpha_bar(steps[:-1]), 0.999)
    else:
        raise NotImplementedError(cfg.beta_schedule)
    return betas


def rescale_zero_terminal_snr(betas: jnp.ndarray) -> jnp.ndarray:
    """Zero-terminal-SNR rescale, Algorithm 1 of arXiv 2305.08891
    (reference scheduling_ddim.py:78-112)."""
    alphas = 1.0 - betas
    alphas_cumprod = jnp.cumprod(alphas)
    alphas_bar_sqrt = jnp.sqrt(alphas_cumprod)

    a0 = alphas_bar_sqrt[0]
    aT = alphas_bar_sqrt[-1]
    alphas_bar_sqrt = (alphas_bar_sqrt - aT) * (a0 / (a0 - aT))

    alphas_bar = alphas_bar_sqrt ** 2
    alphas = jnp.concatenate([alphas_bar[0:1], alphas_bar[1:] / alphas_bar[:-1]])
    return 1.0 - alphas


@jax.tree_util.register_pytree_node_class
class DDIMSchedule:
    """Immutable precomputed DDIM tables + the inference timestep grid.

    All tables are fp32; schedule math always runs in fp32 regardless of the
    model compute dtype (parity with the reference, which keeps scheduler
    tensors in fp32 even under autocast).
    """

    def __init__(self, alphas_cumprod, final_alpha_cumprod, timesteps,
                 init_noise_sigma, cfg: NoiseScheduleConfig,
                 num_inference_steps: int):
        self.alphas_cumprod = alphas_cumprod          # (T,)
        self.final_alpha_cumprod = final_alpha_cumprod  # scalar
        self.timesteps = timesteps                    # (S,) descending int32
        self.init_noise_sigma = init_noise_sigma      # scalar (1.0 for DDIM)
        self.cfg = cfg
        self.num_inference_steps = num_inference_steps

    # -- pytree protocol (cfg/num_steps are static) --
    def tree_flatten(self):
        leaves = (self.alphas_cumprod, self.final_alpha_cumprod, self.timesteps,
                  self.init_noise_sigma)
        return leaves, (self.cfg, self.num_inference_steps)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @classmethod
    def create(cls, cfg: NoiseScheduleConfig,
               num_inference_steps: int) -> "DDIMSchedule":
        betas = make_beta_schedule(cfg)
        if cfg.rescale_betas_zero_snr:
            betas = rescale_zero_terminal_snr(betas)
        alphas_cumprod = jnp.cumprod(1.0 - betas)
        final_alpha_cumprod = (
            jnp.float32(1.0) if cfg.set_alpha_to_one else alphas_cumprod[0]
        )
        # "leading" spacing (reference set_timesteps, scheduling_ddim.py:238-252)
        step_ratio = cfg.num_train_timesteps // num_inference_steps
        timesteps = (
            (jnp.arange(num_inference_steps) * step_ratio)
            .round().astype(jnp.int32)[::-1]
            + cfg.steps_offset
        )
        return cls(alphas_cumprod, final_alpha_cumprod, timesteps,
                   jnp.float32(1.0), cfg, num_inference_steps)


def ddim_step(
    sched: DDIMSchedule,
    model_output: jnp.ndarray,
    step_index: jnp.ndarray,
    sample: jnp.ndarray,
    eta: float = 0.0,
    noise: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One reverse-diffusion step; returns (prev_sample, pred_original_sample).

    ``step_index`` is the position in ``sched.timesteps`` (0 = most noisy), so
    the denoise loop is a scan over ``jnp.arange(S)``. Matches reference
    ``scheduling_ddim.py:254-376`` with fp32 math.
    """
    cfg = sched.cfg
    t = sched.timesteps[step_index]
    prev_t = t - cfg.num_train_timesteps // sched.num_inference_steps

    orig_dtype = sample.dtype
    sample = sample.astype(jnp.float32)
    model_output = model_output.astype(jnp.float32)

    alpha_prod_t = sched.alphas_cumprod[t]
    alpha_prod_t_prev = jnp.where(
        prev_t >= 0,
        sched.alphas_cumprod[jnp.maximum(prev_t, 0)],
        sched.final_alpha_cumprod,
    )
    beta_prod_t = 1.0 - alpha_prod_t

    sqrt_a = jnp.sqrt(alpha_prod_t)
    sqrt_b = jnp.sqrt(beta_prod_t)

    if cfg.prediction_type == "epsilon":
        pred_original_sample = (sample - sqrt_b * model_output) / sqrt_a
        pred_epsilon = model_output
    elif cfg.prediction_type == "sample":
        pred_original_sample = model_output
        # Upstream 0.11.1 quirk, reproduced for parity: the "direction" term
        # reuses model_output (the x0 prediction) as epsilon
        # (reference scheduling_ddim.py:345).
        pred_epsilon = model_output
    elif cfg.prediction_type == "v_prediction":
        pred_original_sample = sqrt_a * sample - sqrt_b * model_output
        pred_epsilon = sqrt_a * model_output + sqrt_b * sample
    else:
        raise ValueError(cfg.prediction_type)

    if cfg.clip_sample:
        pred_original_sample = jnp.clip(pred_original_sample, -1.0, 1.0)

    # variance σ_t (reference _get_variance, used only when eta > 0)
    beta_prod_t_prev = 1.0 - alpha_prod_t_prev
    variance = (beta_prod_t_prev / beta_prod_t) * (
        1.0 - alpha_prod_t / alpha_prod_t_prev
    )
    std_dev_t = eta * jnp.sqrt(jnp.maximum(variance, 0.0))

    pred_sample_direction = jnp.sqrt(
        jnp.maximum(1.0 - alpha_prod_t_prev - std_dev_t ** 2, 0.0)
    ) * pred_epsilon
    prev_sample = (
        jnp.sqrt(alpha_prod_t_prev) * pred_original_sample + pred_sample_direction
    )
    if eta > 0:
        if noise is None:
            raise ValueError("eta > 0 requires noise")
        prev_sample = prev_sample + std_dev_t * noise.astype(jnp.float32)

    return prev_sample.astype(orig_dtype), pred_original_sample.astype(orig_dtype)


def _extract(table: jnp.ndarray, timesteps: jnp.ndarray,
             ndim: int) -> jnp.ndarray:
    """Gather per-batch schedule values and broadcast to sample rank."""
    vals = table[timesteps].astype(jnp.float32)
    return vals.reshape(vals.shape + (1,) * (ndim - vals.ndim))


def add_noise(sched: DDIMSchedule, original_samples: jnp.ndarray,
              noise: jnp.ndarray, timesteps: jnp.ndarray) -> jnp.ndarray:
    """x_t = sqrt(ᾱ_t)·x_0 + sqrt(1-ᾱ_t)·ε  (reference scheduling_ddim.py:378)."""
    a = _extract(sched.alphas_cumprod, timesteps, original_samples.ndim)
    return (
        jnp.sqrt(a) * original_samples.astype(jnp.float32)
        + jnp.sqrt(1.0 - a) * noise.astype(jnp.float32)
    ).astype(original_samples.dtype)


def get_velocity(sched: DDIMSchedule, sample: jnp.ndarray, noise: jnp.ndarray,
                 timesteps: jnp.ndarray) -> jnp.ndarray:
    """v = sqrt(ᾱ_t)·ε − sqrt(1−ᾱ_t)·x_0  (reference scheduling_ddim.py:401)."""
    a = _extract(sched.alphas_cumprod, timesteps, sample.ndim)
    return (
        jnp.sqrt(a) * noise.astype(jnp.float32)
        - jnp.sqrt(1.0 - a) * sample.astype(jnp.float32)
    ).astype(sample.dtype)
