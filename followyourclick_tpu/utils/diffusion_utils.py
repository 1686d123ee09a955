"""DDIM inversion and latent interpolation utilities.

Behavior spec: reference ``animatediff/utils/util.py`` — the DDIM inversion
loop (:33-89: ``next_step`` runs the reverse recursion x_t → x_{t+1} with the
epsilon parameterisation) and ``slerp`` (:184-190).

TPU-first: the inversion loop is expressed as a pure per-step function over
the precomputed DDIM tables so the caller fuses UNet + inversion into one
``lax.scan`` (the reference drives a tqdm Python loop with a device sync per
step, util.py:76-81).
"""

from __future__ import annotations

import jax.numpy as jnp

from followyourclick_tpu.schedulers.ddim import DDIMSchedule


def ddim_inversion_step(
    sched: DDIMSchedule,
    model_output: jnp.ndarray,
    step_index: jnp.ndarray,
    sample: jnp.ndarray,
) -> jnp.ndarray:
    """One inversion step x_t → x_{t+next_ratio} (reference util.py
    ``next_step`` :42-52): timesteps are walked ASCENDING by loop position
    (``reversed(timesteps)`` in util.py:78)."""
    cfg = sched.cfg
    S = sched.num_inference_steps
    # ascending grid: position i maps to timesteps[S-1-i]; the state is AT
    # t-ratio and moves to t (util.py:43: `timestep, next_timestep =
    # min(timestep - ratio, 999), timestep`)
    next_t = sched.timesteps[S - 1 - step_index]
    t = jnp.minimum(
        next_t - cfg.num_train_timesteps // S, cfg.num_train_timesteps - 1
    )
    alpha_t = jnp.where(
        t >= 0, sched.alphas_cumprod[jnp.maximum(t, 0)],
        sched.final_alpha_cumprod,
    )
    alpha_next = sched.alphas_cumprod[next_t]

    if cfg.prediction_type == "v_prediction":
        # convert v → epsilon at timestep t (scheduling_ddim.py:318-329)
        eps = (alpha_t**0.5) * model_output + ((1 - alpha_t) ** 0.5) * sample
        x0 = (alpha_t**0.5) * sample - ((1 - alpha_t) ** 0.5) * model_output
    else:
        eps = model_output
        x0 = (sample - (1 - alpha_t) ** 0.5 * eps) / alpha_t**0.5
    return alpha_next**0.5 * x0 + (1 - alpha_next) ** 0.5 * eps


def slerp(
    v0: jnp.ndarray, v1: jnp.ndarray, t: float, dot_threshold: float = 0.9995
) -> jnp.ndarray:
    """Spherical linear interpolation between two (noise) tensors
    (reference util.py:184-190, which follows the karpathy gist)."""
    u0 = v0 / jnp.linalg.norm(v0)
    u1 = v1 / jnp.linalg.norm(v1)
    dot = jnp.sum(u0 * u1)

    def _lerp():
        return (1 - t) * v0 + t * v1

    def _slerp():
        omega = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
        so = jnp.sin(omega)
        return (
            jnp.sin((1.0 - t) * omega) / so * v0
            + jnp.sin(t * omega) / so * v1
        )

    import jax

    return jax.lax.cond(jnp.abs(dot) > dot_threshold, _lerp, _slerp)
