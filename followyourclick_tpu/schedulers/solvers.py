"""Alternative samplers: Euler, Euler-Ancestral, PNDM (PLMS), DPM-Solver++
multistep, and LMS.

Behavior spec: the vendored diffusers 0.11.1 schedulers the reference
AnimationPipeline accepts (``animatediff/pipelines/pipeline_animation.py:50-57``):
``scheduling_euler_discrete.py`` (sigma grid via np.interp over a linspace
timestep grid :149-153, x0-prediction + Euler ODE step :216-258),
``scheduling_euler_ancestral_discrete.py`` (sigma_up/down split),
``scheduling_pndm.py`` (PLMS multistep with the duplicated second timestep
when ``skip_prk_steps=True`` :160-176, Adams-Bashforth blends :323-335,
formula-(9) update :358-400), ``scheduling_dpmsolver_multistep.py``
(data-prediction conversion :211-280, first/second/third-order updates
:282-427, lower-order warmup :471-487), ``scheduling_lms_discrete.py``
(integrated linear-multistep coefficients).

TPU-first design: like ``ddim.py``, every sampler is a frozen pytree of
precomputed fp32 tables plus a PURE step function indexed by loop position,
with any multistep history carried in an explicit fixed-shape state pytree —
so each fuses into a single ``lax.scan`` with no host round trips. The
reference mutates Python lists (``self.ets``/``self.model_outputs``) on the
host every step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from followyourclick_tpu.config import NoiseScheduleConfig
from followyourclick_tpu.schedulers.ddim import make_beta_schedule


def _alphas_cumprod(cfg: NoiseScheduleConfig) -> jnp.ndarray:
    return jnp.cumprod(1.0 - make_beta_schedule(cfg))


def _pred_x0_from_sigma(
    model_output: jnp.ndarray, sample: jnp.ndarray, sigma: jnp.ndarray,
    prediction_type: str,
) -> jnp.ndarray:
    """x0 prediction in k-diffusion sigma space (euler_discrete :236-245)."""
    if prediction_type == "epsilon":
        return sample - sigma * model_output
    if prediction_type == "v_prediction":
        return model_output * (-sigma / (sigma**2 + 1) ** 0.5) + (
            sample / (sigma**2 + 1)
        )
    raise ValueError(prediction_type)


# ---------------------------------------------------------------- Euler ----


@flax.struct.dataclass
class EulerSchedule:
    sigmas: jnp.ndarray        # (S+1,), last entry 0
    timesteps: jnp.ndarray     # (S,), float, descending
    init_noise_sigma: jnp.ndarray
    prediction_type: str = flax.struct.field(pytree_node=False, default="epsilon")

    @classmethod
    def create(
        cls, cfg: NoiseScheduleConfig, num_inference_steps: int
    ) -> "EulerSchedule":
        ac = np.asarray(_alphas_cumprod(cfg))
        timesteps = np.linspace(
            0, cfg.num_train_timesteps - 1, num_inference_steps, dtype=float
        )[::-1].copy()
        sigmas = ((1 - ac) / ac) ** 0.5
        sigmas = np.interp(timesteps, np.arange(len(sigmas)), sigmas)
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        return cls(
            sigmas=jnp.asarray(sigmas),
            timesteps=jnp.asarray(timesteps, jnp.float32),
            init_noise_sigma=jnp.float32(sigmas.max()),
            prediction_type=cfg.prediction_type,
        )

    def scale_model_input(
        self, sample: jnp.ndarray, step_index: jnp.ndarray
    ) -> jnp.ndarray:
        sigma = self.sigmas[step_index]
        return sample / ((sigma**2 + 1) ** 0.5)


def euler_step(
    sched: EulerSchedule,
    model_output: jnp.ndarray,
    step_index: jnp.ndarray,
    sample: jnp.ndarray,
) -> jnp.ndarray:
    """Deterministic Euler ODE step (s_churn=0 path, euler_discrete :216-258)."""
    sigma = sched.sigmas[step_index]
    pred_x0 = _pred_x0_from_sigma(
        model_output, sample, sigma, sched.prediction_type
    )
    derivative = (sample - pred_x0) / sigma
    dt = sched.sigmas[step_index + 1] - sigma
    return sample + derivative * dt


# ------------------------------------------------------ Euler ancestral ----


@flax.struct.dataclass
class EulerAncestralSchedule(EulerSchedule):
    @classmethod
    def create(cls, cfg, num_inference_steps):
        base = EulerSchedule.create(cfg, num_inference_steps)
        return cls(
            sigmas=base.sigmas, timesteps=base.timesteps,
            init_noise_sigma=base.init_noise_sigma,
            prediction_type=base.prediction_type,
        )


def euler_ancestral_step(
    sched: EulerAncestralSchedule,
    model_output: jnp.ndarray,
    step_index: jnp.ndarray,
    sample: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Ancestral step (euler_ancestral_discrete :188-242): split the sigma
    transition into a deterministic part (sigma_down) and fresh noise
    (sigma_up)."""
    sigma_from = sched.sigmas[step_index]
    sigma_to = sched.sigmas[step_index + 1]
    pred_x0 = _pred_x0_from_sigma(
        model_output, sample, sigma_from, sched.prediction_type
    )
    sigma_up = (
        sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2
    ) ** 0.5
    sigma_down = (sigma_to**2 - sigma_up**2) ** 0.5
    derivative = (sample - pred_x0) / sigma_from
    dt = sigma_down - sigma_from
    return sample + derivative * dt + noise * sigma_up


# ----------------------------------------------------------------- PNDM ----


@flax.struct.dataclass
class PNDMState:
    ets: jnp.ndarray         # (4, *sample_shape) newest-last ring
    num_ets: jnp.ndarray     # scalar int32
    cur_sample: jnp.ndarray  # sample stashed at counter==0 / RK group start
    counter: jnp.ndarray     # scalar int32
    cur_model_output: jnp.ndarray  # RK accumulator (PRK warmup only)


@flax.struct.dataclass
class PNDMSchedule:
    alphas_cumprod: jnp.ndarray
    final_alpha_cumprod: jnp.ndarray
    timesteps: jnp.ndarray   # (S+1,) int32 — second timestep duplicated
    step_ratio: int = flax.struct.field(pytree_node=False, default=1)
    prediction_type: str = flax.struct.field(pytree_node=False, default="epsilon")
    # number of leading Runge-Kutta warmup model calls (skip_prk_steps=False
    # grid: 3 RK4 groups x 4 evals = 12; the released SD configs all use the
    # skip_prk_steps=True PLMS grid, where this is 0)
    num_prk_steps: int = flax.struct.field(pytree_node=False, default=0)

    @classmethod
    def create(
        cls, cfg: NoiseScheduleConfig, num_inference_steps: int,
        skip_prk_steps: bool = True,
    ) -> "PNDMSchedule":
        """skip_prk_steps=True grid (pndm set_timesteps :160-176): the PLMS
        warmup re-uses the second timestep, so there are S+1 model calls.

        skip_prk_steps=False grid (:177-186): the last ``pndm_order``=4
        timesteps are refined on a half-``ratio`` sub-grid into 12 PRK
        entries (3 Runge-Kutta-4 groups), then PLMS continues from
        ``timesteps[:-3]`` — S+9 model calls total.
        """
        ac = _alphas_cumprod(cfg)
        ratio = cfg.num_train_timesteps // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * ratio).round() + cfg.steps_offset
        if skip_prk_steps:
            grid = np.concatenate([ts[:-1], ts[-2:-1], ts[-1:]])[::-1].copy()
            n_prk = 0
        else:
            prk = np.asarray(ts[-4:]).repeat(2) + np.tile(
                np.array([0, ratio // 2]), 4)
            prk = (prk[:-1].repeat(2)[1:-1])[::-1].copy()
            grid = np.concatenate([prk, ts[:-3][::-1]])
            n_prk = len(prk)  # 12
        final = 1.0 if cfg.set_alpha_to_one else float(np.asarray(ac)[0])
        return cls(
            alphas_cumprod=ac,
            final_alpha_cumprod=jnp.float32(final),
            timesteps=jnp.asarray(grid, jnp.int32),
            step_ratio=ratio,
            prediction_type=cfg.prediction_type,
            num_prk_steps=n_prk,
        )

    def init_state(self, sample_shape, dtype=jnp.float32) -> PNDMState:
        return PNDMState(
            ets=jnp.zeros((4,) + tuple(sample_shape), dtype),
            num_ets=jnp.int32(0),
            cur_sample=jnp.zeros(sample_shape, dtype),
            counter=jnp.int32(0),
            cur_model_output=jnp.zeros(sample_shape, dtype),
        )


def _pndm_prev_sample(sched, sample, t, prev_t, model_output):
    """Formula (9) of the PNDM paper (scheduling_pndm.py:358-400)."""
    ac = sched.alphas_cumprod
    alpha_prod_t = ac[t]
    alpha_prod_prev = jnp.where(
        prev_t >= 0, ac[jnp.maximum(prev_t, 0)], sched.final_alpha_cumprod
    )
    beta_prod_t = 1 - alpha_prod_t
    beta_prod_prev = 1 - alpha_prod_prev
    if sched.prediction_type == "v_prediction":
        model_output = (
            alpha_prod_t**0.5 * model_output + beta_prod_t**0.5 * sample
        )
    sample_coeff = (alpha_prod_prev / alpha_prod_t) ** 0.5
    denom = alpha_prod_t * beta_prod_prev**0.5 + (
        alpha_prod_t * beta_prod_t * alpha_prod_prev
    ) ** 0.5
    return (
        sample_coeff * sample
        - (alpha_prod_prev - alpha_prod_t) * model_output / denom
    )


def _pndm_step_prk(
    sched: PNDMSchedule,
    state: PNDMState,
    model_output: jnp.ndarray,
    step_index: jnp.ndarray,
    sample: jnp.ndarray,
) -> Tuple[jnp.ndarray, PNDMState]:
    """Runge-Kutta warmup (scheduling_pndm.py step_prk :223-276): groups of
    4 model calls integrate each of the last 3 coarse intervals on a
    half-step sub-grid; phase 0 stashes the group's sample and records the
    raw eval as an ``ets`` entry for the PLMS continuation."""
    t = sched.timesteps[step_index]
    counter = state.counter
    phase = counter % 4

    # prev_timestep = t - (ratio//2 at even counters, 0 at odd) :251-252
    prev_t = t - jnp.where(counter % 2 == 0, sched.step_ratio // 2, 0)
    # the integration origin is the group's base timestep :253
    t_group = sched.timesteps[(counter // 4) * 4]

    append = phase == 0
    ets = jnp.where(
        append,
        jnp.concatenate([state.ets[1:], model_output[None]], axis=0),
        state.ets,
    )
    num_ets = jnp.where(append, jnp.minimum(state.num_ets + 1, 4),
                        state.num_ets)
    cur_sample = jnp.where(append, sample, state.cur_sample)

    # RK4 accumulation :255-265 — k1/6 + k2/3 + k3/3 (+ k4/6 on emit)
    out = jnp.where(phase == 3, state.cur_model_output + model_output / 6,
                    model_output)
    cur_mo = jnp.where(
        phase == 0, state.cur_model_output + model_output / 6,
        jnp.where(phase == 3, jnp.zeros_like(model_output),
                  state.cur_model_output + model_output / 3))

    prev_sample = _pndm_prev_sample(sched, cur_sample, t_group, prev_t, out)
    new_state = PNDMState(
        ets=ets, num_ets=num_ets, cur_sample=cur_sample,
        counter=counter + 1, cur_model_output=cur_mo,
    )
    return prev_sample, new_state


def pndm_step(
    sched: PNDMSchedule,
    state: PNDMState,
    model_output: jnp.ndarray,
    step_index: jnp.ndarray,
    sample: jnp.ndarray,
) -> Tuple[jnp.ndarray, PNDMState]:
    """PNDM step: RK warmup for the first ``num_prk_steps`` calls (only in
    skip_prk_steps=False schedules), PLMS multistep after (scheduling_pndm.py
    step :192-221). ``num_prk_steps`` is static, so the common PLMS-only
    grid compiles with zero warmup overhead."""
    if sched.num_prk_steps == 0:
        return _pndm_step_plms(sched, state, model_output, step_index, sample)
    prk_sample, prk_state = _pndm_step_prk(
        sched, state, model_output, step_index, sample)
    plms_sample, plms_state = _pndm_step_plms(
        sched, state, model_output, step_index, sample)
    in_prk = state.counter < sched.num_prk_steps
    pick = lambda a, b: jnp.where(in_prk, a, b)  # noqa: E731
    return pick(prk_sample, plms_sample), jax.tree_util.tree_map(
        pick, prk_state, plms_state)


def _pndm_step_plms(
    sched: PNDMSchedule,
    state: PNDMState,
    model_output: jnp.ndarray,
    step_index: jnp.ndarray,
    sample: jnp.ndarray,
) -> Tuple[jnp.ndarray, PNDMState]:
    """PLMS multistep (scheduling_pndm.py step_plms :278-343) as a pure
    function of (state, loop position)."""
    t = sched.timesteps[step_index]
    counter = state.counter
    prev_t = t - sched.step_ratio

    # counter==1: re-use the stashed sample and integrate t+ratio → t
    t_eff = jnp.where(counter == 1, t + sched.step_ratio, t)
    prev_t_eff = jnp.where(counter == 1, t, prev_t)

    append = counter != 1
    ets = jnp.where(
        append,
        jnp.concatenate([state.ets[1:], model_output[None]], axis=0),
        state.ets,
    )
    num_ets = jnp.where(append, jnp.minimum(state.num_ets + 1, 4), state.num_ets)

    e1 = ets[-1]
    e2 = ets[-2]
    e3 = ets[-3]
    e4 = ets[-4]
    blends = jnp.stack(
        [
            model_output,                                   # num_ets==1, counter==0
            (model_output + e1) / 2,                        # counter==1
            (3 * e1 - e2) / 2,                              # num_ets==2
            (23 * e1 - 16 * e2 + 5 * e3) / 12,              # num_ets==3
            (55 * e1 - 59 * e2 + 37 * e3 - 9 * e4) / 24,    # num_ets>=4
        ]
    )
    case = jnp.where(
        counter == 0, 0,
        jnp.where(counter == 1, 1, jnp.minimum(num_ets, 4)),
    )
    blended = blends[case]

    use_stash = counter == 1
    eff_sample = jnp.where(use_stash, state.cur_sample, sample)
    prev_sample = _pndm_prev_sample(
        sched, eff_sample, t_eff, prev_t_eff, blended
    )
    new_state = PNDMState(
        ets=ets,
        num_ets=num_ets,
        cur_sample=jnp.where(counter == 0, sample, state.cur_sample),
        counter=counter + 1,
        cur_model_output=state.cur_model_output,
    )
    return prev_sample, new_state


# ----------------------------------------------------------- DPM-Solver ----


@flax.struct.dataclass
class DPMSolverState:
    prev_output: jnp.ndarray       # last converted model output (m1)
    prev_timestep: jnp.ndarray     # its timestep
    lower_order_nums: jnp.ndarray  # scalar int32
    prev_output_2: jnp.ndarray     # second-to-last output (m2, 3rd order)
    prev_timestep_2: jnp.ndarray   # its timestep


@flax.struct.dataclass
class DPMSolverSchedule:
    alpha_t: jnp.ndarray
    sigma_t: jnp.ndarray
    lambda_t: jnp.ndarray
    timesteps: jnp.ndarray  # (S,) int32 descending
    algorithm_type: str = flax.struct.field(
        pytree_node=False, default="dpmsolver++"
    )
    solver_type: str = flax.struct.field(pytree_node=False, default="midpoint")
    lower_order_final: bool = flax.struct.field(pytree_node=False, default=True)
    prediction_type: str = flax.struct.field(
        pytree_node=False, default="epsilon"
    )
    # 1, 2 or 3 (reference solver_order; 2 recommended for guided sampling,
    # 3 for unconditional — scheduling_dpmsolver_multistep.py:87-89)
    solver_order: int = flax.struct.field(pytree_node=False, default=2)

    @classmethod
    def create(
        cls, cfg: NoiseScheduleConfig, num_inference_steps: int,
        algorithm_type: str = "dpmsolver++", solver_type: str = "midpoint",
        solver_order: int = 2,
    ) -> "DPMSolverSchedule":
        ac = _alphas_cumprod(cfg)
        alpha_t = jnp.sqrt(ac)
        sigma_t = jnp.sqrt(1 - ac)
        lambda_t = jnp.log(alpha_t) - jnp.log(sigma_t)
        timesteps = (
            np.linspace(0, cfg.num_train_timesteps - 1, num_inference_steps + 1)
            .round()[::-1][:-1]
            .astype(np.int64)
        )
        return cls(
            alpha_t=alpha_t, sigma_t=sigma_t, lambda_t=lambda_t,
            timesteps=jnp.asarray(timesteps, jnp.int32),
            algorithm_type=algorithm_type, solver_type=solver_type,
            prediction_type=cfg.prediction_type, solver_order=solver_order,
        )

    def init_state(self, sample_shape, dtype=jnp.float32) -> DPMSolverState:
        return DPMSolverState(
            prev_output=jnp.zeros(sample_shape, dtype),
            prev_timestep=jnp.int32(0),
            lower_order_nums=jnp.int32(0),
            prev_output_2=jnp.zeros(sample_shape, dtype),
            prev_timestep_2=jnp.int32(0),
        )


def _dpm_convert(sched, model_output, t, sample):
    """convert_model_output (:211-280) — no dynamic thresholding (SD)."""
    a, s = sched.alpha_t[t], sched.sigma_t[t]
    pt = sched.prediction_type
    if sched.algorithm_type == "dpmsolver++":
        if pt == "epsilon":
            return (sample - s * model_output) / a
        if pt == "sample":
            return model_output
        if pt == "v_prediction":
            return a * sample - s * model_output
    else:
        if pt == "epsilon":
            return model_output
        if pt == "sample":
            return (sample - a * model_output) / s
        if pt == "v_prediction":
            return a * model_output + s * sample
    raise ValueError(pt)


def dpm_solver_step(
    sched: DPMSolverSchedule,
    state: DPMSolverState,
    model_output: jnp.ndarray,
    step_index: jnp.ndarray,
    sample: jnp.ndarray,
) -> Tuple[jnp.ndarray, DPMSolverState]:
    """Multistep DPM-Solver(++) step of ``sched.solver_order`` ∈ {1,2,3}
    (reference :282-494): first-order on the warmup step and (when
    lower_order_final and S<15) on the final step; third order additionally
    warms up through second order and caps at second on the penultimate
    step (reference step() order selection :471-487).
    """
    S = sched.timesteps.shape[0]
    t = sched.timesteps[step_index]
    prev_t = jnp.where(
        step_index == S - 1, 0, sched.timesteps[jnp.minimum(step_index + 1, S - 1)]
    )
    m0 = _dpm_convert(sched, model_output, t, sample)

    lam_t, lam_s0 = sched.lambda_t[prev_t], sched.lambda_t[t]
    a_t, a_s0 = sched.alpha_t[prev_t], sched.alpha_t[t]
    s_t, s_s0 = sched.sigma_t[prev_t], sched.sigma_t[t]
    h = lam_t - lam_s0

    # first order (≡ DDIM)
    if sched.algorithm_type == "dpmsolver++":
        x_first = (s_t / s_s0) * sample - (a_t * (jnp.exp(-h) - 1.0)) * m0
    else:
        x_first = (a_t / a_s0) * sample - (s_t * (jnp.exp(h) - 1.0)) * m0

    # second order over (prev stored output, current)
    s1 = state.prev_timestep
    m1 = state.prev_output
    lam_s1 = sched.lambda_t[s1]
    h_0 = lam_s0 - lam_s1
    r0 = h_0 / jnp.where(h == 0, 1e-12, h)
    D0 = m0
    D1 = (m0 - m1) / jnp.where(r0 == 0, 1e-12, r0)
    if sched.algorithm_type == "dpmsolver++":
        if sched.solver_type == "midpoint":
            x_second = (
                (s_t / s_s0) * sample
                - (a_t * (jnp.exp(-h) - 1.0)) * D0
                - 0.5 * (a_t * (jnp.exp(-h) - 1.0)) * D1
            )
        else:  # heun
            x_second = (
                (s_t / s_s0) * sample
                - (a_t * (jnp.exp(-h) - 1.0)) * D0
                + (a_t * ((jnp.exp(-h) - 1.0) / h + 1.0)) * D1
            )
    else:
        if sched.solver_type == "midpoint":
            x_second = (
                (a_t / a_s0) * sample
                - (s_t * (jnp.exp(h) - 1.0)) * D0
                - 0.5 * (s_t * (jnp.exp(h) - 1.0)) * D1
            )
        else:
            x_second = (
                (a_t / a_s0) * sample
                - (s_t * (jnp.exp(h) - 1.0)) * D0
                - (s_t * ((jnp.exp(h) - 1.0) / h - 1.0)) * D1
            )

    # third order over (m2, m1, m0) — reference
    # multistep_dpm_solver_third_order_update (:373-427)
    if sched.solver_order >= 3:
        s2 = state.prev_timestep_2
        m2 = state.prev_output_2
        lam_s2 = sched.lambda_t[s2]
        h_1 = lam_s1 - lam_s2
        r1 = h_1 / jnp.where(h == 0, 1e-12, h)
        D1_0 = D1  # (1/r0)(m0 − m1), computed above
        D1_1 = (m1 - m2) / jnp.where(r1 == 0, 1e-12, r1)
        rsum = jnp.where(r0 + r1 == 0, 1e-12, r0 + r1)
        D1_3 = D1_0 + (r0 / rsum) * (D1_0 - D1_1)
        D2 = (D1_0 - D1_1) / rsum
        hh = jnp.where(h == 0, 1e-12, h)
        if sched.algorithm_type == "dpmsolver++":
            x_third = (
                (s_t / s_s0) * sample
                - (a_t * (jnp.exp(-h) - 1.0)) * D0
                + (a_t * ((jnp.exp(-h) - 1.0) / hh + 1.0)) * D1_3
                - (a_t * ((jnp.exp(-h) - 1.0 + h) / hh ** 2 - 0.5)) * D2
            )
        else:
            x_third = (
                (a_t / a_s0) * sample
                - (s_t * (jnp.exp(h) - 1.0)) * D0
                - (s_t * ((jnp.exp(h) - 1.0) / hh - 1.0)) * D1_3
                - (s_t * ((jnp.exp(h) - 1.0 - h) / hh ** 2 - 0.5)) * D2
            )
    else:
        x_third = x_second

    lower_order_final = jnp.logical_and(
        step_index == S - 1, jnp.bool_(sched.lower_order_final and S < 15)
    )
    lower_order_second = jnp.logical_and(
        step_index == S - 2, jnp.bool_(sched.lower_order_final and S < 15)
    )
    use_first = jnp.logical_or(
        jnp.bool_(sched.solver_order == 1),
        jnp.logical_or(state.lower_order_nums < 1, lower_order_final))
    use_second = jnp.logical_or(
        jnp.bool_(sched.solver_order == 2),
        jnp.logical_or(state.lower_order_nums < 2, lower_order_second))
    prev_sample = jnp.where(use_first, x_first,
                            jnp.where(use_second, x_second, x_third))

    new_state = DPMSolverState(
        prev_output=m0,
        prev_timestep=t,
        lower_order_nums=jnp.minimum(state.lower_order_nums + 1,
                                     sched.solver_order),
        prev_output_2=m1,
        prev_timestep_2=s1,
    )
    return prev_sample, new_state


# ------------------------------------------------------------------ LMS ----


@flax.struct.dataclass
class LMSSchedule:
    sigmas: jnp.ndarray       # (S+1,)
    timesteps: jnp.ndarray    # (S,) float descending
    coeffs: jnp.ndarray       # (S, order) newest-first, zero-padded
    init_noise_sigma: jnp.ndarray
    order: int = flax.struct.field(pytree_node=False, default=4)
    prediction_type: str = flax.struct.field(
        pytree_node=False, default="epsilon"
    )

    @classmethod
    def create(
        cls, cfg: NoiseScheduleConfig, num_inference_steps: int,
        order: int = 4,
    ) -> "LMSSchedule":
        """Integrated Adams-Bashforth coefficients over the sigma grid
        (scheduling_lms_discrete.py get_lms_coefficient) — precomputed on the
        host with scipy since they depend only on static step indices."""
        from scipy import integrate

        ac = np.asarray(_alphas_cumprod(cfg))
        timesteps = np.linspace(
            0, cfg.num_train_timesteps - 1, num_inference_steps, dtype=float
        )[::-1].copy()
        sigmas = ((1 - ac) / ac) ** 0.5
        sigmas = np.interp(timesteps, np.arange(len(sigmas)), sigmas)
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)

        S = num_inference_steps
        coeffs = np.zeros((S, order), np.float32)
        for t in range(S):
            cur_order = min(t + 1, order)

            for j in range(cur_order):
                def fn(tau, t=t, j=j, cur_order=cur_order):
                    prod = 1.0
                    for k in range(cur_order):
                        if j == k:
                            continue
                        prod *= (tau - sigmas[t - k]) / (
                            sigmas[t - j] - sigmas[t - k]
                        )
                    return prod

                coeffs[t, j] = integrate.quad(
                    fn, sigmas[t], sigmas[t + 1], epsrel=1e-4
                )[0]
        return cls(
            sigmas=jnp.asarray(sigmas),
            timesteps=jnp.asarray(timesteps, jnp.float32),
            coeffs=jnp.asarray(coeffs),
            init_noise_sigma=jnp.float32(sigmas.max()),
            order=order, prediction_type=cfg.prediction_type,
        )

    def scale_model_input(self, sample, step_index):
        sigma = self.sigmas[step_index]
        return sample / ((sigma**2 + 1) ** 0.5)

    def init_state(self, sample_shape, dtype=jnp.float32) -> jnp.ndarray:
        """Derivative history, newest-first ring of ``order`` slots."""
        return jnp.zeros((self.order,) + tuple(sample_shape), dtype)


def lms_step(
    sched: LMSSchedule,
    derivatives: jnp.ndarray,
    model_output: jnp.ndarray,
    step_index: jnp.ndarray,
    sample: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LMS step: push the new derivative, take the coefficient-weighted sum
    (scheduling_lms_discrete.py step)."""
    sigma = sched.sigmas[step_index]
    pred_x0 = _pred_x0_from_sigma(
        model_output, sample, sigma, sched.prediction_type
    )
    derivative = (sample - pred_x0) / sigma
    derivatives = jnp.concatenate(
        [derivative[None], derivatives[:-1]], axis=0
    )  # newest first
    coeffs = sched.coeffs[step_index]  # (order,) zero-padded
    prev_sample = sample + jnp.tensordot(coeffs, derivatives, axes=1)
    return prev_sample, derivatives
