from followyourclick_tpu.schedulers.ddim import (  # noqa: F401
    DDIMSchedule,
    add_noise,
    ddim_step,
    get_velocity,
    make_beta_schedule,
    rescale_zero_terminal_snr,
)
from followyourclick_tpu.schedulers.solvers import (  # noqa: F401
    DPMSolverSchedule,
    DPMSolverState,
    EulerAncestralSchedule,
    EulerSchedule,
    LMSSchedule,
    PNDMSchedule,
    PNDMState,
    dpm_solver_step,
    euler_ancestral_step,
    euler_step,
    lms_step,
    pndm_step,
)
