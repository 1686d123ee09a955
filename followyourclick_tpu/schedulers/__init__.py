from followyourclick_tpu.schedulers.ddim import (  # noqa: F401
    DDIMSchedule,
    add_noise,
    ddim_step,
    get_velocity,
    make_beta_schedule,
    rescale_zero_terminal_snr,
)
