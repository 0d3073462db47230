from tsdiff_tpu.diffusion.schedules import (  # noqa: F401
    get_beta_schedule,
    alphas_from_betas,
    DiffusionSchedule,
)
