from diffusion_ccsp_tpu.ops.schedules import (
    DiffusionSchedule,
    cosine_beta_schedule,
    sigmoid_beta_schedule,
    simple_linear_schedule,
)
