from diffusion_ccsp_tpu.utils.timing import (
    MetricsLogger,
    RollingTimer,
    profile_trace,
)
