from diff3dhpe_tpu.diffusion.schedules import (
    linear_beta_schedule,
    cosine_beta_schedule,
    log_cosine_beta_schedule,
    quadratic_beta_schedule,
    sigmoid_beta_schedule,
    make_beta_schedule,
    DiffusionConstants,
)
from diff3dhpe_tpu.diffusion.gaussian_diffusion import GaussianDiffusion, ddim_time_pairs

__all__ = [
    "linear_beta_schedule",
    "cosine_beta_schedule",
    "log_cosine_beta_schedule",
    "quadratic_beta_schedule",
    "sigmoid_beta_schedule",
    "make_beta_schedule",
    "DiffusionConstants",
    "GaussianDiffusion",
    "ddim_time_pairs",
]
