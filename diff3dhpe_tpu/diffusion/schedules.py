"""Diffusion beta schedules and precomputed alpha/beta constant buffers.

All schedule math runs in float64 NumPy on the host and is cast to float32
once, exactly mirroring the reference's register_buffer(float64 -> float32)
convention (reference: common/conditional_diffusion_ddim_normal_directPredict_
variableLoss_both_crossFrames.py:52-94 for the schedules and :129-183 for the
buffers). These are compile-time constants for XLA — they are baked into the
jitted train/eval programs, never transferred per step.
"""
from __future__ import annotations

import dataclasses
import math

import numpy as np


def linear_beta_schedule(timesteps: int) -> np.ndarray:
    beta_start = 0.0001
    beta_end = 0.02
    return np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine schedule from Nichol & Dhariwal (improved DDPM)."""
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def log_cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine schedule evaluated on a logspace time grid."""
    steps = timesteps + 1
    x = np.logspace(0, 2, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / 1e-1 / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def quadratic_beta_schedule(timesteps: int) -> np.ndarray:
    beta_start = 0.0001
    beta_end = 0.02
    return np.linspace(beta_start ** 0.5, beta_end ** 0.5, timesteps, dtype=np.float64) ** 2


def sigmoid_beta_schedule(timesteps: int) -> np.ndarray:
    beta_start = 0.0001
    beta_end = 0.02
    betas = np.linspace(-6, 6, timesteps, dtype=np.float64)
    return 1.0 / (1.0 + np.exp(-betas)) * (beta_end - beta_start) + beta_start


_SCHEDULES = {
    "linear": linear_beta_schedule,
    "cosine": cosine_beta_schedule,
    "logcosine": log_cosine_beta_schedule,
    "quadratic": quadratic_beta_schedule,
    "sigmoid": sigmoid_beta_schedule,
}


def make_beta_schedule(name: str, timesteps: int) -> np.ndarray:
    try:
        return _SCHEDULES[name](timesteps)
    except KeyError:
        raise ValueError(f"unknown beta schedule {name}") from None


@dataclasses.dataclass(frozen=True)
class DiffusionConstants:
    """Float32 schedule buffers (all shape [T]), computed in float64.

    Field set mirrors the reference's registered buffers so a converted torch
    checkpoint can be validated field-by-field.
    """

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_recip_alphas: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    log_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray
    p2_loss_weight: np.ndarray
    # [T+1]; float64 in the reference (never registered as a buffer there).
    sqrt_alphas_cumprod_prev: np.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def make_diffusion_constants(
    beta_schedule: str,
    timesteps: int,
    p2_loss_weight_gamma: float = 0.0,
    p2_loss_weight_k: float = 1.0,
) -> DiffusionConstants:
    betas = make_beta_schedule(beta_schedule, timesteps)

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.concatenate(([1.0], alphas_cumprod[:-1]))
    sqrt_alphas_cumprod_prev = np.sqrt(np.concatenate(([1.0], alphas_cumprod)))
    sqrt_recip_alphas = np.sqrt(1.0 / alphas)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)

    f32 = lambda a: a.astype(np.float32)
    return DiffusionConstants(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_recip_alphas=f32(sqrt_recip_alphas),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(np.log(np.clip(posterior_variance, 1e-20, None))),
        posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        p2_loss_weight=f32(
            (p2_loss_weight_k + alphas_cumprod / (1 - alphas_cumprod)) ** -p2_loss_weight_gamma
        ),
        sqrt_alphas_cumprod_prev=sqrt_alphas_cumprod_prev,
    )
