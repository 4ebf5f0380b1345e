"""Beta-schedule and constant-buffer tests vs the cited formulas and torch.

Reference: diffusion module schedules (:52-94) and buffers (:129-183).
"""
import math

import numpy as np
import pytest

from diff3dhpe_tpu.diffusion import make_beta_schedule, ddim_time_pairs
from diff3dhpe_tpu.diffusion.schedules import make_diffusion_constants

torch = pytest.importorskip("torch")


def _torch_cosine(timesteps, s=0.008):
    steps = timesteps + 1
    x = torch.linspace(0, timesteps, steps, dtype=torch.float64)
    alphas_cumprod = torch.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return torch.clip(betas, 0, 0.999)


@pytest.mark.parametrize("T", [10, 100, 1000])
def test_cosine_schedule_matches_torch(T):
    ours = make_beta_schedule("cosine", T)
    theirs = _torch_cosine(T).numpy()
    # numpy and torch float64 cos/linspace can differ in the last ulp.
    np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-15)


def test_linear_schedule_matches_torch():
    ours = make_beta_schedule("linear", 1000)
    theirs = torch.linspace(0.0001, 0.02, 1000, dtype=torch.float64).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-15)


def test_logcosine_schedule_shape_and_range():
    b = make_beta_schedule("logcosine", 1000)
    assert b.shape == (1000,)
    assert (b >= 0).all() and (b <= 0.999).all()


def test_unknown_schedule_raises():
    with pytest.raises(ValueError):
        make_beta_schedule("nope", 10)


def test_constants_match_torch_buffers():
    """Recompute every registered buffer the torch way and compare exactly
    (both pipelines are float64 -> float32, so equality should be bitwise)."""
    T = 1000
    betas = _torch_cosine(T)
    alphas = 1.0 - betas
    alphas_cumprod = torch.cumprod(alphas, axis=0)
    alphas_cumprod_prev = torch.nn.functional.pad(alphas_cumprod[:-1], (1, 0), value=1.0)

    c = make_diffusion_constants("cosine", T)

    def check(name, torch_val):
        # float64 math then float32 cast on both sides; allow 1 f32 ulp for
        # values whose float64 intermediates sit on a rounding boundary.
        np.testing.assert_allclose(
            getattr(c, name),
            torch_val.to(torch.float32).numpy(),
            rtol=2.4e-7,
            atol=1e-12,
            err_msg=name,
        )

    check("betas", betas)
    check("alphas_cumprod", alphas_cumprod)
    check("alphas_cumprod_prev", alphas_cumprod_prev)
    check("sqrt_recip_alphas", torch.sqrt(1.0 / alphas))
    check("sqrt_alphas_cumprod", torch.sqrt(alphas_cumprod))
    check("sqrt_one_minus_alphas_cumprod", torch.sqrt(1.0 - alphas_cumprod))
    check("log_one_minus_alphas_cumprod", torch.log(1.0 - alphas_cumprod))
    check("sqrt_recip_alphas_cumprod", torch.sqrt(1.0 / alphas_cumprod))
    check("sqrt_recipm1_alphas_cumprod", torch.sqrt(1.0 / alphas_cumprod - 1))
    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    check("posterior_variance", posterior_variance)
    check(
        "posterior_log_variance_clipped",
        torch.log(posterior_variance.clamp(min=1e-20)),
    )
    check(
        "posterior_mean_coef1",
        betas * torch.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod),
    )
    check(
        "posterior_mean_coef2",
        (1.0 - alphas_cumprod_prev) * torch.sqrt(alphas) / (1.0 - alphas_cumprod),
    )
    np.testing.assert_allclose(
        c.sqrt_alphas_cumprod_prev,
        torch.sqrt(torch.nn.functional.pad(alphas_cumprod, (1, 0), value=1.0)).numpy(),
        rtol=1e-12,
    )


@pytest.mark.parametrize("T,S", [(1000, 5), (1000, 9), (1000, 6), (1000, 7), (1000, 20), (10, 10)])
def test_ddim_time_pairs_match_torch(T, S):
    times = torch.linspace(-1, T - 1, steps=S + 1)
    times = list(reversed(times.int().tolist()))
    expected = list(zip(times[:-1], times[1:]))
    ours = ddim_time_pairs(T, S)
    assert [tuple(p) for p in ours] == expected
    # Final step always lands on (.., -1) so the sampler terminates on x0.
    assert ours[-1, 1] == -1
    assert ours[0, 0] == T - 1
