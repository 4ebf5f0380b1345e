"""End-to-end DDIM-sampling parity against the reference implementation.

Runs the reference's GaussianDiffusion.ddim_sample_loop (torch) and our
lax.scan sampler with IDENTICAL weights and IDENTICAL x_T; with eta=0 the
sample paths are deterministic, so the final 3D poses must agree to float32
accumulation error. This exercises the entire eval stack: schedule buffers,
DDIM time grid, clamp, the denoiser, and the update rule."""
import sys

import numpy as np
import pytest

from conftest import has_reference, REFERENCE_DIR

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from diff3dhpe_tpu.diffusion import GaussianDiffusion  # noqa: E402
from diff3dhpe_tpu.engine import make_denoise_fn  # noqa: E402
from diff3dhpe_tpu.io import convert_torch_state_dict  # noqa: E402
from diff3dhpe_tpu.models import MixSTEDenoiser  # noqa: E402


@pytest.mark.skipif(not has_reference(), reason="reference tree not available")
@pytest.mark.parametrize("T,S,clip", [(1000, 5, True), (40, 9, False)])
def test_ddim_sampling_parity_with_reference(T, S, clip):
    torch = pytest.importorskip("torch")
    from test_model import _import_reference_models

    S2S, _ = _import_reference_models()
    sys.path.insert(0, REFERENCE_DIR)
    from common.conditional_diffusion_ddim_normal_directPredict_variableLoss_both_crossFrames import (
        GaussianDiffusion as RefGaussianDiffusion,
    )

    torch.manual_seed(0)
    F, J, C, depth = 9, 17, 64, 2
    ref_model = S2S(num_frame=F, num_joints=J, in_chans=2, embed_dim=C, depth=depth,
                    num_heads=8, mlp_ratio=2.0, qkv_bias=True, with_time_emb=True)
    ref_model.eval()
    ref_diff = RefGaussianDiffusion(
        model=ref_model, timesteps=T, sampling_timesteps=S, loss_type="l2",
        clip_denoised=clip, beta_schedule="cosine", ddim_sampling_eta=0.0,
    )
    ref_diff.eval()

    params = convert_torch_state_dict(ref_model.state_dict(), depth=depth)
    model = MixSTEDenoiser(num_frame=F, num_joints=J, in_chans=2, embed_dim=C,
                           depth=depth, num_heads=8, mlp_ratio=2.0, qkv_bias=True,
                           with_time_emb=True, mode="s2s")
    diffusion = GaussianDiffusion.create(
        make_denoise_fn(model), timesteps=T, sampling_timesteps=S,
        clip_denoised=clip, beta_schedule="cosine", ddim_sampling_eta=0.0,
        mode="s2s",
    )

    rng = np.random.default_rng(5)
    b = 2
    cond = rng.standard_normal((b, F, J, 2)).astype(np.float32)
    x_t = rng.standard_normal((b, F, J, 3)).astype(np.float32)

    # Reference: same x_T injected by seeding torch's randn via monkeypatch.
    orig_randn = torch.randn

    def fixed_randn(*shape, **kwargs):
        if tuple(shape[0] if isinstance(shape[0], (list, tuple)) else shape) == x_t.shape:
            return torch.from_numpy(x_t.copy())
        return orig_randn(*shape, **kwargs)

    torch.randn = fixed_randn
    try:
        with torch.no_grad():
            ref_out = ref_diff.ddim_sample_loop(
                torch.from_numpy(cond), list(x_t.shape)
            ).numpy()
    finally:
        torch.randn = orig_randn

    ours = np.asarray(
        diffusion.ddim_sample_loop(
            params, jax.random.PRNGKey(0), jnp.asarray(cond), x_t.shape,
            x_init=jnp.asarray(x_t),
        )
    )

    assert ours.shape == ref_out.shape
    # S full denoiser forwards accumulate float32 error; stay well under
    # 0.1 mm at metre scale (1e-4 m).
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=5e-5)
    max_abs = np.abs(ours - ref_out).max()
    assert max_abs < 1e-4, f"max abs deviation {max_abs} (>= 0.1mm at metre scale)"
