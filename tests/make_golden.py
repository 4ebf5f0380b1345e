"""(Re)generate golden regression fixtures: tiny-model denoiser forward and
DDIM sample outputs with fixed keys. Run from repo root:

    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python tests/make_golden.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from diff3dhpe_tpu.diffusion import GaussianDiffusion
from diff3dhpe_tpu.engine import make_denoise_fn
from diff3dhpe_tpu.models import MixSTEDenoiser

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

MODEL_KW = dict(
    num_frame=9, num_joints=17, in_chans=2, embed_dim=32, depth=2,
    num_heads=4, mlp_ratio=2.0, qkv_bias=True, drop_path_rate=0.1,
    with_time_emb=True, mode="s2s",
)
DIFF_KW = dict(timesteps=50, sampling_timesteps=5, clip_denoised=True,
               beta_schedule="cosine", clip_loss=True, mode="s2s")


def build():
    model = MixSTEDenoiser(**MODEL_KW)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 17, 5))
    t = jnp.array([0.0, 25.0])
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    diffusion = GaussianDiffusion.create(make_denoise_fn(model), **DIFF_KW)
    return model, diffusion, params, x, t


def compute():
    model, diffusion, params, x, t = build()
    fwd = np.asarray(model.apply({"params": params}, x, t, deterministic=True))
    cond = x[..., :2]
    sample = np.asarray(
        diffusion.ddim_sample_loop(params, jax.random.PRNGKey(2), cond, (2, 9, 17, 3))
    )
    loss = np.asarray(
        diffusion.p_losses(params, jax.random.PRNGKey(3), x[..., 2:], cond)
    )
    return dict(forward=fwd, ddim_sample=sample, p_losses=loss)


if __name__ == "__main__":
    os.makedirs(GOLDEN, exist_ok=True)
    out = compute()
    np.savez_compressed(os.path.join(GOLDEN, "tiny_model_v1.npz"), **out)
    for k, v in out.items():
        print(k, v.shape, float(np.abs(v).mean()))
    print("wrote", os.path.join(GOLDEN, "tiny_model_v1.npz"))
