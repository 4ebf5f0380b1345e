"""Training-step microbench on the real TPU chip.

Times one jitted train step (value_and_grad + AdamW update) for a chosen
variant of the flagship 243f config.

  python scripts/train_bench.py VARIANT [B] [FRAMES]

VARIANT: flax_f32 | flax_bf16 | fast_f32 | fast_bf16
  flax_*: the regular flax forward with remat (the round-1 training path).
  fast_*: fused Pallas forward + XLA-recompute backward via custom VJP
          (models/fast_eval.py fast_forward_denoise_train).
B defaults to 8, FRAMES to 243 (round-1 baseline: 361 ms/step = 22.2 seq/s).
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "fast_f32"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 243
    path, dt = variant.rsplit("_", 1)
    dtype = jnp.bfloat16 if dt == "bf16" else None

    from diff3dhpe_tpu.diffusion import GaussianDiffusion
    from diff3dhpe_tpu.engine import build_train_state, make_denoise_fn, make_train_step
    from diff3dhpe_tpu.engine.steps import make_fast_train_denoise_fn, make_optimizer
    from diff3dhpe_tpu.models import MixSTEDenoiser

    J, C, D = 17, 512, 8
    model = MixSTEDenoiser(
        num_frame=frames, num_joints=J, in_chans=2, embed_dim=C, depth=D,
        num_heads=8, mlp_ratio=2.0, qkv_bias=True, drop_path_rate=0.1,
        with_time_emb=True, mode="s2s", dtype=dtype,
    )
    if path == "flax":
        denoise_fn = make_denoise_fn(model, remat=True)
    else:
        denoise_fn = make_fast_train_denoise_fn(
            num_frame=frames, num_joints=J, depth=D, num_heads=8,
            with_time_emb=True, mode="s2s",
            dtype=dtype or jnp.float32, drop_path_rate=0.1,
        )
    diffusion = GaussianDiffusion.create(
        denoise_fn, timesteps=1000, sampling_timesteps=9,
        clip_denoised=True, clip_loss=True, beta_schedule="cosine", mode="s2s",
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, frames, J, 5)), jnp.zeros((1,))
    )["params"]
    opt = make_optimizer(4e-5, 0.99, steps_per_epoch=100)
    state = build_train_state(params, opt)
    train_step = make_train_step(diffusion, opt)

    gt = jax.random.normal(jax.random.PRNGKey(1), (b, frames, J, 3))
    x2d = jax.random.normal(jax.random.PRNGKey(2), (b, frames, J, 2))

    t0 = time.time()
    state, loss = train_step(state, jax.random.PRNGKey(3), gt, x2d)
    l0 = float(loss)  # host transfer = true device sync on the relay
    compile_s = time.time() - t0

    iters = int(os.environ.get("TRAIN_ITERS", "10"))
    losses = []
    t0 = time.time()
    for i in range(iters):
        state, loss = train_step(state, jax.random.fold_in(jax.random.PRNGKey(3), i), gt, x2d)
        losses.append(loss)
    # Each step's state input is the previous step's output, so forcing the
    # last loss forces the whole chain by data dependence (no in-order
    # execution assumption needed).
    lf = float(loss)
    ms = (time.time() - t0) / iters * 1000
    assert all(math.isfinite(float(l)) for l in losses)
    assert math.isfinite(lf)
    print(
        f"{variant} B={b} F={frames}: {ms:.0f} ms/step = {b / ms * 1000:.1f} seq/s"
        f"  loss {l0:.4f}->{lf:.4f}  (compile {compile_s:.0f}s)"
    )


if __name__ == "__main__":
    main()
