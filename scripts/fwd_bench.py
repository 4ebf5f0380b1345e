"""One-forward microbench for perf experiments on the real TPU chip.

Times a single jitted denoiser forward (the DDIM hot op) for a chosen
variant; host-transfer sync (block_until_ready is a no-op on the relay).

  python scripts/fwd_bench.py VARIANT [B] [FRAMES]

VARIANT: flax_f32 | flax_bf16 | rows_f32 | rows_bf16 | cols_f32 | cols_bf16
B defaults to 8 (bench's flip-doubled eval batch), FRAMES to 243.
HEADS env knob (default 8) picks the attention head count — HEADS=4 is the
TPU-friendly head_dim-128 geometry (full-width MXU contractions).
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
    variant = sys.argv[1] if len(sys.argv) > 1 else "rows_bf16"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 243
    path, dt = variant.rsplit("_", 1)
    dtype = jnp.bfloat16 if dt == "bf16" else jnp.float32

    from diff3dhpe_tpu.models import MixSTEDenoiser

    J, C, D = 17, 512, 8
    heads = int(os.environ.get("HEADS", "8"))
    model = MixSTEDenoiser(
        num_frame=frames, num_joints=J, in_chans=2, embed_dim=C, depth=D,
        num_heads=heads, mlp_ratio=2.0, qkv_bias=True, drop_path_rate=0.1,
        with_time_emb=True, mode="s2s",
        dtype=dtype if path == "flax" and dt == "bf16" else None,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, frames, J, 5)), jnp.zeros((1,))
    )["params"]

    if path == "flax":
        def fwd(p, x, t):
            return model.apply({"params": p}, x, t, deterministic=True)
    else:
        from diff3dhpe_tpu.models.fast_eval import fast_forward_denoise

        fuse_time = os.environ.get("FUSE_T", "1") == "1"

        def fwd(p, x, t):
            return fast_forward_denoise(
                p, x, t, num_frame=frames, num_joints=J, depth=D,
                num_heads=heads, dtype=dtype, temporal_mode=path,
                fuse_time=fuse_time,
            )

    fwd = jax.jit(fwd)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, frames, J, 5))
    t = jnp.zeros((b,))
    iters = int(os.environ.get("FWD_ITERS", "20"))
    # One end-of-loop sum forces every output; never sync inside the timed
    # loop (each tunnel dispatch costs ~15 ms — see PERF.md harness notes).
    sum_all = jax.jit(lambda xs: sum(jnp.sum(o.astype(jnp.float32)) for o in xs))

    t0 = time.time()
    out = fwd(params, x, t)
    float(sum_all([out] * iters))
    compile_s = time.time() - t0

    t0 = time.time()
    outs = [fwd(params, x, t) for _ in range(iters)]
    assert math.isfinite(float(sum_all(outs)))
    ms = (time.time() - t0) / iters * 1000
    print(
        f"{variant} B={b} F={frames} H={heads}: {ms:.1f} ms/fwd  "
        f"(compile {compile_s:.0f}s)"
    )


if __name__ == "__main__":
    main()
