"""Measurement probe: what do the per-block temporal transposes cost?

Times the fused depth-8 trunk twice on the real TPU chip:
  A. the production "rows" pipeline (transpose to frame-contiguous groups
     and back around every temporal block), and
  B. the SAME kernel calls with the transposes REMOVED (the temporal kernel
     consumes the spatial-major buffer directly — WRONG RESULTS, the group
     structure is scrambled; identical FLOPs/DMA shapes, timing only).

A-B isolates the 2*depth transpose cost, deciding whether further layout
work (PERF.md round-2 lever list) can pay.

  python scripts/probe_transpose_cost.py [B] [FRAMES]
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from diff3dhpe_tpu.ops.fused_block import fused_transformer_block


def make_trunk(b, f, j, c, depth, heads, dtype, with_transposes):
    f8 = ((f + 7) // 8) * 8
    rows_item = f8 * j

    def trunk(params, x_flat):
        for i in range(depth):
            x_flat = fused_transformer_block(
                x_flat, params[f"s{i}"], n=j, heads=heads,
                out_ln_params=None, rows_per_item=rows_item,
            )
            if with_transposes:
                x_t = jnp.transpose(x_flat.reshape(b, f8, j, c), (0, 2, 1, 3))
                x_t = x_t.reshape(b * rows_item, c)
            else:
                x_t = x_flat
            x_t = fused_transformer_block(
                x_t, params[f"t{i}"], n=f, heads=heads,
                out_ln_params=None, rows_per_item=rows_item, pre_padded_n8=f8,
            )
            if with_transposes:
                x_flat = jnp.transpose(
                    x_t.reshape(b, j, f8, c), (0, 2, 1, 3)
                ).reshape(b * rows_item, c)
            else:
                x_flat = x_t
        return x_flat

    return trunk, f8, rows_item


def block_params(key, c, hidden, dtype):
    ks = jax.random.split(key, 8)
    mk = lambda k, shape: jax.random.normal(k, shape, jnp.float32) * 0.02
    return {
        "norm1": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
        "norm2": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
        "attn": {
            "qkv": {"kernel": mk(ks[0], (c, 3 * c)), "bias": jnp.zeros((3 * c,))},
            "proj": {"kernel": mk(ks[1], (c, c)), "bias": jnp.zeros((c,))},
        },
        "mlp": {
            "fc1": {"kernel": mk(ks[2], (c, hidden)), "bias": jnp.zeros((hidden,))},
            "fc2": {"kernel": mk(ks[3], (hidden, c)), "bias": jnp.zeros((c,))},
        },
    }


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    f = int(sys.argv[2]) if len(sys.argv) > 2 else 243
    j, c, depth, heads = 17, 512, 8, 8
    dtype = jnp.bfloat16 if os.environ.get("PROBE_DTYPE", "bf16") == "bf16" else jnp.float32

    params = {}
    for i in range(depth):
        params[f"s{i}"] = block_params(jax.random.PRNGKey(2 * i), c, 2 * c, dtype)
        params[f"t{i}"] = block_params(jax.random.PRNGKey(2 * i + 1), c, 2 * c, dtype)

    iters = int(os.environ.get("PROBE_ITERS", "30"))
    for label, wt in (("with-transposes", True), ("no-transposes", False)):
        trunk, f8, rows_item = make_trunk(b, f, j, c, depth, heads, dtype, wt)
        fn = jax.jit(trunk)
        x = jax.random.normal(jax.random.PRNGKey(9), (b * rows_item, c), dtype)
        sum_sync = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
        out = fn(params, x)
        float(sum_sync(out))
        t0 = time.time()
        for _ in range(iters):
            out = fn(params, x)
        assert math.isfinite(float(sum_sync(out)))
        ms = (time.time() - t0) / iters * 1000
        print(f"{label}: {ms:.2f} ms / trunk  (B={b}, F={f}, {dtype.__name__})")


if __name__ == "__main__":
    main()
