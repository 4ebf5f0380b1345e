"""Inference-optimised functional forward for the MixSTE denoiser.

Consumes the exact flax param tree of models.mixste.MixSTEDenoiser (so
checkpoints are shared) but executes the eval path as a hand-scheduled
pipeline where each block's attention residual is ONE fused Pallas kernel
(LN -> qkv -> GRAND attention -> proj -> +residual, all VMEM-resident;
ops/fused_block.py) and tokens stay flat [rows, C] between kernels.

Eval-only: no dropout/drop-path (they are inactive at eval anyway) and no
VJP. Training and the parity-reference path use the flax module.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from diff3dhpe_tpu.models.mixste import sinusoidal_pos_emb
from diff3dhpe_tpu.ops.fused_block import (
    fused_temporal_block_cols,
    fused_transformer_block,
)


def _dense(params, x):
    y = jnp.dot(x, params["kernel"].astype(x.dtype))
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y


def _layernorm(params, x, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    out = out * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def fast_forward_denoise(
    params: dict,
    x,
    time,
    *,
    num_frame: int,
    num_joints: int,
    depth: int,
    num_heads: int = 8,
    with_time_emb: bool = True,
    mode: str = "s2s",
    dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
):
    """forward_denoise(x [B, F, J, Cin+3], time [B]) -> [B, F_out, J, 3].

    Round-2 layout: ONE spatial-major activation buffer for the whole trunk.
    Frames are padded to a multiple of 8 once in the prologue ([B, F8, J, C],
    pad frames carry garbage that never leaks: spatial pad-groups attend
    among themselves, temporal kernels mask keys >= F). Spatial blocks run
    on the flat [B*F8*J, C] view; temporal blocks read the SAME buffer
    through a column-strided BlockSpec ([B*F8, J*C] view, one (b, j) group
    per grid step) — no transposes or pad/unpad passes between blocks. The
    per-block diffusion-time add is fused into each kernel's load, so an
    entire depth-8 trunk touches HBM exactly once per block.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, f, p, _ = x.shape
    c = params["fusion_layer"]["kernel"].shape[-1]

    x = _dense(params["fusion_layer"], x.astype(dtype))  # [B, F, J, C]

    if with_time_emb:
        t = sinusoidal_pos_emb(time, c)
        t = _dense(params["time_mlp_1"], t.astype(dtype))
        t = jax.nn.gelu(t, approximate=False)
        t = _dense(params["time_mlp_2"], t)  # [B, C]
    else:
        t = None

    # Positional embeddings enter before the respective first blocks
    # (spatial before ste_0; temporal between ste_0 and tte_0 — see below).
    x = x + params["spatial_pos_embed"][0][None, None].astype(x.dtype)

    f8 = ((f + 7) // 8) * 8
    if f8 != f:
        x = jnp.pad(x, ((0, 0), (0, f8 - f), (0, 0), (0, 0)))
    rows_item = f8 * p
    x_flat = x.reshape(b * rows_item, c)

    for i in range(depth):
        block_s = params[f"ste_block_{i}"]
        block_t = params[f"tte_block_{i}"]
        t_i = None
        if t is not None and "time_proj" in block_s:
            t_i = _dense(block_s["time_proj"], jax.nn.silu(t).astype(dtype))
        x_flat = fused_transformer_block(
            x_flat, block_s, n=p, heads=num_heads, interpret=interpret,
            out_ln_params=params["spatial_norm"], t_rows=t_i,
            rows_per_item=rows_item,
        )
        if i == 0:
            x4 = x_flat.reshape(b, f8, p, c)
            x4 = x4.at[:, :f].add(
                params["temporal_pos_embed"][0][None, :, None].astype(x4.dtype)
            )
            x_flat = x4.reshape(b * rows_item, c)
        t_i = None
        if t is not None and "time_proj" in block_t:
            t_i = _dense(block_t["time_proj"], jax.nn.silu(t).astype(dtype))
        x_cols = fused_temporal_block_cols(
            x_flat.reshape(b * f8, p * c), block_t, n=f, f8=f8, j_groups=p,
            heads=num_heads, interpret=interpret, t_rows=t_i,
            out_ln_params=params["temporal_norm"],
        )
        x_flat = x_cols.reshape(b * rows_item, c)

    x = x_flat.reshape(b, f8, p, c)[:, :f]
    if mode == "s2f":
        w = params["weighted_mean_kernel"].astype(x.dtype)
        wb = params["weighted_mean_bias"].astype(x.dtype)
        x = jnp.einsum("bfpc,f->bpc", x, w)[:, None] + wb

    x = _layernorm(params["head_norm"], x, 1e-5)
    x = _dense(params["head"], x)
    return x
