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
from diff3dhpe_tpu.ops.fused_block import fused_transformer_block


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


def _block(block, x_flat, n, heads, time_emb, dtype, interpret, out_ln=None):
    """One transformer block on flat tokens [B, L, C] (groups of n rows):
    a single fused kernel for attention + MLP residuals, with the model's
    inter-block LayerNorm fused into the epilogue."""
    b, l, c = x_flat.shape
    if time_emb is not None and "time_proj" in block:
        t = _dense(block["time_proj"], jax.nn.silu(time_emb).astype(dtype))
        x_flat = x_flat + t[:, None, :].astype(x_flat.dtype)

    rows = x_flat.reshape(b * l, c)
    rows = fused_transformer_block(
        rows, block, n=n, heads=heads, interpret=interpret, out_ln_params=out_ln
    )
    return rows.reshape(b, l, c)


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
    """forward_denoise(x [B, F, J, Cin+3], time [B]) -> [B, F_out, J, 3]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, f, p, _ = x.shape
    l = f * p
    c = params["fusion_layer"]["kernel"].shape[-1]

    x = _dense(params["fusion_layer"], x.astype(dtype))

    if with_time_emb:
        t = sinusoidal_pos_emb(time, c)
        t = _dense(params["time_mlp_1"], t.astype(dtype))
        t = jax.nn.gelu(t, approximate=False)
        t = _dense(params["time_mlp_2"], t)
    else:
        t = None

    x = x.reshape(b, l, c)  # frame-major, joint-minor tokens

    def to_temporal(y):
        return jnp.transpose(y.reshape(b, f, p, c), (0, 2, 1, 3)).reshape(b, l, c)

    def to_spatial(y):
        return jnp.transpose(y.reshape(b, p, f, c), (0, 2, 1, 3)).reshape(b, l, c)

    for i in range(depth):
        if i == 0:
            x = x + jnp.tile(params["spatial_pos_embed"][0], (f, 1)).astype(x.dtype)
        x = _block(params[f"ste_block_{i}"], x, p, num_heads, t, dtype, interpret,
                   out_ln=params["spatial_norm"])

        x = to_temporal(x)
        if i == 0:
            x = x + jnp.tile(params["temporal_pos_embed"][0], (p, 1)).astype(x.dtype)
        x = _block(params[f"tte_block_{i}"], x, f, num_heads, t, dtype, interpret,
                   out_ln=params["temporal_norm"])
        x = to_spatial(x)

    x = x.reshape(b, f, p, c)
    if mode == "s2f":
        w = params["weighted_mean_kernel"].astype(x.dtype)
        wb = params["weighted_mean_bias"].astype(x.dtype)
        x = jnp.einsum("bfpc,f->bpc", x, w)[:, None] + wb

    x = _layernorm(params["head_norm"], x, 1e-5)
    x = _dense(params["head"], x)
    return x
