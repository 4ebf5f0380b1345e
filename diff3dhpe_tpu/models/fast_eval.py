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

import collections
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from diff3dhpe_tpu.models.mixste import sinusoidal_pos_emb
from diff3dhpe_tpu.ops.fused_block import (
    f32_precision_scope,
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
    temporal_mode: str = "rows",
    dp_scales=None,
    fuse_time: bool = True,
    f32_head: bool = False,
    f32_prec: Optional[str] = None,
    f32_tail_pairs: int = 0,
):
    """forward_denoise(x [B, F, J, Cin+3], time [B]) -> [B, F_out, J, 3].

    Round-2 layout: ONE spatial-major activation buffer for the whole trunk.
    Frames are padded to a multiple of 8 once in the prologue ([B, F8, J, C],
    pad frames carry garbage that never leaks: spatial pad-groups attend
    among themselves, temporal kernels mask keys >= F). Spatial blocks run
    on the flat [B*F8*J, C] view; temporal blocks either read the SAME
    buffer through a column-strided BlockSpec (temporal_mode="cols": one
    (b, j) group per grid step, no transposes) or run on an XLA-transposed
    frame-contiguous view that keeps the F8 padding (temporal_mode="rows":
    several groups batch into each hoisted-GEMM grid step — the measured
    winner on v5e, see PERF.md). The per-block diffusion-time add is fused
    into each kernel's load.

    ``dp_scales`` = (dp_spatial [depth, B, F, 2], dp_temporal [depth, B, J, 2])
    f32 drop-path residual scales for stochastic-depth training (last dim =
    attention/MLP branch). Granularity matches flax DropPath (and the
    reference's timm DropPath): one draw per attention GROUP — per
    (sample, frame) for spatial blocks, per (sample, joint) for temporal
    blocks (models/mixste.py DropPath mask shape (tokens.shape[0], 1, 1)
    over the reshaped (b*f, p, c) / (b*p, f, c) token batches). See
    fast_forward_denoise_train for the differentiable wrapper.

    ``f32_tail_pairs``: with a bf16 ``dtype``, run the LAST this-many
    (spatial, temporal) block pairs — and the head — at f32 activations
    under the ``f32_prec`` contraction mode, while the earlier pairs stay
    bf16. Round-4 localisation (PERF.md) proved the entire gate-relevant
    bf16 eval error is set by the FINAL DDIM step's forward; this splits
    that one forward further, trading the cheap bf16 pairs' rounding
    against the tail's exact contraction — the accuracy study measures
    which tail depth still passes the gate (scripts/accuracy_study.py
    ``fast_mixed1_h3_tailK``).
    """
    if f32_prec is not None:
        # Pin this call's f32 contraction mode (trace-time; see
        # ops/fused_block.py::f32_precision_scope) and re-enter without it.
        # bf16 contractions ignore the mode (_dot_f32 pins DEFAULT for bf16
        # operands), so scoping the whole call only affects the f32 parts.
        with f32_precision_scope(f32_prec):
            return fast_forward_denoise(
                params, x, time, num_frame=num_frame, num_joints=num_joints,
                depth=depth, num_heads=num_heads, with_time_emb=with_time_emb,
                mode=mode, dtype=dtype, interpret=interpret,
                temporal_mode=temporal_mode, dp_scales=dp_scales,
                fuse_time=fuse_time, f32_head=f32_head,
                f32_tail_pairs=f32_tail_pairs,
            )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, f, p, _ = x.shape
    c = params["fusion_layer"]["kernel"].shape[-1]

    x = _dense(params["fusion_layer"], x.astype(dtype))  # [B, F, J, C]

    def compute_t(dt):
        """Diffusion-time embedding [B, C] at activation dtype ``dt``."""
        tt = sinusoidal_pos_emb(time, c)
        tt = _dense(params["time_mlp_1"], tt.astype(dt))
        tt = jax.nn.gelu(tt, approximate=False)
        return _dense(params["time_mlp_2"], tt)  # [B, C]

    t = compute_t(dtype) if with_time_emb else None

    tail_start = depth
    if f32_tail_pairs and dtype == jnp.bfloat16:
        assert temporal_mode != "legacy" and dp_scales is None, (
            "f32_tail_pairs is an eval-path feature (rows/cols modes)"
        )
        tail_start = max(0, depth - int(f32_tail_pairs))

    if temporal_mode == "legacy":
        # Round-1 structure (A/B reference): unpadded frame-major tokens,
        # XLA time-emb adds, per-block transpose + in-kernel pad/unpad.
        assert dp_scales is None, (
            "legacy temporal_mode is an eval-only A/B reference; use "
            "'rows' or 'cols' for drop-path training"
        )
        l = f * p
        x = x.reshape(b, l, c)
        x = x + jnp.tile(params["spatial_pos_embed"][0], (f, 1)).astype(x.dtype)
        for i in range(depth):
            block_s = params[f"ste_block_{i}"]
            block_t = params[f"tte_block_{i}"]
            if t is not None and "time_proj" in block_s:
                t_i = _dense(block_s["time_proj"], jax.nn.silu(t).astype(dtype))
                x = x + t_i[:, None].astype(x.dtype)
            x = fused_transformer_block(
                x.reshape(b * l, c), block_s, n=p, heads=num_heads,
                interpret=interpret, out_ln_params=params["spatial_norm"],
            ).reshape(b, l, c)
            x = jnp.transpose(x.reshape(b, f, p, c), (0, 2, 1, 3)).reshape(b, l, c)
            if i == 0:
                x = x + jnp.tile(params["temporal_pos_embed"][0], (p, 1)).astype(x.dtype)
            if t is not None and "time_proj" in block_t:
                t_i = _dense(block_t["time_proj"], jax.nn.silu(t).astype(dtype))
                x = x + t_i[:, None].astype(x.dtype)
            x = fused_transformer_block(
                x.reshape(b * l, c), block_t, n=f, heads=num_heads,
                interpret=interpret, out_ln_params=params["temporal_norm"],
            ).reshape(b, l, c)
            x = jnp.transpose(x.reshape(b, p, f, c), (0, 2, 1, 3)).reshape(b, l, c)
        x = x.reshape(b, f, p, c)
        if mode == "s2f":
            w = params["weighted_mean_kernel"].astype(x.dtype)
            wb = params["weighted_mean_bias"].astype(x.dtype)
            x = jnp.einsum("bfpc,f->bpc", x, w)[:, None] + wb
        if f32_head:
            x = x.astype(jnp.float32)
        x = _layernorm(params["head_norm"], x, 1e-5)
        return _dense(params["head"], x)

    # Positional embeddings enter before the respective first blocks
    # (spatial before ste_0; temporal between ste_0 and tte_0 — see below).
    x = x + params["spatial_pos_embed"][0][None, None].astype(x.dtype)

    f8 = ((f + 7) // 8) * 8
    if f8 != f:
        x = jnp.pad(x, ((0, 0), (0, f8 - f), (0, 0), (0, 0)))
    rows_item = f8 * p
    x_flat = x.reshape(b * rows_item, c)

    dp_sp, dp_tp = dp_scales if dp_scales is not None else (None, None)

    def spatial_dp_rows(d_bf2):
        """[B, F, 2] per-(sample,frame) scales -> per-row [B*F8*J, 2] in the
        spatial-major row order (b, f8, j); pad frames get zeros (their
        outputs are garbage that never leaks)."""
        if f8 != f:
            d_bf2 = jnp.pad(d_bf2, ((0, 0), (0, f8 - f), (0, 0)))
        return jnp.broadcast_to(
            d_bf2[:, :, None, :], (b, f8, p, 2)
        ).reshape(b * rows_item, 2)

    def temporal_dp_rows(d_bj2):
        """[B, J, 2] per-(sample,joint) scales -> per-row [B*J*F8, 2] in the
        transposed frame-major row order (b, j, f8)."""
        return jnp.broadcast_to(
            d_bj2[:, :, None, :], (b, p, f8, 2)
        ).reshape(b * rows_item, 2)

    def xla_time_add(x_flat, t_i):
        """Fallback time-embedding add between kernels (fuse_time=False)."""
        return (x_flat.reshape(b, rows_item, c) + t_i[:, None].astype(x_flat.dtype)
                ).reshape(b * rows_item, c)

    for i in range(depth):
        if i == tail_start and x_flat.dtype == jnp.bfloat16:
            # Precision tail: the remaining pairs (and the head) run at f32
            # activations; the time embedding is recomputed at f32 so the
            # tail's per-block adds carry no bf16 rounding of their own.
            x_flat = x_flat.astype(jnp.float32)
            dtype = jnp.float32
            t = compute_t(jnp.float32) if with_time_emb else None
        block_s = params[f"ste_block_{i}"]
        block_t = params[f"tte_block_{i}"]
        t_i = None
        if t is not None and "time_proj" in block_s:
            t_i = _dense(block_s["time_proj"], jax.nn.silu(t).astype(dtype))
        dp_s = spatial_dp_rows(dp_sp[i]) if dp_sp is not None else None
        if t_i is not None and not fuse_time:
            x_flat = xla_time_add(x_flat, t_i)
            t_i = None
        x_flat = fused_transformer_block(
            x_flat, block_s, n=p, heads=num_heads, interpret=interpret,
            out_ln_params=params["spatial_norm"], t_rows=t_i,
            rows_per_item=rows_item, dp_scales=dp_s,
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
        if t_i is not None and not fuse_time:
            x_flat = xla_time_add(x_flat, t_i)
            t_i = None
        if temporal_mode == "cols":
            # Column-strided BlockSpec: no transpose, but one group (M=f8)
            # per grid step — fewer rows per MXU call (see PERF.md).
            dp_t = dp_tp[i].reshape(b * p, 2) if dp_tp is not None else None
            x_cols = fused_temporal_block_cols(
                x_flat.reshape(b * f8, p * c), block_t, n=f, f8=f8, j_groups=p,
                heads=num_heads, interpret=interpret, t_rows=t_i,
                out_ln_params=params["temporal_norm"], dp_scales=dp_t,
            )
            x_flat = x_cols.reshape(b * rows_item, c)
        else:
            # XLA transpose to frame-contiguous groups; groups stay f8-padded
            # (pre_padded_n8) so there is no per-block pad/unpad round trip,
            # and multiple groups batch into each hoisted-GEMM grid step.
            dp_t = temporal_dp_rows(dp_tp[i]) if dp_tp is not None else None
            x_t = jnp.transpose(x_flat.reshape(b, f8, p, c), (0, 2, 1, 3))
            x_t = x_t.reshape(b * rows_item, c)
            x_t = fused_transformer_block(
                x_t, block_t, n=f, heads=num_heads, interpret=interpret,
                out_ln_params=params["temporal_norm"], t_rows=t_i,
                rows_per_item=rows_item, pre_padded_n8=f8, dp_scales=dp_t,
            )
            x_flat = jnp.transpose(
                x_t.reshape(b, p, f8, c), (0, 2, 1, 3)
            ).reshape(b * rows_item, c)

    x = x_flat.reshape(b, f8, p, c)[:, :f]
    if mode == "s2f":
        w = params["weighted_mean_kernel"].astype(x.dtype)
        wb = params["weighted_mean_bias"].astype(x.dtype)
        x = jnp.einsum("bfpc,f->bpc", x, w)[:, None] + wb

    # f32_head: the trunk's x0-estimate leaves the head at full precision
    # instead of being rounded to bf16 (a ~0.2% relative output rounding
    # that the DDIM update would otherwise inherit every step). The head
    # GEMM is [rows, C] @ [C, 3] — negligible next to the trunk.
    if f32_head:
        x = x.astype(jnp.float32)
    x = _layernorm(params["head_norm"], x, 1e-5)
    x = _dense(params["head"], x)
    return x


# ----------------------------------------------------------------------
# Training path: fused forward + XLA-recompute backward (custom VJP)
# ----------------------------------------------------------------------

def _xla_block(bp, x4, is_spatial, t_emb, dp, num_heads, dtype,
               fused_attn_bwd: bool = False):
    """One MixSTE transformer block (reference Block:90-135) as plain XLA on
    a [B, F, J, C] buffer — the differentiable recompute target shared by
    the monolithic mirror (xla_forward_denoise) and the pair-boundary
    backward (_fused_pair).

    ``fused_attn_bwd`` swaps the attention core for
    grand_attention_trainable (custom VJP: Pallas forward dispatcher +
    flash-style in-VMEM backward kernel for long N) — same math, no
    [G, N, N] probability tensors in HBM during the backward."""
    from diff3dhpe_tpu.ops.attention import (
        grand_attention,
        grand_attention_trainable,
    )

    attn_fn = grand_attention_trainable if fused_attn_bwd else grand_attention
    b, f, p, c = x4.shape
    if t_emb is not None and "time_proj" in bp:
        ti = _dense(bp["time_proj"], jax.nn.silu(t_emb).astype(dtype))
        x4 = x4 + ti[:, None, None, :].astype(x4.dtype)
    if is_spatial:
        tok = x4.reshape(b * f, p, c)
    else:
        tok = jnp.transpose(x4, (0, 2, 1, 3)).reshape(b * p, f, c)
    n = tok.shape[1]

    def branch_scale(col, y):
        if dp is None:
            return y
        # dp is per attention group [B, G, 2] (G = F spatial / J
        # temporal); tok rows are exactly the B*G groups in order.
        s = dp[:, :, col].reshape(tok.shape[0])
        return y * s[:, None, None].astype(y.dtype)

    xn = _layernorm(bp["norm1"], tok, 1e-6)
    qkv = _dense(bp["attn"]["qkv"], xn)
    qkv = qkv.reshape(tok.shape[0], n, 3, num_heads, c // num_heads)
    qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
    att = attn_fn(qkv[0], qkv[1], qkv[2])
    att = jnp.transpose(att, (0, 2, 1, 3)).reshape(tok.shape[0], n, c)
    tok = tok + branch_scale(0, _dense(bp["attn"]["proj"], att))
    mn = _layernorm(bp["norm2"], tok, 1e-6)
    mid = jax.nn.gelu(_dense(bp["mlp"]["fc1"], mn), approximate=False)
    tok = tok + branch_scale(1, _dense(bp["mlp"]["fc2"], mid))

    if is_spatial:
        return tok.reshape(b, f, p, c)
    return jnp.transpose(tok.reshape(b, p, f, c), (0, 2, 1, 3))


def xla_forward_denoise(
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
    dtype=jnp.float32,
    dp_scales=None,
    checkpoint_blocks: bool = False,
    fused_attn_bwd: bool = False,
):
    """Pure-XLA functional mirror of the MixSTE forward with explicit
    drop-path scales — the differentiable reference that
    fast_forward_denoise_train's backward pass recomputes through.

    Matches models.mixste.MixSTEDenoiser exactly when dp_scales is None or
    all-ones (drop_rate and attn_drop are 0 in every shipped config, so
    drop-path is the only stochastic regulariser; reference Block:90-135).

    ``checkpoint_blocks``: each transformer block becomes its own
    jax.checkpoint region, so a vjp through this mirror stores only block
    boundaries and recomputes one block at a time (same gradients; smaller
    backward working set at +1 forward of FLOPs).
    """
    b, f, p, _ = x.shape
    c = params["fusion_layer"]["kernel"].shape[-1]

    def block(bp, x4, is_spatial, t_emb, dp):
        return _xla_block(bp, x4, is_spatial, t_emb, dp, num_heads, dtype,
                          fused_attn_bwd=fused_attn_bwd)

    if checkpoint_blocks:
        # args: (bp, x4, is_spatial, t_emb, dp) — is_spatial is static.
        block = jax.checkpoint(block, static_argnums=(2,))

    x = _dense(params["fusion_layer"], x.astype(dtype))
    if with_time_emb:
        t = sinusoidal_pos_emb(time, c)
        t = _dense(params["time_mlp_1"], t.astype(dtype))
        t = jax.nn.gelu(t, approximate=False)
        t = _dense(params["time_mlp_2"], t)
    else:
        t = None

    x = x + params["spatial_pos_embed"][0][None, None].astype(x.dtype)
    dp_sp, dp_tp = dp_scales if dp_scales is not None else (None, None)
    for i in range(depth):
        dp_s = dp_sp[i] if dp_sp is not None else None
        dp_t = dp_tp[i] if dp_tp is not None else None
        x = block(params[f"ste_block_{i}"], x, True, t, dp_s)
        x = _layernorm(params["spatial_norm"], x, 1e-6)
        if i == 0:
            x = x + params["temporal_pos_embed"][0][None, :, None].astype(x.dtype)
        x = block(params[f"tte_block_{i}"], x, False, t, dp_t)
        x = _layernorm(params["temporal_norm"], x, 1e-6)

    if mode == "s2f":
        w = params["weighted_mean_kernel"].astype(x.dtype)
        wb = params["weighted_mean_bias"].astype(x.dtype)
        x = jnp.einsum("bfpc,f->bpc", x, w)[:, None] + wb
    x = _layernorm(params["head_norm"], x, 1e-5)
    return _dense(params["head"], x)


FastTrainCfg = collections.namedtuple(
    "FastTrainCfg",
    "num_frame num_joints depth num_heads with_time_emb mode dtype_name"
    " temporal_mode ckpt_blocks attn_bwd",
    # ckpt_blocks: per-block checkpoint of the XLA-recompute backward
    # (see xla_forward_denoise). Default False = round-3 behavior (the
    # backward vjps the monolithic mirror).
    # attn_bwd: the mirror's attention runs through the custom-VJP
    # grand_attention_trainable (flash-style Pallas backward) instead of
    # the einsum path (_xla_block fused_attn_bwd).
    defaults=(False, False),
)


def _cfg_dtype(cfg):
    return jnp.bfloat16 if cfg.dtype_name == "bfloat16" else jnp.float32


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fast_forward_denoise_train(params, x, time, dp_scales, cfg: FastTrainCfg):
    """Differentiable fused-kernel forward for TRAINING.

    Forward = the Pallas fused-block pipeline (fast_forward_denoise) with
    per-sample drop-path scales; backward = jax.vjp of the pure-XLA mirror
    (xla_forward_denoise) recomputed from the saved inputs — i.e. remat
    where the stored forward pass is the fast one. Gradients are exactly
    those of the XLA function (they differ from the kernel forward only by
    floating-point rounding).
    """
    return fast_forward_denoise(
        params, x, time, num_frame=cfg.num_frame, num_joints=cfg.num_joints,
        depth=cfg.depth, num_heads=cfg.num_heads,
        with_time_emb=cfg.with_time_emb, mode=cfg.mode, dtype=_cfg_dtype(cfg),
        temporal_mode=cfg.temporal_mode, dp_scales=dp_scales,
    )


def _fftrain_fwd(params, x, time, dp_scales, cfg):
    out = fast_forward_denoise_train(params, x, time, dp_scales, cfg)
    return out, (params, x, time, dp_scales)


def _fftrain_bwd(cfg, res, g):
    params, x, time, dp_scales = res

    def ref_fn(p, xx, tt):
        return xla_forward_denoise(
            p, xx, tt, num_frame=cfg.num_frame, num_joints=cfg.num_joints,
            depth=cfg.depth, num_heads=cfg.num_heads,
            with_time_emb=cfg.with_time_emb, mode=cfg.mode,
            dtype=_cfg_dtype(cfg), dp_scales=dp_scales,
            checkpoint_blocks=getattr(cfg, "ckpt_blocks", False),
            fused_attn_bwd=getattr(cfg, "attn_bwd", False),
        )

    _, vjp = jax.vjp(ref_fn, params, x, time)
    d_params, d_x, d_time = vjp(g)
    # dp_scales is a sampled mask, not a learnable input.
    return d_params, d_x, d_time, jax.tree.map(jnp.zeros_like, dp_scales)


fast_forward_denoise_train.defvjp(_fftrain_fwd, _fftrain_bwd)


# ----------------------------------------------------------------------
# Pair-boundary custom VJP: fused forward per (spatial, temporal) block
# pair; backward recomputes ONLY that pair through the XLA mirror from the
# stored pair-input boundary.
#
# Why (train-roofline round 4, PERF.md): the monolithic custom VJP above
# vjps the WHOLE XLA mirror, so its backward materialises every
# intermediate of a full forward at once (OOM beyond b8 f32 / b16 bf16 at
# 243f); the ckpt_blocks escape hatch bounds memory but executes a 5th
# forward (fused fwd + checkpoint fwd + per-block recompute + 2x bwd).
# Putting the custom-VJP boundary at each PAIR keeps the fused forward's
# speed AND flaxblk-like memory (8 stored [rows, C] boundaries + one
# pair's vjp working set) at the monolithic path's 4x-forward FLOPs —
# it dominates both.
# ----------------------------------------------------------------------

PairCfg = collections.namedtuple(
    "PairCfg", "b f p c f8 heads dtype_name temporal_mode interpret attn_bwd",
    defaults=(False,),
)


def _pair_dtype(cfg):
    return jnp.bfloat16 if cfg.dtype_name == "bfloat16" else jnp.float32


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_pair(cfg: PairCfg, pp, x_flat, t, dp_s, dp_t):
    """One (spatial, temporal) block pair on the flat padded trunk buffer.

    pp: {"ste", "tte", "spatial_norm", "temporal_norm"[, "temporal_pos_embed"]}
    x_flat [B*F8*J, C] spatial-major; t [B, C] diffusion-time embedding
    (ignored when the blocks have no time_proj); dp_s [B, F, 2] /
    dp_t [B, J, 2] per-group drop-path scales.

    Semantics match one iteration of fast_forward_denoise's trunk loop:
    pad frames (f8 > f) are garbage that never leaks into real rows
    (spatial pad-groups attend among themselves; temporal kernels mask
    keys >= F), which is what makes the unpadded per-pair backward below
    exact.
    """
    b, f, p, c, f8 = cfg.b, cfg.f, cfg.p, cfg.c, cfg.f8
    dtype = _pair_dtype(cfg)
    rows_item = f8 * p
    interpret = cfg.interpret

    def t_rows_for(bp):
        if "time_proj" not in bp:
            return None
        return _dense(bp["time_proj"], jax.nn.silu(t).astype(dtype))

    dp_s_rows = None
    if dp_s is not None:
        d = dp_s
        if f8 != f:
            d = jnp.pad(d, ((0, 0), (0, f8 - f), (0, 0)))
        dp_s_rows = jnp.broadcast_to(
            d[:, :, None, :], (b, f8, p, 2)
        ).reshape(b * rows_item, 2)

    x_flat = fused_transformer_block(
        x_flat, pp["ste"], n=p, heads=cfg.heads, interpret=interpret,
        out_ln_params=pp["spatial_norm"], t_rows=t_rows_for(pp["ste"]),
        rows_per_item=rows_item, dp_scales=dp_s_rows,
    )
    if "temporal_pos_embed" in pp:
        x4 = x_flat.reshape(b, f8, p, c)
        x4 = x4.at[:, :f].add(
            pp["temporal_pos_embed"][0][None, :, None].astype(x4.dtype)
        )
        x_flat = x4.reshape(b * rows_item, c)

    t_it = t_rows_for(pp["tte"])
    if cfg.temporal_mode == "cols":
        dp_t_g = dp_t.reshape(b * p, 2) if dp_t is not None else None
        x_cols = fused_temporal_block_cols(
            x_flat.reshape(b * f8, p * c), pp["tte"], n=f, f8=f8, j_groups=p,
            heads=cfg.heads, interpret=interpret, t_rows=t_it,
            out_ln_params=pp["temporal_norm"], dp_scales=dp_t_g,
        )
        return x_cols.reshape(b * rows_item, c)
    dp_t_rows = None
    if dp_t is not None:
        dp_t_rows = jnp.broadcast_to(
            dp_t[:, :, None, :], (b, p, f8, 2)
        ).reshape(b * rows_item, 2)
    x_t = jnp.transpose(x_flat.reshape(b, f8, p, c), (0, 2, 1, 3))
    x_t = x_t.reshape(b * rows_item, c)
    x_t = fused_transformer_block(
        x_t, pp["tte"], n=f, heads=cfg.heads, interpret=interpret,
        out_ln_params=pp["temporal_norm"], t_rows=t_it,
        rows_per_item=rows_item, pre_padded_n8=f8, dp_scales=dp_t_rows,
    )
    return jnp.transpose(
        x_t.reshape(b, p, f8, c), (0, 2, 1, 3)
    ).reshape(b * rows_item, c)


def _xla_pair(cfg: PairCfg, pp, x4, t, dp_s, dp_t):
    """Differentiable XLA mirror of _fused_pair on the UNPADDED [B,F,J,C]
    view — exactly two _xla_block calls plus the pair's out-LNs (and the
    first pair's temporal positional embedding)."""
    dtype = _pair_dtype(cfg)
    ab = getattr(cfg, "attn_bwd", False)
    x4 = _xla_block(pp["ste"], x4, True, t, dp_s, cfg.heads, dtype,
                    fused_attn_bwd=ab)
    x4 = _layernorm(pp["spatial_norm"], x4, 1e-6)
    if "temporal_pos_embed" in pp:
        x4 = x4 + pp["temporal_pos_embed"][0][None, :, None].astype(x4.dtype)
    x4 = _xla_block(pp["tte"], x4, False, t, dp_t, cfg.heads, dtype,
                    fused_attn_bwd=ab)
    return _layernorm(pp["temporal_norm"], x4, 1e-6)


def _fused_pair_fwd(cfg, pp, x_flat, t, dp_s, dp_t):
    out = _fused_pair(cfg, pp, x_flat, t, dp_s, dp_t)
    return out, (pp, x_flat, t, dp_s, dp_t)


def _fused_pair_bwd(cfg, res, g):
    pp, x_flat, t, dp_s, dp_t = res
    b, f, p, c, f8 = cfg.b, cfg.f, cfg.p, cfg.c, cfg.f8
    # Real rows of the pair's output never depend on pad rows of its input
    # (pad frames are self-contained spatial groups; temporal attention
    # masks keys >= F), and downstream consumers send zero cotangent into
    # pad rows (the epilogue slices [:, :f]; the next pair's bwd re-pads
    # with zeros below) — so the gradient through the UNPADDED mirror is
    # the exact gradient of the padded fused forward.
    x4 = x_flat.reshape(b, f8, p, c)[:, :f]
    g4 = g.reshape(b, f8, p, c)[:, :f]

    def fn(pp_, x4_, t_):
        return _xla_pair(cfg, pp_, x4_, t_, dp_s, dp_t)

    _, vjp = jax.vjp(fn, pp, x4, t)
    d_pp, d_x4, d_t = vjp(g4)
    d_x = (
        jnp.zeros((b, f8, p, c), d_x4.dtype).at[:, :f].set(d_x4)
        .reshape(b * f8 * p, c)
    )
    none_like = lambda a: None if a is None else jnp.zeros_like(a)
    return d_pp, d_x, d_t, none_like(dp_s), none_like(dp_t)


_fused_pair.defvjp(_fused_pair_fwd, _fused_pair_bwd)


def fast_forward_denoise_train_pairs(params, x, time, dp_scales, cfg: FastTrainCfg):
    """TRAINING forward with pair-boundary custom VJP (see block comment
    above): the fused-kernel forward of fast_forward_denoise, but each
    (spatial, temporal) block pair is its own custom-VJP unit whose
    backward recomputes just that pair through _xla_pair. Same gradients
    as fast_forward_denoise_train up to rounding; memory bounded by pair
    boundaries instead of the whole mirror."""
    dtype = _cfg_dtype(cfg)
    interpret = jax.default_backend() != "tpu"
    b, f, p, _ = x.shape
    c = params["fusion_layer"]["kernel"].shape[-1]

    x = _dense(params["fusion_layer"], x.astype(dtype))
    if cfg.with_time_emb:
        t = sinusoidal_pos_emb(time, c)
        t = _dense(params["time_mlp_1"], t.astype(dtype))
        t = jax.nn.gelu(t, approximate=False)
        t = _dense(params["time_mlp_2"], t)  # [B, C]
    else:
        t = jnp.zeros((b, c), dtype)  # unused: blocks have no time_proj

    x = x + params["spatial_pos_embed"][0][None, None].astype(x.dtype)
    f8 = ((f + 7) // 8) * 8
    if f8 != f:
        x = jnp.pad(x, ((0, 0), (0, f8 - f), (0, 0), (0, 0)))
    x_flat = x.reshape(b * f8 * p, c)

    dp_sp, dp_tp = dp_scales if dp_scales is not None else (None, None)
    pcfg = PairCfg(
        b=b, f=f, p=p, c=c, f8=f8, heads=cfg.num_heads,
        dtype_name=cfg.dtype_name, temporal_mode=cfg.temporal_mode,
        interpret=interpret, attn_bwd=getattr(cfg, "attn_bwd", False),
    )
    for i in range(cfg.depth):
        pp = {
            "ste": params[f"ste_block_{i}"],
            "tte": params[f"tte_block_{i}"],
            "spatial_norm": params["spatial_norm"],
            "temporal_norm": params["temporal_norm"],
        }
        if i == 0:
            pp["temporal_pos_embed"] = params["temporal_pos_embed"]
        x_flat = _fused_pair(
            pcfg, pp, x_flat, t,
            dp_sp[i] if dp_sp is not None else None,
            dp_tp[i] if dp_tp is not None else None,
        )

    x = x_flat.reshape(b, f8, p, c)[:, :f]
    if cfg.mode == "s2f":
        w = params["weighted_mean_kernel"].astype(x.dtype)
        wb = params["weighted_mean_bias"].astype(x.dtype)
        x = jnp.einsum("bfpc,f->bpc", x, w)[:, None] + wb
    x = _layernorm(params["head_norm"], x, 1e-5)
    return _dense(params["head"], x)


def draw_drop_path_scales(
    key, batch: int, depth: int, drop_path_rate: float,
    num_frame: int, num_joints: int,
):
    """(dp_spatial [depth, B, F, 2], dp_temporal [depth, B, J, 2]) drop-path
    scales matching flax DropPath semantics: rate for block pair i =
    linspace(0, drop_path_rate, depth)[i]; one independent Bernoulli(keep)
    draw per attention GROUP and residual branch — (sample, frame) for
    spatial blocks, (sample, joint) for temporal blocks, exactly the
    (tokens.shape[0], 1, 1) mask the flax module draws over the reshaped
    (b*f, p, c) / (b*p, f, c) token batches (models/mixste.py DropPath;
    reference timm DropPath in model_..._s2s...py:90-135) — scaled 1/keep
    when kept."""
    import numpy as np

    rates = np.linspace(0.0, drop_path_rate, depth)
    keep = jnp.asarray(1.0 - rates, jnp.float32)  # [depth]
    k = keep[:, None, None, None]
    k_sp, k_tp = jax.random.split(key)
    u_sp = jax.random.uniform(k_sp, (depth, batch, num_frame, 2))
    u_tp = jax.random.uniform(k_tp, (depth, batch, num_joints, 2))
    return (
        jnp.where(u_sp < k, 1.0 / k, 0.0),
        jnp.where(u_tp < k, 1.0 / k, 0.0),
    )
