"""Fused attention sub-block kernel: LN -> qkv -> GRAND attention -> proj
-> residual, entirely in VMEM.

Motivation (PERF.md "In-graph cost attribution"): kernel-only swaps of the
attention core lose to XLA because of layout round-trips; the win requires
fusing the surrounding ops so tokens make ONE HBM round trip per sub-block.
This kernel implements the eval path of Block's attention residual:

    out = x + proj(grand_attn(LN1(x)))

on flat rows [R, C] where every N consecutive rows form one attention
group. Weights stay VMEM-resident across grid steps. Eval-only (no VJP);
training uses the regular XLA path.
"""
from __future__ import annotations

import contextlib
import contextvars
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from diff3dhpe_tpu.ops.attention import grand_attend_tile


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (max abs error 1.5e-7) — Mosaic has
    no erf/erfc lowering, and the model uses torch's EXACT GELU."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return sign * y


def _gelu_exact(x):
    """Exact (erf-based) GELU matching torch.nn.GELU's default."""
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + _erf(xf * np.float32(1.0 / np.sqrt(2.0))))).astype(x.dtype)


_F32_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,   # 1 bf16 MXU pass
    "highest": jax.lax.Precision.HIGHEST,   # exact f32 (multi-pass)
}  # NOTE: Mosaic rejects Precision.HIGH ("Unsupported dot precision") —
# the 3-pass middle ground is implemented manually instead ("high3",
# _dot_f32_3pass): Precision.HIGH would be the natural spelling, but the
# explicit hi/lo bf16 split is the only form Mosaic accepts.


_f32_prec_override: contextvars.ContextVar = contextvars.ContextVar(
    "diff_fused_f32_prec_override", default=None
)


@contextlib.contextmanager
def f32_precision_scope(prec):
    """Trace-time override of the f32 contraction mode for the fused kernels.

    ``prec`` in {None, "default", "highest"}; None = no-op (fall back to the
    DIFF_FUSED_F32_PREC env). Precision is baked into the traced program, so
    wrapping a forward call at trace time pins that call's numerics
    per-callable — e.g. a mixed eval can run its bf16 trunk steps normally
    and its final f32 DDIM step at HIGHEST, independent of the process env
    (scripts/accuracy_study.py ``fast_mixed1_hx``)."""
    if prec is None:
        yield
        return
    token = _f32_prec_override.set(prec)
    try:
        yield
    finally:
        _f32_prec_override.reset(token)


def f32_contract_mode() -> str:
    """f32 contraction mode name for the fused kernels, in
    {"default", "highest", "high3"}.

    Overridable via f32_precision_scope (per-call, wins) or the
    DIFF_FUSED_F32_PREC env (process-wide), both read at trace time. The
    accuracy study (scripts/accuracy_study.py) measures each mode's
    deviation from the flax parity path on trained weights; see PERF.md
    for the measured accuracy/throughput trade."""
    return (_f32_prec_override.get()
            or os.environ.get("DIFF_FUSED_F32_PREC", "default"))


def f32_contract_precision():
    """lax.Precision for the current f32 contraction mode ("high3" has no
    lax spelling — callers that can hit it must branch on
    f32_contract_mode() instead)."""
    return _F32_PRECISIONS[f32_contract_mode()]


def gemm_storage_dtype(x_dtype):
    """Storage dtype for the GEMM-side tensors (weights, qkv, attention and
    MLP intermediates) inside the fused kernels.

    For f32 activations under the DEFAULT contraction mode, the MXU
    truncates matmul operands to bf16 anyway — so storing the GEMM-side
    tensors in bf16 is near-identical math while halving their VMEM/HBM
    footprint; the RESIDUAL STREAM (block inputs/outputs, h1) stays f32.
    MEASURED NOT TO PAY on the eval protocol (15.0/14.3 vs 15.8/14.7 seq/s
    at B=2/4 — the extra per-tile casts and the VMEM-budget haircut for
    the double-width row blocks outweigh the footprint savings; the f32
    path is not bandwidth-bound). Kept as an opt-in experiment:
    DIFF_FUSED_F32_STORE=bf16, TPU only (on CPU the default contract is
    exact f32, so the cast would change semantics and break the
    interpret-mode parity tests)."""
    if (x_dtype == jnp.float32
            and f32_contract_mode() == "default"
            and os.environ.get("DIFF_FUSED_F32_STORE", "f32") == "bf16"
            and jax.default_backend() == "tpu"):
        return jnp.bfloat16
    return x_dtype


def _dot_f32_3pass(a, b, dims):
    """bf16x3 contraction of f32 operands: split each into hi + lo bf16
    halves and accumulate the three significant cross terms
    (hi·hi + hi·lo + lo·hi) in f32 — ~16 effective mantissa bits at 3 MXU
    passes, vs 8 bits at 1 pass (DEFAULT) and exact f32 at 6 (HIGHEST).
    The dropped lo·lo term is O(2^-16) relative. This is lax
    Precision.HIGH's algorithm spelled out by hand, because Mosaic rejects
    the enum ("Unsupported dot precision")."""
    a_hi = a.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)


def _dot_f32(a, b, dims):
    """dot_general with f32 accumulation and the contraction precision
    pinned per operand dtype: bf16 operands contract in bf16 (DEFAULT —
    a global jax_default_matmul_precision=highest would otherwise force an
    fp32 contract, which Mosaic rejects: 'Bad lhs type'); f32 operands use
    the f32_contract_mode() so the global flag cannot silently change the
    fused path's numerics in either direction."""
    if a.dtype != jnp.bfloat16:
        mode = f32_contract_mode()
        if mode == "high3":
            return _dot_f32_3pass(a, b, dims)
        prec = _F32_PRECISIONS[mode]
    else:
        prec = jax.lax.Precision.DEFAULT
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


def _grand_attend(q, k, v, scale, mask):
    """One head's GRAND attention tile: softmax(q k^T * scale [+ mask]) @ v
    - v, f32 accumulation. Shared by every fused-block kernel; the
    dtype-tuned epilogue itself (and the DIFF_FUSED_ABLATE_SOFTMAX probe)
    lives ONCE in attention.grand_attend_tile — here it contracts through
    _dot_f32, which pins the DIFF_FUSED_F32_PREC precision."""
    return grand_attend_tile(q, k, v, scale, mask, _dot_f32)

def _layernorm_rows(x, scale, bias, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32) + bias.astype(
        jnp.float32
    )


def _fused_attn_block_kernel(
    x_ref, ln_s_ref, ln_b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, o_ref,
    *, n, heads, scale, tile_rows, tiles,
):
    c = x_ref.shape[-1]
    d = c // heads
    p = tile_rows // n

    mask = None
    if p > 1:
        row_g = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, tile_rows), 0) // n
        col_g = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, tile_rows), 1) // n
        mask = jnp.where(row_g == col_g, 0.0, -1e30).astype(jnp.float32)

    ln_s = ln_s_ref[...].reshape(c)
    ln_b = ln_b_ref[...].reshape(c)
    bqkv = bqkv_ref[...].reshape(3 * c)
    bproj = bproj_ref[...].reshape(c)

    for t in range(tiles):
        rows = slice(t * tile_rows, (t + 1) * tile_rows)
        xs = x_ref[rows, :]
        xn = _layernorm_rows(xs, ln_s, ln_b).astype(xs.dtype)
        qkv = (
            _dot_f32(
            xn, wqkv_ref[...], ((1,), (0,)),
        )
            + bqkv.astype(jnp.float32)
        ).astype(xs.dtype)

        head_outs = []
        for h in range(heads):
            q = qkv[:, h * d:(h + 1) * d]
            k = qkv[:, c + h * d: c + (h + 1) * d]
            v = qkv[:, 2 * c + h * d: 2 * c + (h + 1) * d]
            head_outs.append(_grand_attend(q, k, v, scale, mask))
        attn_out = jnp.concatenate(head_outs, axis=-1).astype(xs.dtype)

        proj = (
            _dot_f32(
            attn_out, wproj_ref[...], ((1,), (0,)),
        )
            + bproj.astype(jnp.float32)
        )
        o_ref[rows, :] = (xs.astype(jnp.float32) + proj).astype(o_ref.dtype)


def _fused_full_block_kernel(
    x_ref, *refs,
    n, n8, heads, scale, tile_rows, tiles, out_ln, has_t, has_dp, rows_per_item,
    cdt,
):
    """Whole transformer block per tile: attention residual + MLP residual,
    optionally followed by the model's inter-block LayerNorm (the
    Spatial_norm/Temporal_norm applied after every block, reference
    ST_foward:236,245) fused into the output write.

    ``has_t``: the per-block diffusion-time embedding add (x += t[batch]) is
    fused into the load — t_ref is the [B, C] per-batch embedding and each
    row selects its batch row via a one-hot matmul on row_index //
    rows_per_item (padding rows map past B and get zero). This removes one
    full HBM round trip per block that XLA cannot fuse into a custom call.

    ``has_dp``: drop-path (stochastic depth) training support — dp_ref is a
    PER-ROW [step_rows, 128] block riding the same grid as x (attention-
    branch scale in column 0, MLP-branch scale in column 1, each 0 or
    1/keep_prob). The caller materialises one row per token row, so any
    granularity — per sample, or flax DropPath's per (sample, frame) /
    (sample, joint) row-group draws — is expressible.

    t_ref/dp_ref are passed ONLY when has_t/has_dp (an unused input still
    costs a per-call VMEM fetch, measured on the eval hot path).
    """
    import jax.experimental.pallas as pl

    it = iter(refs)
    t_ref = next(it) if has_t else None
    dp_ref = next(it) if has_dp else None
    (ln_s_ref, ln_b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
     ln2_s_ref, ln2_b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
     oln_s_ref, oln_b_ref, o_ref) = it

    c = x_ref.shape[-1]
    d = c // heads
    p = tile_rows // n8
    row0 = pl.program_id(0) * (tile_rows * tiles)

    def batch_rows(ref, first_row, rows):
        """(rows, ref.cols) f32: ref[batch_of_row], zeros past the batch."""
        b = ref.shape[0]
        r = jax.lax.broadcasted_iota(jnp.int32, (rows, b), 0) + first_row
        bidx = r // rows_per_item
        onehot = (
            bidx == jax.lax.broadcasted_iota(jnp.int32, (rows, b), 1)
        ).astype(jnp.float32)
        return _dot_f32(
            onehot, ref[...].astype(jnp.float32), ((1,), (0,)),
        )

    def time_rows(first_row, rows):
        return batch_rows(t_ref, first_row, rows)

    def dp_rows(rows):
        """((rows, 1), (rows, 1)) f32 drop-path scales for the two branches.
        dp_ref rides the row grid, so this is a plain slice (rows is a slice
        into the step's rows, NOT a global row index)."""
        dp = dp_ref[rows, :]
        return dp[:, 0:1], dp[:, 1:2]

    # Groups occupy n8 >= n rows per tile (n8 > n when groups were padded to
    # an 8-row multiple); mask keeps softmax within each group's REAL rows.
    mask = None
    if p > 1 or n8 != n:
        row_g = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, tile_rows), 0) // n8
        col_g = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, tile_rows), 1) // n8
        allowed = row_g == col_g
        if n8 != n:
            col_in = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, tile_rows), 1) % n8
            allowed = allowed & (col_in < n)
        mask = jnp.where(allowed, 0.0, -1e30).astype(jnp.float32)

    ln_s = ln_s_ref[...].reshape(c)
    ln_b = ln_b_ref[...].reshape(c)
    bqkv = bqkv_ref[...].reshape(3 * c)
    bproj = bproj_ref[...].reshape(c)
    ln2_s = ln2_s_ref[...].reshape(c)
    ln2_b = ln2_b_ref[...].reshape(c)
    hidden = w1_ref.shape[-1]
    b1 = b1_ref[...].reshape(hidden)
    b2 = b2_ref[...].reshape(c)
    if out_ln:
        oln_s = oln_s_ref[...].reshape(c)
        oln_b = oln_b_ref[...].reshape(c)

    def dot(a, w):
        return _dot_f32(
            a, w, ((1,), (0,)),
        )

    def attend_tile(qkv):
        # Per-head Python loop. A batched-dot variant (all heads in one
        # dot_general pair over a (heads, tile, d) layout) fails to
        # compile: Mosaic cannot split the lane dim in-register
        # ((tile, C) -> (tile, heads, d) reshape = "unsupported shape
        # cast"), and producing the (heads, ...) layout upstream would
        # fragment the hoisted qkv GEMM. See PERF.md round-2 lever notes.
        head_outs = []
        for h in range(heads):
            q = qkv[:, h * d:(h + 1) * d]
            k = qkv[:, c + h * d: c + (h + 1) * d]
            v = qkv[:, 2 * c + h * d: 2 * c + (h + 1) * d]
            head_outs.append(_grand_attend(q, k, v, scale, mask))
        return jnp.concatenate(head_outs, axis=-1)

    def mlp_residual(xs, attn_out, s_attn=None, s_mlp=None):
        attn_branch = dot(attn_out, wproj_ref[...]) + bproj.astype(jnp.float32)
        if s_attn is not None:
            attn_branch = attn_branch * s_attn
        # h1 is the residual stream: keep it at the ACTIVATION dtype even
        # when the GEMM-side tensors are stored in cdt=bf16.
        h1 = (xs.astype(jnp.float32) + attn_branch).astype(xs.dtype)
        hn = _layernorm_rows(h1, ln2_s, ln2_b).astype(cdt)
        mid = dot(hn, w1_ref[...]) + b1.astype(jnp.float32)
        mid = _gelu_exact(mid).astype(cdt)
        mlp_branch = dot(mid, w2_ref[...]) + b2.astype(jnp.float32)
        if s_mlp is not None:
            mlp_branch = mlp_branch * s_mlp
        out = h1.astype(jnp.float32) + mlp_branch
        if out_ln:
            out = _layernorm_rows(out.astype(xs.dtype), oln_s, oln_b)
        return out

    step_rows = tile_rows * tiles
    # Hoist when the step-wide qkv buffer fits comfortably in VMEM.
    qkv_bytes = step_rows * 3 * c * jnp.dtype(cdt).itemsize
    if step_rows <= 1024 and qkv_bytes <= 6_400_000:
        # Hoist the step-wide GEMMs (one M=step_rows MXU call each, less
        # M-padding waste); only the attention runs per 128-row tile.
        xs_all = x_ref[...]
        if has_t:
            xs_all = (
                xs_all.astype(jnp.float32) + time_rows(row0, step_rows)
            ).astype(xs_all.dtype)
        s_attn, s_mlp = dp_rows(slice(None)) if has_dp else (None, None)
        xn_all = _layernorm_rows(xs_all, ln_s, ln_b).astype(cdt)
        qkv_all = (dot(xn_all, wqkv_ref[...]) + bqkv.astype(jnp.float32)).astype(cdt)
        attn_out = jnp.concatenate(
            [attend_tile(qkv_all[t * tile_rows:(t + 1) * tile_rows, :]) for t in range(tiles)],
            axis=0,
        ).astype(cdt)
        o_ref[...] = mlp_residual(xs_all, attn_out, s_attn, s_mlp).astype(o_ref.dtype)
    else:
        # Long-sequence tiles: step-wide buffers would exceed VMEM; keep the
        # whole block per tile.
        for t in range(tiles):
            rows = slice(t * tile_rows, (t + 1) * tile_rows)
            xs = x_ref[rows, :]
            if has_t:
                xs = (
                    xs.astype(jnp.float32) + time_rows(row0 + t * tile_rows, tile_rows)
                ).astype(xs.dtype)
            s_attn, s_mlp = dp_rows(rows) if has_dp else (None, None)
            xn = _layernorm_rows(xs, ln_s, ln_b).astype(cdt)
            qkv = (dot(xn, wqkv_ref[...]) + bqkv.astype(jnp.float32)).astype(cdt)
            attn_out = attend_tile(qkv).astype(cdt)
            o_ref[rows, :] = mlp_residual(xs, attn_out, s_attn, s_mlp).astype(o_ref.dtype)


def fused_transformer_block(
    x, block_params: dict, n: int, heads: int, scale=None, interpret=None,
    tiles_per_step: int = 8, out_ln_params: dict = None,
    t_rows=None, rows_per_item: int = None, pre_padded_n8: int = None,
    dp_scales=None,
):
    """Whole transformer block (attention residual + MLP residual) fused.

    x: [R, C] flat tokens (groups of N consecutive rows); ``block_params``
    is one ste/tte block's param subtree (norm1/attn/norm2/mlp).
    ``out_ln_params`` optionally fuses the model's inter-block LayerNorm
    (scale/bias dict) into the output write, saving one HBM round trip per
    block. ``t_rows`` [B, C] optionally fuses the per-block diffusion-time
    embedding add (row i of x belongs to batch i // rows_per_item).
    ``pre_padded_n8``: the caller's groups are ALREADY padded to this many
    rows (only the first n real; pad rows' outputs are garbage and stay in
    the pad slots) — skips the kernel's own pad/unpad round trip.
    ``dp_scales`` [R, 2] f32 optionally applies PER-ROW drop-path scales
    (attention branch, MLP branch) for stochastic-depth training — one row
    per token row of x, so the caller controls the granularity (flax
    DropPath draws per attention GROUP: per (sample, frame) for spatial
    blocks, per (sample, joint) for temporal blocks — models/mixste.py
    DropPath over the reshaped token batch)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    r, c = x.shape
    d = c // heads
    if scale is None:
        scale = d ** -0.5

    itemsize = jnp.dtype(x.dtype).itemsize

    has_dp = dp_scales is not None
    if has_dp:
        assert dp_scales.shape == (r, 2), (dp_scales.shape, r)

    n8 = n
    if pre_padded_n8 is not None:
        assert pre_padded_n8 % 8 == 0 and r % pre_padded_n8 == 0
        n8 = pre_padded_n8
        r_pad = r
        if rows_per_item is not None:
            assert rows_per_item % n8 == 0
    # Pad each group to an 8-row multiple when that unlocks smaller grid
    # steps under Mosaic's block-divisibility rule: always for long
    # sequences (hoisted-GEMM path), and for small groups too at f32, where
    # bf16's VMEM budget would otherwise be exceeded.
    elif n % 8 and (n > 64 or itemsize >= 4):
        n8 = ((n + 7) // 8) * 8
        g = r // n
        x = jnp.pad(x.reshape(g, n, c), ((0, 0), (0, n8 - n), (0, 0))).reshape(g * n8, c)
        if has_dp:
            dp_scales = jnp.pad(
                dp_scales.reshape(g, n, 2), ((0, 0), (0, n8 - n), (0, 0))
            ).reshape(g * n8, 2)
        r_pad = g * n8
        if rows_per_item is not None:
            assert rows_per_item % n == 0
            rows_per_item = (rows_per_item // n) * n8
    else:
        r_pad = r

    has_t = t_rows is not None
    if not has_t:
        rows_per_item = r_pad if rows_per_item is None else rows_per_item
    assert rows_per_item is not None

    cdt = gemm_storage_dtype(x.dtype)
    cdt_itemsize = jnp.dtype(cdt).itemsize

    p = max(1, 128 // n8) if n8 <= 64 else 1
    tile_rows = p * n8
    # VMEM budget: keep the step's qkv buffer around ~3 MB (the weights are
    # resident: ~4 MB bf16 / ~8 MB f32). Drop-path training adds a
    # step-wide [rows, 128] f32 one-hot product (~0.5 MB at 1000 rows),
    # which tipped the bf16 sizing over the 16 MB scoped-vmem limit —
    # shrink the budget accordingly. The mixed mode (f32 rows + bf16
    # GEMM-side storage) carries double-width row blocks next to the bf16
    # buffers, so it also gets a haircut.
    mixed = cdt_itemsize != itemsize
    # DIFF_FUSED_F32_PREC=highest expands every f32 contraction into 6 bf16
    # MXU passes whose operand splits need extra kernel stack; combined with
    # the round-3 deferred-norm f32 epilogue (e and its row-sum stay live
    # across the AV dot) the default sizing tips ~0.2 MB over the 16 MB
    # scoped-vmem limit — shave the step budget for that mode.
    f32_hi = (x.dtype == jnp.float32
              and f32_contract_mode() in ("highest", "high3"))
    budget_bytes = (3_100_000 - (700_000 if has_dp else 0)
                    - (800_000 if mixed else 0) - (500_000 if f32_hi else 0))
    budget_rows = max(tile_rows, (budget_bytes // (3 * c * cdt_itemsize)) // 8 * 8 or tile_rows)
    tiles = tiles_per_step
    while tile_rows * tiles > budget_rows and tiles > 1:
        tiles -= 1
    while (tile_rows * tiles) % 8:
        tiles += 1
    step_rows = tile_rows * tiles
    r2 = ((r_pad + step_rows - 1) // step_rows) * step_rows
    x_p = jnp.pad(x, ((0, r2 - r_pad), (0, 0))) if r2 != r_pad else x

    attn = block_params["attn"]
    mlp = block_params["mlp"]
    hidden = mlp["fc1"]["kernel"].shape[-1]

    def bias_of(layer, size):
        """Layer bias, or zeros when the layer was built without one
        (e.g. MixSTEDenoiser(qkv_bias=False))."""
        b = layer.get("bias")
        return jnp.zeros((size,), x.dtype) if b is None else b

    out_ln = out_ln_params is not None
    if out_ln:
        oln_s = out_ln_params["scale"].reshape(1, c)
        oln_b = out_ln_params["bias"].reshape(1, c)
    else:  # dummies (ignored by the kernel)
        oln_s = jnp.zeros((1, c), x.dtype)
        oln_b = jnp.zeros((1, c), x.dtype)

    row_spec = pl.BlockSpec((step_rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    opt_inputs, opt_specs = [], []
    if has_t:
        opt_inputs.append(t_rows.astype(x.dtype))
        opt_specs.append(full(*t_rows.shape))
    if has_dp:
        # Per-row scales ride the row grid: pad rows to r2 like x, widen the
        # 2 branch columns to a 128-lane block (cols 2.. are zero, unread).
        dp_pad = jnp.pad(
            dp_scales.astype(jnp.float32), ((0, r2 - r_pad), (0, 126))
        )
        opt_inputs.append(dp_pad)
        opt_specs.append(
            pl.BlockSpec((step_rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
    out = pl.pallas_call(
        functools.partial(
            _fused_full_block_kernel, n=n, n8=n8, heads=heads, scale=scale,
            tile_rows=tile_rows, tiles=tiles, out_ln=out_ln,
            has_t=has_t, has_dp=has_dp, rows_per_item=rows_per_item,
            cdt=cdt,
        ),
        grid=(r2 // step_rows,),
        in_specs=[
            row_spec,
            *opt_specs,
            full(1, c), full(1, c),
            full(c, 3 * c), full(1, 3 * c),
            full(c, c), full(1, c),
            full(1, c), full(1, c),
            full(c, hidden), full(1, hidden),
            full(hidden, c), full(1, c),
            full(1, c), full(1, c),
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((r2, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * r2 * c * (3 * c + c + 2 * hidden) + 2 * 2 * r2 * n * c,
            bytes_accessed=2 * r2 * c * x.dtype.itemsize,
            transcendentals=r2 * (n + hidden),
        ),
        interpret=interpret,
    )(
        x_p,
        *opt_inputs,
        block_params["norm1"]["scale"].reshape(1, c),
        block_params["norm1"]["bias"].reshape(1, c),
        attn["qkv"]["kernel"].astype(cdt),
        bias_of(attn["qkv"], 3 * c).reshape(1, 3 * c),
        attn["proj"]["kernel"].astype(cdt),
        bias_of(attn["proj"], c).reshape(1, c),
        block_params["norm2"]["scale"].reshape(1, c),
        block_params["norm2"]["bias"].reshape(1, c),
        mlp["fc1"]["kernel"].astype(cdt),
        bias_of(mlp["fc1"], hidden).reshape(1, hidden),
        mlp["fc2"]["kernel"].astype(cdt),
        bias_of(mlp["fc2"], c).reshape(1, c),
        oln_s, oln_b,
    )
    out = out[:r_pad] if r2 != r_pad else out
    if n8 != n and pre_padded_n8 is None:
        g = r // n
        out = out.reshape(g, n8, c)[:, :n, :].reshape(r, c)
    return out


def fused_attention_block(
    x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj,
    n: int, heads: int, scale=None, interpret=None, tiles_per_step: int = 8,
):
    """x: [R, C] flat tokens (groups of N consecutive rows); returns
    x + proj(grand_attn(LN(x))) with everything fused in VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    r, c = x.shape
    d = c // heads
    if scale is None:
        scale = d ** -0.5

    if n <= 64:
        p = max(1, 128 // n)
    else:
        p = 1
    tile_rows = p * n
    tiles = tiles_per_step
    while (tile_rows * tiles) % 8:
        tiles += 1
    step_rows = tile_rows * tiles
    r2 = ((r + step_rows - 1) // step_rows) * step_rows
    x_p = jnp.pad(x, ((0, r2 - r), (0, 0))) if r2 != r else x

    row_spec = pl.BlockSpec((step_rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _fused_attn_block_kernel, n=n, heads=heads, scale=scale,
            tile_rows=tile_rows, tiles=tiles,
        ),
        grid=(r2 // step_rows,),
        in_specs=[
            row_spec,
            full(1, c), full(1, c),          # LN scale/bias
            full(c, 3 * c), full(1, 3 * c),  # qkv
            full(c, c), full(1, c),          # proj
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((r2, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * r2 * c * (3 * c + c) + 2 * 2 * r2 * n * c,
            bytes_accessed=2 * r2 * c * x.dtype.itemsize,
            transcendentals=r2 * n,
        ),
        interpret=interpret,
    )(
        x_p,
        ln_scale.reshape(1, c), ln_bias.reshape(1, c),
        w_qkv, b_qkv.reshape(1, 3 * c),
        w_proj, b_proj.reshape(1, c),
    )
    return out[:r] if r2 != r else out


def _fused_temporal_group_kernel(
    x_ref, *refs,
    n, heads, scale, out_ln, has_t, has_dp, j_groups,
):
    """Whole transformer block on ONE temporal attention group (F8, C).

    The group arrives via a column-strided BlockSpec straight from the
    spatial-major activation buffer — no transpose, no pre-padding pass.
    Rows n..F8-1 are frame padding: masked out of the softmax as keys; their
    outputs are garbage and sliced off by the caller's epilogue.
    """
    it = iter(refs)
    t_ref = next(it) if has_t else None
    dp_ref = next(it) if has_dp else None
    (ln_s_ref, ln_b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
     ln2_s_ref, ln2_b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
     oln_s_ref, oln_b_ref, o_ref) = it

    c = x_ref.shape[-1]
    d = c // heads
    f8 = x_ref.shape[0]

    import jax.experimental.pallas as pl

    def vec_at(ref, idx):
        """(1, ref.cols) f32: ref[idx] via one-hot matmul (Mosaic forbids
        1-sublane blocks, so a direct dynamic row load is unavailable)."""
        bsz = ref.shape[0]
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (1, bsz), 1) == idx
        ).astype(jnp.float32)
        return _dot_f32(
            onehot, ref[...].astype(jnp.float32), ((1,), (0,)),
        )

    xs = x_ref[...]
    if has_t:
        # t table is per SAMPLE [B, C]: this group's sample is id // j_groups.
        xs = (
            xs.astype(jnp.float32) + vec_at(t_ref, pl.program_id(0) // j_groups)
        ).astype(xs.dtype)
    if has_dp:
        # dp table is per GROUP [B*J, 128] (flax DropPath draws temporal
        # drop-path per (sample, joint) = per attention group).
        dp_vec = vec_at(dp_ref, pl.program_id(0))
        s_attn, s_mlp = dp_vec[0:1, 0:1], dp_vec[0:1, 1:2]
    else:
        s_attn = s_mlp = None

    mask = None
    if f8 != n:
        col = jax.lax.broadcasted_iota(jnp.int32, (f8, f8), 1)
        mask = jnp.where(col < n, 0.0, -1e30).astype(jnp.float32)

    ln_s = ln_s_ref[...].reshape(c)
    ln_b = ln_b_ref[...].reshape(c)
    bqkv = bqkv_ref[...].reshape(3 * c)
    bproj = bproj_ref[...].reshape(c)
    ln2_s = ln2_s_ref[...].reshape(c)
    ln2_b = ln2_b_ref[...].reshape(c)
    hidden = w1_ref.shape[-1]
    b1 = b1_ref[...].reshape(hidden)
    b2 = b2_ref[...].reshape(c)

    def dot(a, w):
        return _dot_f32(
            a, w, ((1,), (0,)),
        )

    xn = _layernorm_rows(xs, ln_s, ln_b).astype(xs.dtype)
    qkv = (dot(xn, wqkv_ref[...]) + bqkv.astype(jnp.float32)).astype(xs.dtype)

    head_outs = []
    for h in range(heads):
        q = qkv[:, h * d:(h + 1) * d]
        k = qkv[:, c + h * d: c + (h + 1) * d]
        v = qkv[:, 2 * c + h * d: 2 * c + (h + 1) * d]
        head_outs.append(_grand_attend(q, k, v, scale, mask))
    attn_out = jnp.concatenate(head_outs, axis=-1).astype(xs.dtype)

    attn_branch = dot(attn_out, wproj_ref[...]) + bproj.astype(jnp.float32)
    if s_attn is not None:
        attn_branch = attn_branch * s_attn
    h1 = (xs.astype(jnp.float32) + attn_branch).astype(xs.dtype)
    hn = _layernorm_rows(h1, ln2_s, ln2_b).astype(xs.dtype)
    mid = dot(hn, w1_ref[...]) + b1.astype(jnp.float32)
    mid = _gelu_exact(mid).astype(xs.dtype)
    mlp_branch = dot(mid, w2_ref[...]) + b2.astype(jnp.float32)
    if s_mlp is not None:
        mlp_branch = mlp_branch * s_mlp
    out = h1.astype(jnp.float32) + mlp_branch
    if out_ln:
        oln_s = oln_s_ref[...].reshape(c)
        oln_b = oln_b_ref[...].reshape(c)
        out = _layernorm_rows(out.astype(xs.dtype), oln_s, oln_b)
    o_ref[...] = out.astype(o_ref.dtype)


def fused_temporal_block_cols(
    x, block_params: dict, n: int, f8: int, j_groups: int, heads: int,
    scale=None, interpret=None, t_rows=None, out_ln_params: dict = None,
    dp_scales=None,
):
    """Temporal transformer block over spatial-major activations, transposed
    IN THE BLOCKSPEC instead of in HBM.

    x: [B*F8, J*C] — the same buffer the spatial kernels produce, viewed
    2-D. The temporal attention group of (batch b, joint j) is the column
    slice x[b*F8:(b+1)*F8, j*C:(j+1)*C]; the grid runs one group per step
    and the DMA engine performs the strided gather, eliminating the
    [B,F,J,C]->[B,J,F,C] transpose + frame-pad round trips the round-1 path
    paid per block. n = real frame count (rows n..F8-1 are padding).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    rows, cols = x.shape
    c = cols // j_groups
    b = rows // f8
    d = c // heads
    if scale is None:
        scale = d ** -0.5

    attn = block_params["attn"]
    mlp = block_params["mlp"]
    hidden = mlp["fc1"]["kernel"].shape[-1]

    def bias_of(layer, size):
        bias = layer.get("bias")
        return jnp.zeros((size,), x.dtype) if bias is None else bias

    out_ln = out_ln_params is not None
    if out_ln:
        oln_s = out_ln_params["scale"].reshape(1, c)
        oln_b = out_ln_params["bias"].reshape(1, c)
    else:
        oln_s = jnp.zeros((1, c), x.dtype)
        oln_b = jnp.zeros((1, c), x.dtype)

    has_t = t_rows is not None
    has_dp = dp_scales is not None
    if has_dp:
        # Per-GROUP scales: row g = attention group (sample b = g // J,
        # joint j = g % J), matching the grid's one-group-per-step order.
        assert dp_scales.shape == (b * j_groups, 2), (dp_scales.shape, b, j_groups)
        dp_pad = jnp.pad(dp_scales.astype(jnp.float32), ((0, 0), (0, 126)))

    group_spec = pl.BlockSpec(
        (f8, c), lambda i: (i // j_groups, i % j_groups), memory_space=pltpu.VMEM
    )
    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    opt_inputs, opt_specs = [], []
    if has_t:
        opt_inputs.append(t_rows.astype(x.dtype))
        opt_specs.append(full(*t_rows.shape))
    if has_dp:
        opt_inputs.append(dp_pad)
        opt_specs.append(full(*dp_pad.shape))

    out = pl.pallas_call(
        functools.partial(
            _fused_temporal_group_kernel, n=n, heads=heads, scale=scale,
            out_ln=out_ln, has_t=has_t, has_dp=has_dp, j_groups=j_groups,
        ),
        grid=(b * j_groups,),
        in_specs=[
            group_spec,
            *opt_specs,
            full(1, c), full(1, c),
            full(c, 3 * c), full(1, 3 * c),
            full(c, c), full(1, c),
            full(1, c), full(1, c),
            full(c, hidden), full(1, hidden),
            full(hidden, c), full(1, c),
            full(1, c), full(1, c),
        ],
        out_specs=group_spec,
        out_shape=jax.ShapeDtypeStruct((rows, cols), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * cols * (3 * c + c + 2 * hidden) // c
            + 2 * 2 * rows * n * cols // c * c,
            bytes_accessed=2 * rows * cols * x.dtype.itemsize,
            transcendentals=rows * (n + hidden),
        ),
        interpret=interpret,
    )(
        x,
        *opt_inputs,
        block_params["norm1"]["scale"].reshape(1, c),
        block_params["norm1"]["bias"].reshape(1, c),
        attn["qkv"]["kernel"].astype(x.dtype),
        bias_of(attn["qkv"], 3 * c).reshape(1, 3 * c),
        attn["proj"]["kernel"].astype(x.dtype),
        bias_of(attn["proj"], c).reshape(1, c),
        block_params["norm2"]["scale"].reshape(1, c),
        block_params["norm2"]["bias"].reshape(1, c),
        mlp["fc1"]["kernel"].astype(x.dtype),
        bias_of(mlp["fc1"], hidden).reshape(1, hidden),
        mlp["fc2"]["kernel"].astype(x.dtype),
        bias_of(mlp["fc2"], c).reshape(1, c),
        oln_s.astype(x.dtype), oln_b.astype(x.dtype),
    )
    return out
