"""GRAND-modified multi-head attention: out = (softmax(QK^T/sqrt(d)) - I) V.

The identity subtraction (the GRAND graph-diffusion term, reference:
common/nets/model_conditional_diffusion_mixste_s2s_grand_linLift.py:82-83)
is algebraically (attn @ V) - V, so instead of materialising a [N, N]
identity and subtracting it from the attention matrix (what the reference
does, allocating B*H*N*N extra elements), we subtract V from the attention
output. XLA fuses the subtraction into the PV matmul epilogue for free.

Implementations:
- ``grand_attention``: pure-XLA einsum path (the default; also the reference
  for kernel tests).
- ``packed_grand_attention``: Pallas kernel for many tiny-N groups (the
  17-joint spatial attention). Packs floor(128/N) groups per MXU tile behind
  a block-diagonal mask — one [119, 119] matmul replaces 7 fully-padded
  17x17 matmuls — and processes many tiles per grid step so DMAs are large.
- ``grand_attention_pallas_3d``: Pallas kernel for long-N groups (the
  temporal attention, N = 27..243): the [N, N] attention matrix lives only
  in VMEM, never in HBM; several groups per grid step.
- ``fused_grand_attention``: dispatcher over the two by N.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# exp(x) lowers to exp2(x * log2e) on the TPU VPU; folding log2e into the
# attention scale turns the per-logit exp into a bare exp2.
_LOG2E = 1.4426950408889634


def grand_attention(q, k, v, scale=None):
    """Batched GRAND attention over already-split heads.

    q, k, v: [..., N, head_dim]. Softmax over the last axis of QK^T, then
    (attn @ v) - v. Returns [..., N, head_dim] in the input dtype.
    """
    head_dim = q.shape[-1]
    if scale is None:
        scale = head_dim ** -0.5
    logits = jnp.einsum("...nd,...md->...nm", q, k) * scale
    # Softmax in f32 for stability even when activations are bf16.
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("...nm,...md->...nd", attn, v)
    return out - v


def grand_attend_tile(qf, kf, vf, scale, mask, dot):
    """Shared GRAND epilogue for one [M, D] tile:
    softmax(qf kf^T * scale [+ mask]) vf - vf, f32 accumulation.

    The ONE implementation of the dtype-tuned softmax epilogue, used by
    both the pallas-attention kernels here and every fused-block kernel
    (fused_block._grand_attend). ``dot(a, b, dims)`` is the caller's
    dot_general wrapper — each caller pins its own contraction precision
    (fused_block._dot_f32 pins DIFF_FUSED_F32_PREC; the kernels in this
    module honour the session matmul precision for f32 operands).

    Epilogue choice (A/B-measured on v5e, PERF.md round-3): f32 DEFERS the
    normalisation past the AV matmul (divide the [M, D] output by the row
    sum instead of the [M, M] probabilities) and folds log2e into the scale
    so the per-logit exp lowers to a bare exp2 — +2% on the f32 bench; bf16
    keeps the classic normalise-then-AV form, which measured faster there
    (the separated epilogue defeats the divide+cast fusion feeding the MXU).

    Measurement ablations (perf probes only, wrong numerics; read at trace
    time, see scripts/probe_irreducible.py):
    - DIFF_FUSED_ABLATE_SOFTMAX=1 skips the softmax epilogue (max/exp/sum/
      normalise) but keeps both attention matmuls — the delta isolates the
      attention VPU cost;
    - DIFF_FUSED_ABLATE_ATTEND=1 skips the attention core entirely (logits
      matmul, softmax, AV matmul) — what remains is the kernels' GEMM+LN
      floor, the empirical roofline the full kernel is judged against.
    """
    if os.environ.get("DIFF_FUSED_ABLATE_ATTEND") == "1":
        return 0.0 - vf.astype(jnp.float32)
    bf16 = vf.dtype == jnp.bfloat16
    logits = dot(qf, kf, ((1,), (1,))) * (scale if bf16 else scale * _LOG2E)
    if mask is not None:
        # The f32 path works in the log2 domain (exp2(x*log2e) == exp(x)),
        # so the additive mask must be scaled by log2e too — exact for the
        # current 0/-1e30 masks AND any finite bias a future caller passes.
        logits = logits + (mask if bf16 else mask * _LOG2E)
    if os.environ.get("DIFF_FUSED_ABLATE_SOFTMAX") == "1":
        return dot(logits.astype(vf.dtype), vf, ((1,), (0,))) - vf.astype(jnp.float32)
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    if bf16:
        probs = jnp.exp(logits)
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
        out = dot(probs.astype(vf.dtype), vf, ((1,), (0,)))
        return out - vf.astype(jnp.float32)
    e = jnp.exp2(logits)
    r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
    out = dot(e.astype(vf.dtype), vf, ((1,), (0,)))
    return out * r - vf.astype(jnp.float32)


def _attend_tile(qf, kf, vf, scale, mask=None):
    """softmax(qf kf^T * scale [+ mask]) vf - vf for one [M, D] tile."""
    # bf16 operands pin DEFAULT: a global jax_default_matmul_precision=
    # highest would force an fp32 contract on bf16 operands, which Mosaic
    # rejects ("Bad lhs type"). f32 operands pass precision=None so the
    # SESSION's matmul precision applies — use_pallas_attention + f32 +
    # matmul_precision='highest' (the parity config) keeps exact-f32
    # contraction on TPU.
    prec = jax.lax.Precision.DEFAULT if qf.dtype == jnp.bfloat16 else None

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    return grand_attend_tile(qf, kf, vf, scale, mask, dot)


def _packed_grand_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n, tpg):
    """TPG pre-packed tiles per grid step.

    Refs are [TPG, M, D] where M = P*N <= 128 rows hold P whole N-token
    groups (the caller does the packing reshape in XLA, so the kernel body
    performs no relayouts). Each tile computes ONE [M, M]
    block-diagonal-masked logits matmul + ONE [M, D] PV matmul instead of P
    fully-padded NxN passes. This is the MixSTE *spatial* attention kernel:
    N = 17 joints, P = 7 -> 119-row tiles.
    """
    m = q_ref.shape[1]
    row_g = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0) // n
    col_g = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1) // n
    mask = jnp.where(row_g == col_g, 0.0, -1e30).astype(jnp.float32)

    outs = [
        _attend_tile(q_ref[t], k_ref[t], v_ref[t], scale, mask=mask)
        for t in range(tpg)
    ]
    o_ref[...] = jnp.stack(outs).astype(o_ref.dtype)


def packed_grand_attention(q, k, v, scale=None, interpret=False, tiles_per_step=16):
    """GRAND attention for many small-N groups: q, k, v [G, N, D].

    Packs floor(128 / N) groups per MXU tile (block-diagonal masked) and
    ``tiles_per_step`` tiles per grid step; pads G up to a multiple of the
    step size. The [G, N, D] -> [tiles, P*N, D] packing reshape happens in
    XLA, outside the kernel.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g, n, d = q.shape
    if scale is None:
        scale = d ** -0.5
    p = max(1, 128 // n)
    m = p * n
    step = p * tiles_per_step
    g2 = ((g + step - 1) // step) * step
    if g2 != g:
        pad = ((0, g2 - g), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    n_tiles = g2 // p
    qp, kp, vp = (a.reshape(n_tiles, m, d) for a in (q, k, v))

    spec = pl.BlockSpec((tiles_per_step, m, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_packed_grand_attn_kernel, scale=scale, n=n, tpg=tiles_per_step),
        grid=(n_tiles // tiles_per_step,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, m, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * g2 * n * n * d,
            bytes_accessed=4 * g2 * n * d * 4,
            transcendentals=g2 * n * n,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    out = out.reshape(g2, n, d)
    return out[:g] if g2 != g else out


def _fullseq_grand_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, gps):
    """GPS groups of a full [N, D] sequence attention per grid step."""
    outs = [
        _attend_tile(q_ref[i], k_ref[i], v_ref[i], scale) for i in range(gps)
    ]
    o_ref[...] = jnp.stack(outs).astype(o_ref.dtype)


def grand_attention_pallas_3d(q, k, v, scale=None, interpret=False, groups_per_step=8):
    """Fused GRAND attention for long sequences: q, k, v [G, N, D].

    The [N, N] attention matrix stays in VMEM (the XLA path materialises
    G x N x N logits to HBM); ``groups_per_step`` groups per grid step keep
    DMA transfers large.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g, n, d = q.shape
    if scale is None:
        scale = d ** -0.5
    gps = min(groups_per_step, g)
    g2 = ((g + gps - 1) // gps) * gps
    if g2 != g:
        pad = ((0, g2 - g), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    spec = pl.BlockSpec((gps, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fullseq_grand_attn_kernel, scale=scale, gps=gps),
        grid=(g2 // gps,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((g2, n, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * g2 * n * n * d,
            bytes_accessed=4 * g2 * n * d * 4,
            transcendentals=g2 * n * n,
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:g] if g2 != g else out


def fused_grand_attention(q, k, v, scale=None, interpret=None):
    """Dispatcher: heads-folded fused GRAND attention.

    q, k, v: [B, H, N, D] -> [B, H, N, D]. Small N goes to the packed
    block-diagonal kernel; large N to the fused full-sequence kernel.
    ``interpret=None`` auto-selects interpreter mode off-TPU so the same
    model code runs in CPU tests.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, n, d = q.shape
    if n <= 64:
        # Measured on v5e (B=16, 243f, 8 heads): the packed kernel is bound by
        # the XLA-side [G,17,64] -> [G/7,119,64] packing relayout and loses to
        # the plain einsum path (9.0ms vs 7.4ms), so small-N dispatches to XLA.
        # packed_grand_attention stays available for layouts that are already
        # packed.
        return grand_attention(q, k, v, scale=scale)
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, d)
    out = grand_attention_pallas_3d(qf, kf, vf, scale=scale, interpret=interpret)
    return out.reshape(b, h, n, d)


def grand_attention_pallas(q, k, v, scale=None, interpret=False):
    """Back-compat alias: fused GRAND attention over [G, N, D] groups."""
    return grand_attention_pallas_3d(q, k, v, scale=scale, interpret=interpret)


# ----------------------------------------------------------------------
# Training backward: fused GRAND attention VJP (round 5, VERDICT r4 #3).
#
# The fast-train custom VJP recomputes its backward through a pure-XLA
# mirror; its attention backward materialises the [G, N, N] probability
# tensors in HBM several times (recomputed P, dP, dS) and runs the five
# N x N x D backward matmuls unfused. This kernel computes the whole
# attention backward per group in VMEM — P is recomputed in-kernel from
# q, k (flash-style; nothing N^2 ever touches HBM) and dq/dk/dv leave in
# one pass. Derivation (out = P V - V, P = softmax(q k^T * scale)):
#   dV  = P^T do - do
#   dP  = do V^T
#   dS  = P o (dP - rowsum(dP o P))        (softmax VJP)
#   dq  = dS k * scale,   dk = dS^T q * scale
# ----------------------------------------------------------------------

def _grand_attn_bwd_tile(q, k, v, do, scale, mask):
    """One group's GRAND attention backward; f32 math, [N, D] tiles."""
    prec = jax.lax.Precision.DEFAULT if q.dtype == jnp.bfloat16 else None

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    logits = dot(q, k, ((1,), (1,))) * scale
    if mask is not None:
        logits = logits + mask
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits)
    p = e / jnp.sum(e, axis=-1, keepdims=True)          # [N, N] f32

    dof = do.astype(jnp.float32)
    dp = dot(do, v, ((1,), (1,)))                        # do V^T
    dsum = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = (p * (dp - dsum) * scale).astype(q.dtype)       # [N, N]
    pq = p.astype(q.dtype)
    dq = dot(ds, k, ((1,), (0,)))
    dk = dot(ds, q, ((0,), (0,)))                        # dS^T q
    dv = dot(pq, do, ((0,), (0,))) - dof                 # P^T do - do
    return dq, dk, dv


def _grand_attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                           *, scale, gps, n):
    f8 = q_ref.shape[1]
    mask = None
    if f8 != n:
        col = jax.lax.broadcasted_iota(jnp.int32, (f8, f8), 1)
        mask = jnp.where(col < n, 0.0, -1e30).astype(jnp.float32)
    dqs, dks, dvs = [], [], []
    for i in range(gps):
        dq, dk, dv = _grand_attn_bwd_tile(
            q_ref[i], k_ref[i], v_ref[i], do_ref[i], scale, mask
        )
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)
    dq_ref[...] = jnp.stack(dqs).astype(dq_ref.dtype)
    dk_ref[...] = jnp.stack(dks).astype(dk_ref.dtype)
    dv_ref[...] = jnp.stack(dvs).astype(dv_ref.dtype)


def grand_attention_bwd_pallas(q, k, v, do, scale=None, interpret=None,
                               groups_per_step=4):
    """Fused GRAND attention backward over [G, N, D] groups -> (dq, dk, dv).

    N is padded to a multiple of 8 in XLA; pad KEYS are masked out of the
    recomputed softmax (so dk/dv pad rows vanish) and pad dq rows are
    sliced off."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    g, n, d = q.shape
    if scale is None:
        scale = d ** -0.5
    n8 = ((n + 7) // 8) * 8
    if n8 != n:
        pad = ((0, 0), (0, n8 - n), (0, 0))
        q, k, v, do = (jnp.pad(a, pad) for a in (q, k, v, do))
    gps = min(groups_per_step, g)
    g2 = ((g + gps - 1) // gps) * gps
    if g2 != g:
        pad = ((0, g2 - g), (0, 0), (0, 0))
        q, k, v, do = (jnp.pad(a, pad) for a in (q, k, v, do))

    spec = pl.BlockSpec((gps, n8, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_grand_attn_bwd_kernel, scale=scale, gps=gps, n=n),
        grid=(g2 // gps,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((g2, n8, d), q.dtype)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=2 * 5 * g2 * n * n * d,
            bytes_accessed=7 * g2 * n * d * q.dtype.itemsize,
            transcendentals=g2 * n * n,
        ),
        interpret=interpret,
    )(q, k, v, do)
    return dq[:g, :n], dk[:g, :n], dv[:g, :n]


def _grand_attention_bwd_xla(q, k, v, do, scale):
    """XLA reference backward (same formulas; used for small N where the
    per-group kernel's relayout would dominate, and in tests)."""
    logits = jnp.einsum("...nd,...md->...nm", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1)
    dp = jnp.einsum("...nd,...md->...nm", do, v).astype(jnp.float32)
    dsum = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = (p * (dp - dsum) * scale).astype(q.dtype)
    pq = p.astype(q.dtype)
    dq = jnp.einsum("...nm,...md->...nd", ds, k)
    dk = jnp.einsum("...nm,...nd->...md", ds, q)
    dv = jnp.einsum("...nm,...nd->...md", pq, do) - do
    return dq, dk, dv


@jax.custom_vjp
def grand_attention_trainable(q, k, v):
    """GRAND attention with a hand-fused backward.

    Same function as grand_attention ([B, H, N, D] -> [B, H, N, D]) but
    differentiable through Pallas kernels in BOTH directions: forward via
    fused_grand_attention (dispatcher), backward via the flash-style
    in-VMEM kernel above for long N and the XLA formulas for small N.
    Gradient parity vs jax.grad of grand_attention:
    tests/test_pallas_attention.py."""
    return grand_attention(q, k, v)


def _gat_fwd(q, k, v):
    return fused_grand_attention(q, k, v), (q, k, v)


def _gat_bwd(res, g):
    q, k, v = res
    b, h, n, d = q.shape
    if n <= 64:
        dq, dk, dv = _grand_attention_bwd_xla(q, k, v, g, d ** -0.5)
    else:
        qf, kf, vf, gf = (a.reshape(b * h, n, d) for a in (q, k, v, g))
        dq, dk, dv = grand_attention_bwd_pallas(qf, kf, vf, gf)
        dq, dk, dv = (a.reshape(b, h, n, d) for a in (dq, dk, dv))
    return dq, dk, dv


grand_attention_trainable.defvjp(_gat_fwd, _gat_bwd)
