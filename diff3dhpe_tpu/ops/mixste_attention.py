"""qkv-native GRAND attention over flat token layouts.

The MixSTE hot path keeps activations as flat [rows, C] tokens (no 17-joint
sublane padding anywhere); attention groups are simply runs of N consecutive
rows. These ops consume the fused qkv GEMM output [R, 3C] directly —
no 5-D head-split transpose, no [N, N] logits in HBM.

- ``attention_from_qkv``: dispatcher with an XLA fallback (used off-TPU and
  as the numerics reference).
- small N (spatial, N = 17): Pallas kernel packing floor(128/N) groups per
  MXU tile behind a block-diagonal mask; rows arrive pre-packed because they
  are consecutive, so there is no packing relayout at all (the failure mode
  of packing from a [G, N, D] layout — see PERF.md).
- large N (temporal, N = 27..243): Pallas kernel holding each group's
  [N, N] attention in VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _attend_rows(qf, kf, vf, scale, mask=None):
    """(softmax(qf kf^T * scale [+ mask]) - I) vf for [M, D] row tiles."""
    logits = jax.lax.dot_general(
        qf, kf,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if mask is not None:
        logits = logits + mask
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    probs = jnp.exp(logits)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        probs.astype(vf.dtype), vf,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out - vf.astype(jnp.float32)


def _qkv_small_kernel(qkv_ref, o_ref, *, scale, n, heads, tpg, m):
    """TPG tiles of [M=P*N rows, 3C]; per tile, per head, one masked MXU pass."""
    c = o_ref.shape[-1]
    d = c // heads
    row_g = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0) // n
    col_g = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1) // n
    mask = jnp.where(row_g == col_g, 0.0, -1e30).astype(jnp.float32)

    for t in range(tpg):
        rows = slice(t * m, (t + 1) * m)
        block = qkv_ref[rows, :]
        head_outs = []
        for h in range(heads):
            q = block[:, h * d:(h + 1) * d]
            k = block[:, c + h * d: c + (h + 1) * d]
            v = block[:, 2 * c + h * d: 2 * c + (h + 1) * d]
            head_outs.append(_attend_rows(q, k, v, scale, mask=mask))
        o_ref[rows, :] = jnp.concatenate(head_outs, axis=-1).astype(o_ref.dtype)


def _qkv_long_kernel(qkv_ref, o_ref, *, scale, heads, gps):
    """GPS groups per grid step; refs [GPS, N, 3C] / [GPS, N, C]; the
    [N, N] attention matrix lives only in VMEM. (3-D blocks so the N dim
    equals the array dim — Mosaic requires block dims divisible by (8, 128)
    or exactly the array extent, and N = 243 is neither 8-aligned nor
    worth padding.)"""
    c = o_ref.shape[-1]
    d = c // heads
    for g in range(gps):
        block = qkv_ref[g]
        head_outs = []
        for h in range(heads):
            q = block[:, h * d:(h + 1) * d]
            k = block[:, c + h * d: c + (h + 1) * d]
            v = block[:, 2 * c + h * d: 2 * c + (h + 1) * d]
            head_outs.append(_attend_rows(q, k, v, scale))
        o_ref[g] = jnp.concatenate(head_outs, axis=-1).astype(o_ref.dtype)


def _xla_attention_from_qkv(qkv, n, heads, scale):
    r, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    g = r // n
    qkv5 = qkv.reshape(g, n, 3, heads, d)
    q = jnp.transpose(qkv5[:, :, 0], (0, 2, 1, 3))  # [G, H, N, D]
    k = jnp.transpose(qkv5[:, :, 1], (0, 2, 1, 3))
    v = jnp.transpose(qkv5[:, :, 2], (0, 2, 1, 3))
    logits = jnp.einsum("ghnd,ghmd->ghnm", q, k) * scale
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("ghnm,ghmd->ghnd", attn, v) - v
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(r, c)


def attention_from_qkv(
    qkv, n: int, heads: int, scale=None, impl: str = "auto", interpret=None,
    tiles_per_step: int = 8, groups_per_step: int = 2,
):
    """GRAND attention over a flat fused-qkv tensor.

    qkv: [R, 3C] where every N consecutive rows form one attention group
    (R divisible by N). Returns [R, C].

    impl: 'xla' | 'pallas' | 'auto' (pallas on TPU, xla elsewhere).
    """
    r, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    assert r % n == 0, (r, n)
    if scale is None:
        scale = d ** -0.5
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return _xla_attention_from_qkv(qkv, n, heads, scale)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if n <= 64:
        p = max(1, 128 // n)
        m = p * n
        # Mosaic block rows must be 8-divisible.
        while (m * tiles_per_step) % 8:
            tiles_per_step += 1
        step_rows = m * tiles_per_step
        r2 = ((r + step_rows - 1) // step_rows) * step_rows
        qkv_p = jnp.pad(qkv, ((0, r2 - r), (0, 0))) if r2 != r else qkv
        out = pl.pallas_call(
            functools.partial(
                _qkv_small_kernel, scale=scale, n=n, heads=heads,
                tpg=tiles_per_step, m=m,
            ),
            grid=(r2 // step_rows,),
            in_specs=[pl.BlockSpec((step_rows, c3), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((step_rows, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((r2, c), qkv.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * r2 * n * c,
                bytes_accessed=r2 * (c3 + c) * qkv.dtype.itemsize,
                transcendentals=r2 * n,
            ),
            interpret=interpret,
        )(qkv_p)
        return out[:r] if r2 != r else out

    # Long sequences: GPS whole groups per step, grouped as a 3-D view.
    g = r // n
    gps = min(groups_per_step, g)
    g2 = ((g + gps - 1) // gps) * gps
    qkv_g = qkv.reshape(g, n, c3)
    if g2 != g:
        qkv_g = jnp.pad(qkv_g, ((0, g2 - g), (0, 0), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_qkv_long_kernel, scale=scale, heads=heads, gps=gps),
        grid=(g2 // gps,),
        in_specs=[pl.BlockSpec((gps, n, c3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((gps, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g2, n, c), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * g2 * n * n * c,
            bytes_accessed=g2 * n * (c3 + c) * qkv.dtype.itemsize,
            transcendentals=g2 * n * n,
        ),
        interpret=interpret,
    )(qkv_g)
    out = out[:g] if g2 != g else out
    return out.reshape(r, c)
