"""Pallas GRAND-attention kernels vs the XLA reference path (interpreter
mode on CPU; the same kernels compile natively on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff3dhpe_tpu.ops.attention import (
    fused_grand_attention,
    grand_attention,
    grand_attention_pallas_3d,
    packed_grand_attention,
)


def _rand(rng, shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


@pytest.mark.parametrize("g,n,d", [(14, 17, 64), (7, 17, 64), (5, 17, 64), (3, 8, 32)])
def test_packed_matches_xla(rng, g, n, d):
    """Packed block-diagonal kernel == per-group XLA attention, including
    when G is not a multiple of the packing factor (padding path)."""
    q, k, v = (_rand(rng, (g, n, d)) for _ in range(3))
    expected = grand_attention(q, k, v)
    out = packed_grand_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("g,n,d", [(4, 243, 64), (2, 128, 64)])
def test_fullseq_matches_xla(rng, g, n, d):
    q, k, v = (_rand(rng, (g, n, d)) for _ in range(3))
    expected = grand_attention(q, k, v)
    out = grand_attention_pallas_3d(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("n", [17, 243])
def test_dispatcher_4d(rng, n):
    b, h, d = 3, 8, 64
    q, k, v = (_rand(rng, (b, h, n, d)) for _ in range(3))
    expected = grand_attention(q, k, v)
    out = fused_grand_attention(q, k, v, interpret=True)
    assert out.shape == (b, h, n, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-5, atol=1e-5)


def test_custom_scale(rng):
    q, k, v = (_rand(rng, (7, 17, 64)) for _ in range(3))
    expected = grand_attention(q, k, v, scale=0.5)
    out = packed_grand_attention(q, k, v, scale=0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-5, atol=1e-5)


def _plain_dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_grand_attend_tile_epilogue_both_dtypes(rng, dtype):
    """The shared softmax epilogue (grand_attend_tile) picks a different
    formulation per dtype (deferred-norm + exp2 for f32, normalise-then-AV
    for bf16 — PERF.md round-3 A/B); both must equal the XLA reference."""
    from diff3dhpe_tpu.ops.attention import grand_attend_tile

    n, d = 17, 64
    q, k, v = (_rand(rng, (n, d)).astype(dtype) for _ in range(3))
    out = grand_attend_tile(q.astype(jnp.float32), k.astype(jnp.float32),
                            v, d ** -0.5, None, _plain_dot)
    expected = grand_attention(q, k, v).astype(jnp.float32)
    tol = 1e-5 if dtype == jnp.float32 else 0.02
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=tol, atol=tol)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_grand_attend_tile_finite_mask(rng, dtype):
    """A FINITE additive mask must mean softmax(qk*scale + mask) on both
    dtype branches — the f32/exp2 branch works in the log2 domain and must
    scale the mask by log2e (a raw add would apply mask*ln2 instead)."""
    from diff3dhpe_tpu.ops.attention import grand_attend_tile

    n, d = 17, 64
    q, k, v = (_rand(rng, (n, d)).astype(dtype) for _ in range(3))
    scale = d ** -0.5
    mask = _rand(rng, (n, n)) * 3.0  # finite bias, not just 0/-1e30
    out = grand_attend_tile(q.astype(jnp.float32), k.astype(jnp.float32),
                            v, scale, mask, _plain_dot)
    logits = (_plain_dot(q.astype(jnp.float32), k.astype(jnp.float32),
                         ((1,), (1,))) * scale + mask)
    probs = jax.nn.softmax(logits, axis=-1)
    expected = probs @ v.astype(jnp.float32) - v.astype(jnp.float32)
    tol = 1e-5 if dtype == jnp.float32 else 0.02
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=tol, atol=tol)


def test_grand_attend_tile_ablation_gates(rng, monkeypatch):
    """The measurement-only ablation env gates (probe_irreducible.py) are
    OFF by default and produce the documented wrong-numerics stand-ins."""
    from diff3dhpe_tpu.ops.attention import grand_attend_tile

    n, d = 17, 64
    q, k, v = (_rand(rng, (n, d)) for _ in range(3))
    scale = d ** -0.5
    full = grand_attend_tile(q, k, v, scale, None, _plain_dot)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(grand_attention(q, k, v)),
        rtol=1e-5, atol=1e-5,
    )

    monkeypatch.setenv("DIFF_FUSED_ABLATE_SOFTMAX", "1")
    no_sm = grand_attend_tile(q, k, v, scale, None, _plain_dot)
    from diff3dhpe_tpu.ops.attention import _LOG2E

    logits = _plain_dot(q, k, ((1,), (1,))) * (scale * _LOG2E)
    np.testing.assert_allclose(
        np.asarray(no_sm), np.asarray(_plain_dot(logits, v, ((1,), (0,))) - v),
        rtol=1e-5, atol=1e-5,
    )
    monkeypatch.delenv("DIFF_FUSED_ABLATE_SOFTMAX")

    monkeypatch.setenv("DIFF_FUSED_ABLATE_ATTEND", "1")
    no_att = grand_attend_tile(q, k, v, scale, None, _plain_dot)
    np.testing.assert_allclose(np.asarray(no_att), -np.asarray(v), rtol=0, atol=0)


def test_model_with_pallas_matches_xla(rng):
    """Whole denoiser forward with use_pallas=True == XLA attention path."""
    from diff3dhpe_tpu.models import MixSTEDenoiser

    kwargs = dict(
        num_frame=9, num_joints=17, in_chans=2, embed_dim=32, depth=1,
        num_heads=4, mlp_ratio=2.0, qkv_bias=True, with_time_emb=True, mode="s2s",
    )
    m_xla = MixSTEDenoiser(use_pallas=False, **kwargs)
    m_pal = MixSTEDenoiser(use_pallas=True, **kwargs)
    x = _rand(rng, (2, 9, 17, 5))
    t = jnp.array([0.0, 10.0])
    params = m_xla.init(jax.random.PRNGKey(0), x, t)["params"]
    out_xla = m_xla.apply({"params": params}, x, t)
    out_pal = m_pal.apply({"params": params}, x, t)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_xla), rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("n", [17, 96, 243])
def test_trainable_attention_grads_match_autodiff(rng, n):
    """grand_attention_trainable's hand-derived backward (flash-style
    Pallas kernel for long N, XLA formulas for small N) must reproduce
    jax.grad through the einsum path to float tolerance — the correctness
    contract of the fused training backward (VERDICT r4 Next #3)."""
    from diff3dhpe_tpu.ops.attention import (
        grand_attention,
        grand_attention_trainable,
    )

    b, h, d = 2, 3, 16
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(grand_attention(q, k, v) * w)

    def loss_fused(q, k, v):
        return jnp.sum(grand_attention_trainable(q, k, v) * w)

    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)


def test_trainable_attention_grads_nonmultiple_of_8(rng):
    """N=243 pads to 248 inside the backward kernel: pad keys are masked
    out of the recomputed softmax and pad dq rows sliced — the gradient on
    REAL rows must be unaffected (covered above at n=243); here the raw
    group-level kernel is checked directly against the XLA formulas."""
    from diff3dhpe_tpu.ops.attention import (
        _grand_attention_bwd_xla,
        grand_attention_bwd_pallas,
    )

    g, n, d = 3, 43, 32
    q = jnp.asarray(rng.standard_normal((g, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((g, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((g, n, d)), jnp.float32)
    do = jnp.asarray(rng.standard_normal((g, n, d)), jnp.float32)
    ref = _grand_attention_bwd_xla(q, k, v, do, d ** -0.5)
    got = grand_attention_bwd_pallas(q, k, v, do, interpret=True)
    for a, b_ in zip(got, ref):
        assert a.shape == (g, n, d)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)
