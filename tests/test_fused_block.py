"""Fused attention sub-block kernel vs the equivalent XLA composition."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff3dhpe_tpu.ops.attention import grand_attention
from diff3dhpe_tpu.ops.fused_block import fused_attention_block


def _xla_reference(x, ln_s, ln_b, w_qkv, b_qkv, w_proj, b_proj, n, heads):
    r, c = x.shape
    d = c // heads
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * ln_s + ln_b).astype(x.dtype)
    qkv = xn @ w_qkv + b_qkv
    g = r // n
    qkv5 = qkv.reshape(g, n, 3, heads, d)
    q, k, v = (jnp.transpose(qkv5[:, :, i], (0, 2, 1, 3)) for i in range(3))
    out = grand_attention(q, k, v)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(r, c)
    return x + (out @ w_proj + b_proj)


@pytest.mark.parametrize("n,groups", [(17, 21), (17, 8), (243, 3), (81, 5), (27, 9)])
def test_fused_attention_block_matches_xla(rng, n, groups):
    c, heads = 64, 8
    r = n * groups
    x = jnp.asarray(rng.standard_normal((r, c)), jnp.float32)
    ln_s = jnp.asarray(rng.standard_normal(c) * 0.1 + 1.0, jnp.float32)
    ln_b = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    w_qkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.05, jnp.float32)
    b_qkv = jnp.asarray(rng.standard_normal(3 * c) * 0.05, jnp.float32)
    w_proj = jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.float32)
    b_proj = jnp.asarray(rng.standard_normal(c) * 0.05, jnp.float32)

    expected = _xla_reference(x, ln_s, ln_b, w_qkv, b_qkv, w_proj, b_proj, n, heads)
    out = fused_attention_block(
        x, ln_s, ln_b, w_qkv, b_qkv, w_proj, b_proj, n=n, heads=heads, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-4, atol=2e-5)
