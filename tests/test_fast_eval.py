"""fast_forward_denoise (fused-kernel functional eval path) vs the flax
module with the same param tree."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff3dhpe_tpu.models import MixSTEDenoiser
from diff3dhpe_tpu.models.fast_eval import fast_forward_denoise


@pytest.mark.parametrize("mode,with_time_emb", [("s2s", True), ("s2s", False), ("s2f", True)])
def test_fast_eval_matches_module(rng, mode, with_time_emb):
    F, J, C, depth = 9, 17, 64, 2
    model = MixSTEDenoiser(
        num_frame=F, num_joints=J, in_chans=2, embed_dim=C, depth=depth,
        num_heads=8, mlp_ratio=2.0, qkv_bias=True, drop_path_rate=0.1,
        with_time_emb=with_time_emb, mode=mode,
    )
    x = jnp.asarray(rng.standard_normal((2, F, J, 5)), jnp.float32)
    t = jnp.array([3.0, 700.0])
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]

    expected = np.asarray(model.apply({"params": params}, x, t, deterministic=True))
    out = np.asarray(
        fast_forward_denoise(
            params, x, t, num_frame=F, num_joints=J, depth=depth, num_heads=8,
            with_time_emb=with_time_emb, mode=mode, dtype=jnp.float32,
            interpret=True,
        )
    )
    assert out.shape == expected.shape
    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-5)


def test_fast_eval_bf16_close(rng):
    F, J, C, depth = 9, 17, 64, 2
    model = MixSTEDenoiser(num_frame=F, num_joints=J, in_chans=2, embed_dim=C,
                           depth=depth, num_heads=8, mlp_ratio=2.0, qkv_bias=True,
                           with_time_emb=True, mode="s2s")
    x = jnp.asarray(rng.standard_normal((2, F, J, 5)), jnp.float32)
    t = jnp.array([3.0, 700.0])
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    f32 = np.asarray(model.apply({"params": params}, x, t, deterministic=True))
    bf16 = np.asarray(
        fast_forward_denoise(params, x, t, num_frame=F, num_joints=J, depth=depth,
                             num_heads=8, dtype=jnp.bfloat16, interpret=True),
        dtype=np.float32,
    )
    scale = np.abs(f32).max()
    assert np.abs(bf16 - f32).max() / scale < 5e-2


def test_fast_eval_qkv_bias_false(rng):
    """A model built with qkv_bias=False must work on the fused path
    (missing bias params substitute zeros)."""
    F, J, C, depth = 9, 17, 64, 1
    model = MixSTEDenoiser(
        num_frame=F, num_joints=J, in_chans=2, embed_dim=C, depth=depth,
        num_heads=8, mlp_ratio=2.0, qkv_bias=False, drop_path_rate=0.0,
        with_time_emb=True, mode="s2s",
    )
    x = jnp.asarray(rng.standard_normal((2, F, J, 5)), jnp.float32)
    t = jnp.array([3.0, 700.0])
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    expected = np.asarray(model.apply({"params": params}, x, t, deterministic=True))
    out = np.asarray(
        fast_forward_denoise(
            params, x, t, num_frame=F, num_joints=J, depth=depth, num_heads=8,
            with_time_emb=True, mode="s2s", dtype=jnp.float32, interpret=True,
        )
    )
    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("heads", [4, 2])
def test_fast_eval_alternative_head_geometry(rng, heads):
    """The fused kernels are head-count-parametric: num_heads=4 at the
    flagship embed width is the head_dim-128 TPU geometry (full-width MXU
    contractions), the lever PERF.md's irreducibility proof points at.
    Verified here at small embed (head_dim 16/32) against the flax module."""
    F, J, C, depth = 9, 17, 64, 2
    model = MixSTEDenoiser(
        num_frame=F, num_joints=J, in_chans=2, embed_dim=C, depth=depth,
        num_heads=heads, mlp_ratio=2.0, qkv_bias=True, drop_path_rate=0.1,
        with_time_emb=True, mode="s2s",
    )
    x = jnp.asarray(rng.standard_normal((2, F, J, 5)), jnp.float32)
    t = jnp.array([3.0, 700.0])
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    expected = np.asarray(model.apply({"params": params}, x, t, deterministic=True))
    out = np.asarray(
        fast_forward_denoise(
            params, x, t, num_frame=F, num_joints=J, depth=depth,
            num_heads=heads, with_time_emb=True, mode="s2s",
            dtype=jnp.float32, interpret=True,
        )
    )
    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-5)


def test_fast_eval_f32_head(rng):
    """f32_head on a bf16 trunk returns f32 output at least as close to the
    flax f32 reference as the plain bf16 path (it removes the final output
    rounding; the trunk error is unchanged)."""
    F, J, C, depth = 9, 17, 64, 2
    model = MixSTEDenoiser(num_frame=F, num_joints=J, in_chans=2, embed_dim=C,
                           depth=depth, num_heads=8, mlp_ratio=2.0, qkv_bias=True,
                           with_time_emb=True, mode="s2s")
    x = jnp.asarray(rng.standard_normal((2, F, J, 5)), jnp.float32)
    t = jnp.array([3.0, 700.0])
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    f32 = np.asarray(model.apply({"params": params}, x, t, deterministic=True))
    kwargs = dict(num_frame=F, num_joints=J, depth=depth, num_heads=8,
                  dtype=jnp.bfloat16, interpret=True)
    plain = fast_forward_denoise(params, x, t, **kwargs)
    headed = fast_forward_denoise(params, x, t, f32_head=True, **kwargs)
    assert plain.dtype == jnp.bfloat16
    assert headed.dtype == jnp.float32
    scale = np.abs(f32).max()
    err_plain = np.abs(np.asarray(plain, np.float32) - f32).max() / scale
    err_headed = np.abs(np.asarray(headed) - f32).max() / scale
    assert err_headed < 5e-2
    assert err_headed <= err_plain + 1e-6


def test_fast_eval_f32_prec_pins_contraction(rng):
    """f32_prec pins the fused path's contraction mode per CALLABLE, not per
    process: "high3" (manual bf16x3, ops/fused_block.py::_dot_f32_3pass)
    must differ from exact f32 by only the dropped lo*lo bf16 term, and the
    scope must restore the ambient mode afterwards. On CPU the DEFAULT f32
    contract is already exact, so "default"/"highest" agree and "high3" is
    the one genuinely multi-pass mode exercisable here."""
    F, J, C, depth = 9, 17, 64, 2
    model = MixSTEDenoiser(num_frame=F, num_joints=J, in_chans=2, embed_dim=C,
                           depth=depth, num_heads=8, mlp_ratio=2.0, qkv_bias=True,
                           with_time_emb=True, mode="s2s")
    x = jnp.asarray(rng.standard_normal((2, F, J, 5)), jnp.float32)
    t = jnp.array([3.0, 700.0])
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    kwargs = dict(num_frame=F, num_joints=J, depth=depth, num_heads=8,
                  dtype=jnp.float32, interpret=True)
    exact = np.asarray(fast_forward_denoise(params, x, t, f32_prec="highest", **kwargs))
    h3 = np.asarray(fast_forward_denoise(params, x, t, f32_prec="high3", **kwargs))
    ambient = np.asarray(fast_forward_denoise(params, x, t, **kwargs))
    scale = np.abs(exact).max()
    err_h3 = np.abs(h3 - exact).max() / scale
    # bf16x3 keeps ~16 mantissa bits: far from bitwise, far better than bf16.
    assert 0 < err_h3 < 1e-3
    # The scope must not leak: the ambient (env-default) call still matches
    # the exact result on CPU, where DEFAULT == HIGHEST.
    np.testing.assert_allclose(ambient, exact, rtol=1e-6, atol=1e-7)

    from diff3dhpe_tpu.ops.fused_block import f32_contract_mode

    assert f32_contract_mode() == "default"


def test_fast_eval_f32_tail_pairs(rng):
    """f32_tail_pairs on a bf16 trunk: the last K block pairs + head run at
    f32 — output is f32, strictly closer to the flax f32 reference than the
    pure bf16 path, monotonically improving with deeper tails, and tail=0
    reproduces the plain bf16+f32_head path exactly."""
    F, J, C, depth = 9, 17, 64, 2
    model = MixSTEDenoiser(num_frame=F, num_joints=J, in_chans=2, embed_dim=C,
                           depth=depth, num_heads=8, mlp_ratio=2.0, qkv_bias=True,
                           with_time_emb=True, mode="s2s")
    x = jnp.asarray(rng.standard_normal((2, F, J, 5)), jnp.float32)
    t = jnp.array([3.0, 700.0])
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    f32 = np.asarray(model.apply({"params": params}, x, t, deterministic=True))
    kwargs = dict(num_frame=F, num_joints=J, depth=depth, num_heads=8,
                  dtype=jnp.bfloat16, f32_head=True, interpret=True)

    headed = fast_forward_denoise(params, x, t, **kwargs)
    tail0 = fast_forward_denoise(params, x, t, f32_tail_pairs=0, **kwargs)
    tail1 = fast_forward_denoise(params, x, t, f32_tail_pairs=1, **kwargs)
    tail_all = fast_forward_denoise(params, x, t, f32_tail_pairs=depth, **kwargs)
    for out in (tail1, tail_all):
        assert out.dtype == jnp.float32

    np.testing.assert_array_equal(np.asarray(tail0), np.asarray(headed))

    scale = np.abs(f32).max()
    err = lambda o: np.abs(np.asarray(o, np.float32) - f32).max() / scale
    # Deeper f32 tails monotonically approach the f32 reference (on CPU the
    # f32 kernels are exact, so the only residual is the bf16 prefix).
    assert err(tail_all) < err(tail1) < err(headed)
    assert err(tail_all) < 2e-2

    # The precision scope wrapper composes with the tail (high3 tail pairs)
    # and must not leak the mode.
    t1h3 = fast_forward_denoise(params, x, t, f32_tail_pairs=1,
                                f32_prec="high3", **kwargs)
    assert err(t1h3) < err(headed)
    from diff3dhpe_tpu.ops.fused_block import f32_contract_mode

    assert f32_contract_mode() == "default"
