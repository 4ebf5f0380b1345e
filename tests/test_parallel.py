"""Mesh/sharding tests on the virtual 8-device CPU mesh: layout rules,
and numerical equivalence of DP-only vs DP+TP execution."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from diff3dhpe_tpu.diffusion import GaussianDiffusion
from diff3dhpe_tpu.engine import build_train_state, make_denoise_fn, make_train_step
from diff3dhpe_tpu.engine.steps import make_optimizer
from diff3dhpe_tpu.models import MixSTEDenoiser
from diff3dhpe_tpu.parallel import make_mesh, param_sharding_rules, shard_params


def test_make_mesh_default():
    mesh = make_mesh()
    assert mesh.axis_names == ("data",)
    assert mesh.shape["data"] == 8


def test_make_mesh_spec():
    mesh = make_mesh("data:4,model:2")
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    with pytest.raises(AssertionError):
        make_mesh("data:16")


def test_sharding_rules():
    mesh = make_mesh("data:4,model:2")
    rule = lambda *names: param_sharding_rules(names, None, mesh)
    assert rule("ste_block_0", "attn", "qkv", "kernel") == P(None, "model")
    assert rule("ste_block_0", "attn", "qkv", "bias") == P("model")
    assert rule("ste_block_0", "attn", "proj", "kernel") == P("model", None)
    assert rule("ste_block_0", "mlp", "fc1", "kernel") == P(None, "model")
    assert rule("ste_block_0", "mlp", "fc2", "kernel") == P("model", None)
    # time_proj is NOT row-parallel despite containing 'proj'
    assert rule("ste_block_0", "time_proj", "kernel") == P()
    assert rule("fusion_layer", "kernel") == P()
    assert rule("spatial_pos_embed") == P()
    # DP-only mesh: everything replicated
    dp = make_mesh("data:8")
    assert param_sharding_rules(("ste_block_0", "attn", "qkv", "kernel"), None, dp) == P()


def _build(mesh):
    model = MixSTEDenoiser(
        num_frame=9, num_joints=17, in_chans=2, embed_dim=32, depth=1,
        num_heads=8, mlp_ratio=2.0, qkv_bias=True, with_time_emb=True,
        drop_path_rate=0.0, mode="s2s",
    )
    diffusion = GaussianDiffusion.create(
        make_denoise_fn(model), timesteps=20, sampling_timesteps=3,
        beta_schedule="cosine", mode="s2s",
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 9, 17, 5)), jnp.zeros((1,))
    )["params"]
    return model, diffusion, params


def test_dp_vs_tp_numerical_equivalence():
    """The same params and batch must give the same loss and gradients
    whatever the mesh layout — sharding is an execution detail. (Gradients,
    not post-AdamW params: where a gradient is ~0, Adam's first normalised
    step amplifies reduction-order noise into sign flips.)"""
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.standard_normal((8, 9, 17, 3)), jnp.float32)
    x2d = jnp.asarray(rng.standard_normal((8, 9, 17, 2)), jnp.float32)
    key = jax.random.PRNGKey(42)

    results = {}
    for spec in ("data:8", "data:4,model:2", "data:2,model:2"):
        mesh = make_mesh(spec)
        model, diffusion, params = _build(mesh)
        params = shard_params(params, mesh)

        @jax.jit
        def loss_and_grads(params):
            return jax.value_and_grad(
                lambda p: diffusion.training_loss(p, key, gt, x2d)
            )(params)

        loss, grads = loss_and_grads(params)
        results[spec] = (float(loss), jax.device_get(grads))

    base_loss, base_grads = results["data:8"]
    assert np.isfinite(base_loss)
    for spec, (loss, grads) in results.items():
        np.testing.assert_allclose(loss, base_loss, rtol=1e-5, err_msg=spec)
        for a, b in zip(jax.tree.leaves(base_grads), jax.tree.leaves(grads)):
            scale = max(np.abs(a).max(), 1e-3)
            np.testing.assert_allclose(a / scale, b / scale, atol=2e-5, err_msg=spec)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    jax.eval_shape(fn, *args)  # abstract trace only: full-size compile is slow on 1 CPU
    ge.dryrun_multichip(8)


def test_fast_eval_shard_map_on_mesh():
    """The fused fast-eval path must run sharded over the data axis (XLA
    cannot partition pallas_call; make_eval_step wraps it in shard_map)."""
    import jax.numpy as jnp

    from diff3dhpe_tpu.engine.steps import make_eval_step, make_fast_denoise_fn

    mesh = make_mesh("data:8")
    model, diffusion, params = _build(mesh)
    import dataclasses
    fast = dataclasses.replace(
        diffusion,
        denoise_fn=make_fast_denoise_fn(
            num_frame=9, num_joints=17, depth=1, num_heads=8,
            with_time_emb=True, mode="s2s", dtype=jnp.float32,
        ),
    )
    jl, jr = [4, 5, 6, 11, 12, 13], [1, 2, 3, 14, 15, 16]
    step_fast = make_eval_step(fast, jl, jr, mesh=mesh)
    step_ref = make_eval_step(diffusion, jl, jr, mesh=mesh)

    x2d = jax.random.normal(jax.random.PRNGKey(1), (16, 9, 17, 2))
    key = jax.random.PRNGKey(2)
    out_fast = step_fast(params, key, x2d, x2d)
    out_ref = step_ref(params, key, x2d, x2d)
    assert out_fast.shape == (16, 9, 17, 3)
    # Sampling noise is per-row (global index), so the shard_map'd fast path
    # and the sharding-constraint flax path draw identical x_T; the only
    # difference left is denoiser numerics (fused kernel vs flax, f32).
    np.testing.assert_allclose(
        np.asarray(out_fast), np.asarray(out_ref), atol=5e-4
    )


def test_eval_step_mesh_size_invariance():
    """A fixed batch must produce identical predictions on 1 device and on
    an 8-device mesh (both the sharding-constraint path and the shard_map
    path) — per-row noise keys make sampling independent of the layout."""
    from diff3dhpe_tpu.engine.steps import make_eval_step

    mesh = make_mesh("data:8")
    model, diffusion, params = _build(mesh)
    jl, jr = [4, 5, 6, 11, 12, 13], [1, 2, 3, 14, 15, 16]

    step_1 = make_eval_step(diffusion, jl, jr, mesh=None)
    step_8 = make_eval_step(diffusion, jl, jr, mesh=mesh)
    step_8_sm = make_eval_step(diffusion, jl, jr, mesh=mesh, shard_map_batch=True)

    x2d = jax.random.normal(jax.random.PRNGKey(1), (16, 9, 17, 2))
    x2d_flip = jax.random.normal(jax.random.PRNGKey(3), (16, 9, 17, 2))
    key = jax.random.PRNGKey(2)
    o1 = np.asarray(step_1(params, key, x2d, x2d_flip))
    o8 = np.asarray(step_8(params, key, x2d, x2d_flip))
    o8_sm = np.asarray(step_8_sm(params, key, x2d, x2d_flip))
    np.testing.assert_allclose(o8, o1, atol=1e-5)
    np.testing.assert_allclose(o8_sm, o1, atol=1e-5)


def test_shard_map_paths_reject_indivisible_batch():
    """A batch that does not divide the data axis must raise a clear error
    instead of silently truncating rows (eval) or failing with an opaque
    shard_map sharding error (fast train)."""
    import dataclasses

    from diff3dhpe_tpu.engine.steps import (
        make_eval_step,
        make_fast_train_denoise_fn,
        make_train_step,
    )

    mesh = make_mesh("data:8")
    model, diffusion, params = _build(mesh)
    jl, jr = [4, 5, 6, 11, 12, 13], [1, 2, 3, 14, 15, 16]

    eval_step = make_eval_step(diffusion, jl, jr, mesh=mesh, shard_map_batch=True)
    x2d = jax.random.normal(jax.random.PRNGKey(1), (12, 9, 17, 2))  # 12 % 8 != 0
    with pytest.raises(ValueError, match="does not divide"):
        eval_step(params, jax.random.PRNGKey(2), x2d, x2d)

    fast = dataclasses.replace(
        diffusion,
        denoise_fn=make_fast_train_denoise_fn(
            num_frame=9, num_joints=17, depth=1, num_heads=8,
            with_time_emb=True, mode="s2s", dtype=jnp.float32,
            drop_path_rate=0.0,
        ),
    )
    opt = make_optimizer(1e-4, 0.99, steps_per_epoch=10)
    state = build_train_state(params, opt)
    step = make_train_step(fast, opt, mesh=mesh)
    gt = jax.random.normal(jax.random.PRNGKey(3), (12, 9, 17, 3))
    with pytest.raises(ValueError, match="does not divide"):
        step(state, jax.random.PRNGKey(4), gt, x2d)


def test_eval_step_tta_false_single_pass():
    """tta=False must run ONE sampling pass and never mix in a mirrored
    prediction (the round-1 bug silently averaged pred with flip(pred of the
    same input) when test_time_augmentation was off)."""
    from diff3dhpe_tpu.engine.steps import make_eval_step

    _, diffusion, params = _build(make_mesh("data:8"))
    jl, jr = [4, 5, 6, 11, 12, 13], [1, 2, 3, 14, 15, 16]
    step = make_eval_step(diffusion, jl, jr, mesh=None, tta=False)
    x2d = jax.random.normal(jax.random.PRNGKey(1), (4, 9, 17, 2))
    key = jax.random.PRNGKey(2)
    out = np.asarray(step(params, key, x2d, x2d))
    direct = np.asarray(
        jax.jit(
            lambda p, k, x: diffusion.estimate_pose(p, k, x, (4, 9, 17, 3))
        )(params, key, x2d)
    )
    np.testing.assert_array_equal(out, direct)
