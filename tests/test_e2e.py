"""End-to-end pipeline tests on synthetic data: dataset -> sharded training
-> fused flip-TTA DDIM eval -> metrics; plus checkpoint/resume round-trip."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff3dhpe_tpu.config import Config
from diff3dhpe_tpu.data import PoseDataset, make_synthetic_h36m_like
from diff3dhpe_tpu.diffusion import GaussianDiffusion
from diff3dhpe_tpu.engine import (
    build_train_state,
    make_denoise_fn,
    make_eval_step,
    make_train_step,
)
from diff3dhpe_tpu.engine.steps import make_optimizer
from diff3dhpe_tpu.metrics import mpjpe
from diff3dhpe_tpu.models import HPE_model
from diff3dhpe_tpu.parallel import make_mesh, shard_params


@pytest.fixture(scope="module")
def tiny_cfg():
    return Config(
        stride=9, number_of_frames=9, embed_dim=32, transformer_depth=1,
        timesteps=20, sampling_timesteps=3, batch_size=8, batch_size_eval=16,
        subjects_train="S1", subjects_test="S9",
    )


@pytest.fixture(scope="module")
def synth(tiny_cfg):
    dataset, kp = make_synthetic_h36m_like(subjects=("S1", "S9"), n_frames=40, seed=0)
    train_ds = PoseDataset(tiny_cfg, dataset, "data", "train", keypoints_data=kp)
    test_ds = PoseDataset(tiny_cfg, dataset, "data", "test", keypoints_data=kp)
    return dataset, train_ds, test_ds


@pytest.fixture(scope="module")
def stack(tiny_cfg):
    cfg = tiny_cfg
    model = HPE_model(cfg.model)(
        num_frame=cfg.number_of_frames, num_joints=17, in_chans=2,
        embed_dim=cfg.embed_dim, depth=cfg.transformer_depth,
        num_heads=8, mlp_ratio=2.0, qkv_bias=True, with_time_emb=True,
    )
    diffusion = GaussianDiffusion.create(
        make_denoise_fn(model), timesteps=cfg.timesteps,
        sampling_timesteps=cfg.sampling_timesteps, clip_denoised=True,
        beta_schedule="cosine", clip_loss=True, mode="s2s",
    )
    return model, diffusion


def test_dataset_shapes_and_scale(synth, tiny_cfg):
    dataset, train_ds, test_ds = synth
    item = train_ds.get_item(0)
    assert item["input_2d"].shape == (9, 17, 2)
    assert item["gt_3d"].shape == (9, 17, 3)
    # Normalisation puts poses in ~[-1, 1].
    assert np.abs(item["gt_3d_norm"]).max() <= 1.0 + 1e-6
    assert train_ds.scale > 0
    # test split has the flip-TTA copy
    t_item = test_ds.get_item(0)
    assert "input_2d_flip" in t_item
    # flip of the flip is the original
    jl, jr = test_ds.kps_left, test_ds.kps_right
    unflipped = t_item["input_2d_flip"].copy()
    unflipped[..., 0] *= -1
    unflipped[:, jl + jr] = unflipped[:, jr + jl]
    np.testing.assert_allclose(unflipped, t_item["input_2d"], atol=1e-6)


def test_batch_padding(synth, tiny_cfg):
    _, _, test_ds = synth
    batches = list(test_ds.batches(16))
    total_rows = sum(b.row_mask.sum() for b in batches)
    assert total_rows == len(test_ds)
    for b in batches:
        assert b.gt_3d.shape[0] == 16  # fixed shape incl. final partial batch


def test_train_decreases_loss_and_eval_runs(synth, stack, tiny_cfg):
    cfg = tiny_cfg
    _, train_ds, test_ds = synth
    model, diffusion = stack
    mesh = make_mesh("data:8")
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 9, 17, 5)), jnp.zeros((1,)))["params"]
    params = shard_params(params, mesh)
    opt = make_optimizer(1e-3, 0.99, steps_per_epoch=4)
    state = build_train_state(params, opt)
    train_step = make_train_step(diffusion, opt, mesh=mesh)

    losses = []
    for _ in range(2):
        for b in train_ds.batches(cfg.batch_size, shuffle=True, drop_last=True):
            key, sub = jax.random.split(key)
            state, loss = train_step(
                state, sub, jnp.asarray(b.gt_3d_norm), jnp.asarray(b.input_2d)
            )
            losses.append(float(loss))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])

    eval_step = make_eval_step(diffusion, test_ds.joints_left, test_ds.joints_right, mesh=mesh)
    b = next(test_ds.batches(cfg.batch_size_eval))
    pred_norm = eval_step(
        state.params, key, jnp.asarray(b.input_2d), jnp.asarray(b.input_2d_flip)
    )
    assert pred_norm.shape == b.gt_3d.shape
    pred = test_ds.reverse_norm_3d_pose(np.asarray(pred_norm))
    mask = (b.target_mask & b.row_mask[:, None]).reshape(-1)
    err = mpjpe(pred.reshape(-1, 17, 3)[mask][:, None], b.gt_3d.reshape(-1, 17, 3)[mask][:, None])
    assert np.isfinite(err)


def test_checkpoint_roundtrip(tmp_path, stack, tiny_cfg):
    from diff3dhpe_tpu.io.checkpoint import (
        restore_checkpoint,
        rng_state_from_json,
        rng_state_to_json,
        save_checkpoint,
    )

    model, diffusion = stack
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 9, 17, 5)), jnp.zeros((1,)))["params"]
    opt = make_optimizer(1e-3, 0.99, 4)
    state = build_train_state(params, opt)

    rng = np.random.default_rng(99)
    rng.standard_normal(10)  # advance
    meta = dict(epoch=3, best_epoch=2, min_loss=1.5,
                shuffle_rng_state=rng_state_to_json(rng))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, meta)

    state2 = build_train_state(
        jax.tree.map(jnp.zeros_like, params), opt
    )
    restored, meta2 = restore_checkpoint(path, state2)
    assert meta2["epoch"] == 3 and meta2["min_loss"] == 1.5
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored["params"] if isinstance(restored, dict) else restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # RNG state round-trips to identical draws
    rng_restored = rng_state_from_json(meta2["shuffle_rng_state"])
    np.testing.assert_array_equal(rng.standard_normal(5), rng_restored.standard_normal(5))


def test_config_loads_reference_json(tmp_path):
    from diff3dhpe_tpu.config import load_config

    cfg = load_config("configs/h36m_gt_s2s_ConditionalDiffusionMixSTES2SGRANDLinLift.json")
    assert cfg.dataset == "h36m" and cfg.out_all and cfg.embed_dim == 512
    assert cfg.timesteps == 1000 and cfg.beta_schedule == "cosine"
    # overrides win; None overrides are ignored; string bools coerce
    cfg2 = load_config(
        "configs/h36m_gt_s2s_ConditionalDiffusionMixSTES2SGRANDLinLift.json",
        dict(embed_dim=64, dataset=None, out_all="False"),
    )
    assert cfg2.embed_dim == 64 and cfg2.dataset == "h36m" and cfg2.out_all is False


def test_remat_train_step_matches_no_remat(stack, tiny_cfg):
    """jax.checkpoint rematerialisation must not change loss or gradients."""
    from diff3dhpe_tpu.engine import make_denoise_fn

    model, _ = stack
    diff_plain = GaussianDiffusion.create(
        make_denoise_fn(model, remat=False), timesteps=20, sampling_timesteps=3,
        clip_denoised=True, beta_schedule="cosine", clip_loss=True, mode="s2s",
    )
    diff_remat = GaussianDiffusion.create(
        make_denoise_fn(model, remat=True), timesteps=20, sampling_timesteps=3,
        clip_denoised=True, beta_schedule="cosine", clip_loss=True, mode="s2s",
    )
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 9, 17, 5)), jnp.zeros((1,)))["params"]
    gt = jax.random.normal(jax.random.PRNGKey(1), (4, 9, 17, 3))
    x2d = jax.random.normal(jax.random.PRNGKey(2), (4, 9, 17, 2))

    def lg(diff):
        return jax.value_and_grad(
            lambda p: diff.training_loss(p, key, gt, x2d, dropout_key=jax.random.PRNGKey(3))
        )(params)

    l1, g1 = lg(diff_plain)
    l2, g2 = lg(diff_remat)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_runner_mixed_precision_eval(synth, tiny_cfg):
    """Config-level mixed-precision fast eval (bf16 trunk + f32 final DDIM
    step + f32 head) builds the split engine and runs under the 8-device
    shard_map eval path."""
    from diff3dhpe_tpu.engine.runner import Runner

    dataset, train_ds, test_ds = synth
    cfg = tiny_cfg.replace(
        fast_eval=True, compute_dtype="bfloat16",
        eval_f32_final_steps=1, eval_f32_head=True,
    )
    runner = Runner(cfg, test_ds.num_joints, test_ds.joints_left,
                    test_ds.joints_right)
    runner.set_params(runner.init_params())
    assert runner.eval_diffusion.final_denoise_fn is not None
    assert runner.eval_diffusion.final_denoise_steps == 1
    b = next(iter(test_ds.batches(8)))
    pred = runner.eval_step(
        runner.state.params, jax.random.PRNGKey(0),
        jnp.asarray(b.input_2d), jnp.asarray(b.input_2d_flip),
    )
    assert pred.shape == (8, 9, 17, 3)
    assert np.isfinite(np.asarray(pred, np.float32)).all()

    # f32-final-steps knob is inert on the f32 fast path (no split engine).
    runner_f32 = Runner(
        tiny_cfg.replace(fast_eval=True, eval_f32_final_steps=1),
        test_ds.num_joints, test_ds.joints_left, test_ds.joints_right,
    )
    assert runner_f32.eval_diffusion.final_denoise_fn is None


def test_block_remat_matches_no_remat(stack, tiny_cfg):
    """Per-BLOCK rematerialisation (MixSTEDenoiser.remat_blocks, the
    remat_mode="block" default) must preserve the param tree, the loss,
    and the gradients of the plain forward — nn.remat is transparent to
    module naming and the dropout rng stream."""
    from diff3dhpe_tpu.engine import make_denoise_fn

    model, _ = stack
    model_blk = model.clone(remat_blocks=True)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 9, 17, 5))
    params = model.init(key, x0, jnp.zeros((1,)))["params"]
    params_blk = model_blk.init(key, x0, jnp.zeros((1,)))["params"]
    assert jax.tree.structure(params) == jax.tree.structure(params_blk)

    gt = jax.random.normal(jax.random.PRNGKey(1), (4, 9, 17, 3))
    x2d = jax.random.normal(jax.random.PRNGKey(2), (4, 9, 17, 2))

    def lg(m):
        diff = GaussianDiffusion.create(
            make_denoise_fn(m), timesteps=20, sampling_timesteps=3,
            clip_denoised=True, beta_schedule="cosine", clip_loss=True,
            mode="s2s",
        )
        return jax.value_and_grad(
            lambda p: diff.training_loss(
                p, key, gt, x2d, dropout_key=jax.random.PRNGKey(3)
            )
        )(params)

    l1, g1 = lg(model)
    l2, g2 = lg(model_blk)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
