"""Real-data evidence chain, end-to-end in miniature (VERDICT round-2 #1).

The H3.6M archives and released .bin checkpoints are not in this image, but
the exact chain that will consume them must work first try the day they
land. Two tests prove it:

1. prepare -> load -> eval: a fabricated tiny H3.6M-format zip archive is
   driven through ``prepare_h36m.main`` (the real CLI), loaded by
   ``Human36mDataset`` (the real npz constructor, data/h36m.py) inside
   ``cli/run.py``, trained for one epoch and re-evaluated with
   ``--evaluate`` — the same commands a user runs on the real archive.
2. released-checkpoint conversion: a full reference-style checkpoint is
   produced by the ACTUAL torch reference (GaussianDiffusion wrapping
   MixSTE, DataParallel 'module.' prefixes, schedule buffers, optimizer
   state, the generator's np.RandomState object — exactly the dict
   reference run.py:446-479 saves), then converted by
   ``load_torch_model_params`` and checked against the torch
   ``forward_denoise`` to <=1e-4.
"""
import os
import sys

import numpy as np
import pytest

from conftest import has_reference

from test_prepare_h36m import _make_fake_archive


def test_prepare_to_cli_eval_chain(tmp_path):
    """Archive -> prepare_h36m CLI -> Human36mDataset -> cli/run train ->
    cli/run --evaluate, as one chain on real (fabricated) npz files."""
    h5py = pytest.importorskip("h5py")
    from diff3dhpe_tpu.cli.run import main as run_main
    from diff3dhpe_tpu.data.prepare_h36m import main as prepare_main

    archive = str(tmp_path / "h36m.zip")
    _make_fake_archive(archive, n_frames=20)
    data_dir = str(tmp_path / "data")
    prepare_main(["--from-archive", archive, "--out-dir", data_dir])
    assert os.path.isfile(os.path.join(data_dir, "data_3d_h36m.npz"))
    assert os.path.isfile(os.path.join(data_dir, "data_2d_h36m_gt.npz"))

    ckpt_dir = str(tmp_path / "ckpt")
    args = [
        "--config", "configs/h36m_gt_s2s_ConditionalDiffusionMixSTES2SGRANDLinLift.json",
        "--data-root", data_dir, "-c", ckpt_dir,
        "-str", "S1", "-ste", "S9", "-a", "Walking",
        "-frame", "9", "-s", "9",
        "--embed_dim", "32", "--transformer_depth", "1",
        "--timesteps", "20", "--sampling_timesteps", "2",
        "-e", "1", "-b", "8", "--batch-size-eval", "16",
    ]
    errors = run_main(args)  # NO --synthetic: the real npz loading path
    assert errors["e1"] and np.isfinite(errors["e1"][0])
    assert os.path.isdir(os.path.join(ckpt_dir, "best_epoch"))

    errors_eval = run_main(args + ["--evaluate", "best_epoch"])
    assert np.isfinite(errors_eval["e1"][0])


def test_published_eval_table_in_miniature(tmp_path):
    """scripts/published_eval.py (the production one-command table) drives
    a published row end-to-end on the fabricated archive: prepare -> train a
    tiny checkpoint -> table row with achieved/published/delta; missing
    checkpoints are reported, not fatal."""
    pytest.importorskip("h5py")
    import shutil

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import published_eval

    from diff3dhpe_tpu.cli.run import main as run_main
    from diff3dhpe_tpu.data.prepare_h36m import main as prepare_main

    archive = str(tmp_path / "h36m.zip")
    _make_fake_archive(archive, n_frames=20)
    data_dir = str(tmp_path / "data")
    prepare_main(["--from-archive", archive, "--out-dir", data_dir])

    tiny = [
        "-str", "S1", "-ste", "S9", "-a", "Walking",
        "--number-of-frames", "9", "--stride", "9",
        "--embed_dim", "32", "--transformer_depth", "1",
        "--timesteps", "20", "--sampling_timesteps", "2",
        "--batch-size-eval", "16",
    ]
    train_ckpt = str(tmp_path / "train_ckpt")
    run_main([
        "--config", "configs/h36m_gt_s2s_ConditionalDiffusionMixSTES2SGRANDLinLift.json",
        "--data-root", data_dir, "-c", train_ckpt, "-e", "1", "-b", "8", *tiny,
    ])

    ckpt_dir = str(tmp_path / "released")
    os.makedirs(os.path.join(ckpt_dir, "h36m_gt_81"))
    shutil.copytree(os.path.join(train_ckpt, "best_epoch"),
                    os.path.join(ckpt_dir, "h36m_gt_81", "best_epoch"))

    table = published_eval.main([
        "--data-root", data_dir, "--ckpt-dir", ckpt_dir,
        "--out", str(tmp_path / "published_eval.json"),
        "--rows", "h36m_gt_81,h36m_gt_243", "--ddim", "2", *tiny,
    ])
    row = table["h36m_gt_81"]
    assert row["status"] == "ok"
    assert np.isfinite(row["achieved"]["mpjpe_mm"])
    assert row["delta_vs_published"]["mpjpe_mm"] == pytest.approx(
        row["achieved"]["mpjpe_mm"] - 24.2, abs=1e-6
    )
    # The 243f row has no checkpoint here: reported, not fatal.
    assert table["h36m_gt_243"]["status"] == "missing_checkpoint"


@pytest.mark.skipif(not has_reference(), reason="reference tree not available")
def test_reference_saved_checkpoint_converts_and_matches(tmp_path):
    """A checkpoint saved EXACTLY as the reference saves it (run.py:446-479:
    DataParallel state dict with 'module.' prefixes and alphas* schedule
    buffers, AdamW optimizer state, np.RandomState object) must convert via
    load_torch_model_params and reproduce the torch forward_denoise."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from test_model import _import_reference_models

    from diff3dhpe_tpu.io.checkpoint import load_torch_model_params
    from diff3dhpe_tpu.models import MixSTEDenoiser

    S2S, _ = _import_reference_models()
    sys.path.insert(0, "/root/reference")
    from common.conditional_diffusion_ddim_normal_directPredict_variableLoss_both_crossFrames import (  # noqa: E501
        GaussianDiffusion as RefGaussianDiffusion,
    )

    torch.manual_seed(0)
    F, J, C, depth = 9, 17, 64, 2
    model_pos = S2S(
        num_frame=F, num_joints=J, in_chans=2, embed_dim=C, depth=depth,
        num_heads=8, mlp_ratio=2.0, qkv_bias=True, qk_scale=None,
        drop_path_rate=0.1, with_time_emb=True,
    )
    model_diffusion = torch.nn.DataParallel(
        RefGaussianDiffusion(
            model=model_pos, timesteps=20, sampling_timesteps=2,
            loss_type="l2", clip_denoised=True, beta_schedule="cosine",
            ddim_sampling_eta=0.0, clipLoss=True,
        )
    )

    # One real AdamW step so the optimizer state dict is non-trivial and
    # the saved weights differ from init (as a trained checkpoint's would).
    optimizer = torch.optim.AdamW(model_pos.parameters(), lr=4e-4, weight_decay=0.1)
    clean = torch.randn(2, F, J, 3)
    noisy2d = torch.randn(2, F, J, 2)
    model_diffusion.train()
    loss, _ = model_diffusion(clean, noisy2d)  # training forward -> (loss, None)
    loss.mean().backward()
    optimizer.step()

    chk_path = str(tmp_path / "best_epoch.bin")
    torch.save({
        "epoch": 7,
        "best_epoch": 7,
        "min_loss": 123.4,
        "min_train_loss": 0.01,
        "lr": 4e-4 * 0.99 ** 7,
        "random_state": np.random.RandomState(7),  # the RNG OBJECT, as run.py saves
        "optimizer": optimizer.state_dict(),
        "model_diffusion": model_diffusion.state_dict(),
    }, chk_path)

    # Format fixture: the saved dict really carries the reference's quirks.
    saved = torch.load(chk_path, map_location="cpu", weights_only=False)
    keys = list(saved["model_diffusion"].keys())
    assert any(k.startswith("module.model.STEblocks.0.") for k in keys)
    assert any("alphas" in k for k in keys)  # schedule buffers ride along
    assert isinstance(saved["random_state"], np.random.RandomState)

    params = load_torch_model_params(chk_path, depth=depth, with_time_emb=True, mode="s2s")

    flax_model = MixSTEDenoiser(
        num_frame=F, num_joints=J, in_chans=2, embed_dim=C, depth=depth,
        num_heads=8, mlp_ratio=2.0, qkv_bias=True,
        drop_path_rate=0.1, with_time_emb=True, mode="s2s",
    )
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, F, J, 5)).astype(np.float32)
    t = np.array([0.0, 9.0, 19.0], dtype=np.float32)
    model_diffusion.eval()
    with torch.no_grad():
        ref_out = model_diffusion.module.model.forward_denoise(
            torch.from_numpy(x), torch.from_numpy(t)
        ).numpy()
    ours = np.asarray(
        flax_model.apply({"params": params}, jnp.asarray(x), jnp.asarray(t))
    )
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-4)
