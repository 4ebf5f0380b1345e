"""CLI entry-point smoke tests (in-process, synthetic data, tiny dims)."""
import json
import os

import numpy as np
import pytest


ARGS_COMMON = [
    "--synthetic",
    "-frame", "9", "-s", "9",
    "--embed_dim", "32", "--transformer_depth", "1",
    "--timesteps", "20", "--sampling_timesteps", "3",
    "-e", "1", "-b", "8", "--batch-size-eval", "16",
]


def test_run_h36m_train_eval(tmp_path):
    from diff3dhpe_tpu.cli.run import main

    errors = main(
        ["--config", "configs/h36m_gt_s2s_ConditionalDiffusionMixSTES2SGRANDLinLift.json",
         "-c", str(tmp_path), "-a", "Walking",
         "-str", "S1", "-ste", "S9"] + ARGS_COMMON
    )
    assert errors["e1"] and np.isfinite(errors["e1"][0])
    # run artifacts: config/log/results files + best checkpoint
    files = os.listdir(tmp_path)
    assert any(f.startswith("config_") for f in files)
    assert any(f.startswith("log_") for f in files)
    assert any(f.startswith("results_") for f in files)
    assert "best_epoch" in files


def test_run_h36m_evaluate_checkpoint(tmp_path):
    """--evaluate reloads the checkpoint produced by training."""
    from diff3dhpe_tpu.cli.run import main

    main(["--config", "configs/h36m_gt_s2s_ConditionalDiffusionMixSTES2SGRANDLinLift.json",
          "-c", str(tmp_path), "-a", "Walking", "-str", "S1", "-ste", "S9"] + ARGS_COMMON)
    errors = main(
        ["--config", "configs/h36m_gt_s2s_ConditionalDiffusionMixSTES2SGRANDLinLift.json",
         "-c", str(tmp_path), "-a", "Walking", "-str", "S1", "-ste", "S9",
         "--evaluate", "best_epoch"] + ARGS_COMMON
    )
    assert np.isfinite(errors["e1"][0])


def test_run_3dhp(tmp_path):
    from diff3dhpe_tpu.cli.run_3dhp import main

    out = main(
        ["--config", "configs/3dhp_gt_s2s_ConditionalDiffusionMixSTES2SGRANDLinLift.json",
         "-c", str(tmp_path), "-str", "S1", "-ste", "TS1,TS2",
         "--with_time_emb", "False"] + ARGS_COMMON
    )
    assert 0.0 <= out["pck"] <= 100.0
    assert 0.0 <= out["auc"] <= 100.0
    # Per-sequence errors are native mm (3DHP poses are mm already; a stray
    # m->mm x1000 would land ~1e5-1e6 here). Predictions are clipped to the
    # dataset's pos_3d range, so even an untrained model stays within a few
    # thousand mm of the GT.
    for k, vals in out["errors"].items():
        assert vals and all(0.0 < v < 5e4 for v in vals), (k, vals)
    assert os.path.isfile(os.path.join(tmp_path, "inference_data.mat"))
    # MATLAB-layout export: [3, 17, N] per sequence
    import scipy.io as scio

    mat = scio.loadmat(os.path.join(tmp_path, "inference_data.mat"))
    assert mat["TS1"].shape[0] == 3 and mat["TS1"].shape[1] == 17


def test_viz_cli(tmp_path):
    from diff3dhpe_tpu.cli.viz import main

    out_dir = str(tmp_path / "viz")
    main(["--config", "configs/h36m_gt_s2s_ConditionalDiffusionMixSTES2SGRANDLinLift.json",
          "-str", "S1", "-ste", "S9",
          "--viz-output", out_dir, "--viz-limit", "6", "--viz-chain-samples", "4",
          "--synthetic", "-frame", "9", "-s", "9", "--embed_dim", "32",
          "--transformer_depth", "1", "--timesteps", "20", "--sampling_timesteps", "3",
          "--batch-size-eval", "16"])
    produced = set(os.listdir(out_dir))
    assert {"input_2d.gif", "reconstruction_3d.gif", "forward_diffusion.gif",
            "reverse_diffusion.gif", "reverse_diffusion_steps.png",
            "input_2d_frames.png"} <= produced


def test_resume_roundtrip(tmp_path):
    """Train 2 epochs, resume from the periodic checkpoint, keep training."""
    from diff3dhpe_tpu.cli.run import main

    args = (["--config", "configs/h36m_gt_s2s_ConditionalDiffusionMixSTES2SGRANDLinLift.json",
             "-c", str(tmp_path), "-a", "Walking", "-str", "S1", "-ste", "S9",
             "--checkpoint-frequency", "1"] + ARGS_COMMON)
    main(args)
    assert os.path.isdir(os.path.join(tmp_path, "epoch_0"))
    # Continue for one more epoch from the periodic checkpoint.
    resumed = [a for a in args]
    resumed[resumed.index("-e") + 1] = "2"
    main(resumed + ["--resume", "epoch_0"])


def test_run_humaneva_train_eval(tmp_path):
    """The HumanEva path must run end-to-end: per-subject extrinsics carry
    through world->camera (the reference's HumanEva path crashes — SURVEY.md
    2.1 #14 — and round 1's lacked extrinsics entirely)."""
    from diff3dhpe_tpu.cli.run import main

    errors = main(
        ["--dataset", "humaneva15", "-c", str(tmp_path),
         "-str", "Train/S1", "-ste", "Validate/S1"] + ARGS_COMMON
    )
    assert errors["e1"] and np.isfinite(errors["e1"][0])


def test_viz_video_overlay_and_hypotheses(tmp_path):
    """--viz-video overlays poses on footage frames; repeat_n>1 renders a
    multi-hypothesis animation (reference visualization_ani.py:44-63,71-228
    and the README `-b 4` flow)."""
    from PIL import Image

    from diff3dhpe_tpu.cli.viz import main

    # Tiny synthetic footage GIF standing in for real video (no ffmpeg in
    # the image; read_video handles GIFs and frame directories).
    rng = np.random.default_rng(0)
    frames = [
        Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
        for _ in range(8)
    ]
    video = tmp_path / "footage.gif"
    frames[0].save(video, save_all=True, append_images=frames[1:], duration=40)

    out_dir = str(tmp_path / "viz")
    main(["--config", "configs/h36m_gt_s2s_ConditionalDiffusionMixSTES2SGRANDLinLift.json",
          "-str", "S1", "-ste", "S9",
          "--viz-output", out_dir, "--viz-limit", "6", "--viz-chain-samples", "4",
          "--viz-video", str(video), "--repeat_n", "2",
          "--synthetic", "-frame", "9", "-s", "9", "--embed_dim", "32",
          "--transformer_depth", "1", "--timesteps", "20", "--sampling_timesteps", "3",
          "--batch-size-eval", "16"])
    produced = set(os.listdir(out_dir))
    assert {"video_overlay.gif", "hypotheses_3d.gif"} <= produced


def test_run_s2f_train_eval(tmp_path):
    """seq2frame end-to-end through the CLI: out_all=False composes the s2f
    chunking (pad=(F-1)//2, single-frame targets), the S2F model
    (weighted-mean head), s2f diffusion sampling and the eval masking
    (reference diff_s2f.py:405-410,281 + nosiy_generators.py:162-245)."""
    from diff3dhpe_tpu.cli.run import main

    errors = main(
        ["--config", "configs/h36m_gt_s2s_ConditionalDiffusionMixSTES2SGRANDLinLift.json",
         "-c", str(tmp_path), "-a", "Walking", "-str", "S1", "-ste", "S9",
         "--out_all", "False",
         "--model", "ConditionalDiffusionMixSTES2FGRANDLinLift",
         "--synthetic", "-frame", "9", "-s", "1",  # s2f: one target frame/chunk
         "--embed_dim", "32", "--transformer_depth", "1",
         "--timesteps", "20", "--sampling_timesteps", "3",
         "-e", "1", "-b", "8", "--batch-size-eval", "16",
         "--subset", "0.3"]  # stride-1 windows are plentiful; trim for speed
    )
    assert errors["e1"] and np.isfinite(errors["e1"][0])
    files = os.listdir(tmp_path)
    assert any(f.startswith("results_") for f in files)


def test_run_tpu_recommended_config(tmp_path):
    """The TPU-recommended flagship config (num_heads 4, bf16 fast-train,
    mixed-precision fast-eval) trains and evaluates end-to-end; shape knobs
    shrunk for the CPU mesh, the path/precision knobs kept as shipped."""
    from diff3dhpe_tpu.cli.run import main
    from diff3dhpe_tpu.config import load_config

    cfg = load_config("configs/h36m_gt_s2s_243f_tpu.json")
    assert cfg.num_heads == 4 and cfg.compute_dtype == "bfloat16"
    assert cfg.fast_train and cfg.fast_eval
    assert cfg.eval_f32_final_steps == 1 and cfg.eval_f32_head
    assert cfg.eval_final_prec == "high3"
    assert cfg.remat and cfg.remat_mode == "block"
    assert cfg.matmul_precision == "default"

    errors = main(
        ["--config", "configs/h36m_gt_s2s_243f_tpu.json",
         "-c", str(tmp_path), "-a", "Walking",
         "-str", "S1", "-ste", "S9", "--num-heads", "4"] + ARGS_COMMON
    )
    assert errors["e1"] and np.isfinite(errors["e1"][0])
    assert "best_epoch" in os.listdir(tmp_path)
