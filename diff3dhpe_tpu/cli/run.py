"""H3.6M / HumanEva / custom train+eval entry point.

TPU-native equivalent of the reference's run_conditionalDiffusionDDIM3dhpe
NormalDirectPredictVariableLoss.py: config merge, dataset/model/diffusion
construction, training with per-epoch flip-TTA validation, checkpointing,
and the final per-action evaluation protocol.

Usage (reference command lines work with the module path swapped):
    python -m diff3dhpe_tpu.cli.run --config configs/h36m_gt_s2s_....json \
        [--evaluate <ckpt>] [--resume <ckpt>] [overrides...]
    python -m diff3dhpe_tpu.cli.run --synthetic ...   # no dataset needed
"""
from __future__ import annotations

import os
import sys

import numpy as np


def main(argv=None):
    from diff3dhpe_tpu.cli.args import args_to_overrides, build_parser
    from diff3dhpe_tpu.config import load_config

    args = build_parser().parse_args(argv)
    cfg = load_config(args.config, args_to_overrides(args))
    if args.resume and args.evaluate:
        print("Invalid flags: --resume and --evaluate cannot be set at the same time")
        sys.exit(1)

    import jax

    from diff3dhpe_tpu.data import PoseDataset, Human36mDataset, make_synthetic_h36m_like
    from diff3dhpe_tpu.engine.runner import Runner, RunLogger
    from diff3dhpe_tpu.io.checkpoint import load_torch_model_params, restore_checkpoint

    os.makedirs(cfg.checkpoint, exist_ok=True)
    logger = RunLogger(cfg.checkpoint, enabled=True)

    # ------------------------------------------------------------------
    # Dataset
    # ------------------------------------------------------------------
    keypoints_data = None
    all_subjects = tuple(
        dict.fromkeys(cfg.subjects_train.split(",") + cfg.subjects_test.split(","))
    )
    if args.synthetic and cfg.dataset.startswith("humaneva"):
        from diff3dhpe_tpu.data.synthetic import make_synthetic_humaneva

        dataset, keypoints_data = make_synthetic_humaneva(
            subjects=all_subjects,
            n_frames=max(4 * cfg.number_of_frames, 100),
            seed=cfg.seed,
        )
    elif args.synthetic:
        dataset, keypoints_data = make_synthetic_h36m_like(
            subjects=all_subjects,
            n_frames=max(4 * cfg.number_of_frames, 100),
            seed=cfg.seed,
            motion=getattr(args, "synthetic_motion", "walk"),
        )
    elif cfg.dataset == "h36m":
        dataset = Human36mDataset(f"{cfg.data_root}/data_3d_{cfg.dataset}.npz")
    elif cfg.dataset.startswith("humaneva"):
        from diff3dhpe_tpu.data.humaneva import HumanEvaDataset

        dataset = HumanEvaDataset(f"{cfg.data_root}/data_3d_{cfg.dataset}.npz")
    elif cfg.dataset.startswith("custom"):
        from diff3dhpe_tpu.data.custom import CustomDataset

        dataset = CustomDataset(
            f"{cfg.data_root}/data_2d_{cfg.dataset}_{cfg.keypoints}.npz"
        )
    else:
        raise KeyError("Invalid dataset")

    print(f"INFO: Receptive field: {cfg.number_of_frames} frames")
    logger.log(f"INFO: Receptive field: {cfg.number_of_frames} frames\n")

    test_ds = PoseDataset(
        cfg, dataset, cfg.data_root, "test",
        noise_std=cfg.test_extra_noise_std, joint_drop_rate=cfg.test_joint_drop,
        keypoints_data=keypoints_data,
    )
    num_joints = test_ds.num_joints
    joints_left = list(dataset.skeleton().joints_left())
    joints_right = list(dataset.skeleton().joints_right())

    runner = Runner(cfg, num_joints, joints_left, joints_right, logger=logger)
    runner.set_params(runner.init_params())
    n_params = runner.param_count()
    print(f"INFO: Trainable parameter count: {n_params}")

    # Params | FLOPs printout (reference run.py:195-200, thop-equivalent).
    from diff3dhpe_tpu.utils.profiling import clever_format, flops_of

    import jax.numpy as jnp

    flops = flops_of(
        lambda p, x, t: runner.model.apply({"params": p}, x, t, deterministic=True),
        runner.state.params,
        jnp.zeros((1, cfg.number_of_frames, num_joints, 5)),
        jnp.zeros((1,)),
    )
    print("Params | FLOPs/forward")
    print("---|---")
    print(f"{clever_format(n_params)} | {clever_format(flops)}")
    logger.config(
        f"Dataset: {cfg.dataset},\nModel: {cfg.model}\n\nparams={cfg}\n\n\n"
        f"Total Parameters: {n_params}\n\n"
    )
    print(f"INFO: devices: {jax.device_count()}, mesh: {runner.mesh}")

    # ------------------------------------------------------------------
    # Optional weight loading (torch .bin or orbax dir)
    # ------------------------------------------------------------------
    def load_weights(path):
        if path.endswith(".bin"):
            params = load_torch_model_params(
                path, depth=cfg.transformer_depth,
                with_time_emb=cfg.with_time_emb,
                mode="s2s" if cfg.out_all else "s2f",
            )
            runner.set_params(params)
        else:
            state, _ = restore_checkpoint(path, runner.state)
            runner.state = state
        print(f"Loaded checkpoint {path}")

    if cfg.evaluate:
        load_weights(os.path.join(cfg.checkpoint, cfg.evaluate)
                     if not os.path.exists(cfg.evaluate) else cfg.evaluate)
    elif cfg.pretrained_model:
        load_weights(cfg.pretrained_model)

    # ------------------------------------------------------------------
    # Training
    # ------------------------------------------------------------------
    if not cfg.evaluate:
        train_ds = PoseDataset(
            cfg, dataset, cfg.data_root, "train",
            noise_std=cfg.train_extra_noise_std, joint_drop_rate=cfg.train_joint_drop,
            keypoints_data=keypoints_data,
        )
        # Per-epoch validation split: train subjects, no augmentation, its
        # own corruption knobs (reference run.py:278-284).
        val_ds = PoseDataset(
            cfg, dataset, cfg.data_root, "val",
            noise_std=cfg.train_val_extra_noise_std,
            joint_drop_rate=cfg.train_val_joint_drop,
            keypoints_data=keypoints_data,
        )
        print(
            f"INFO: Training on {len(train_ds)} windows, validating on "
            f"{len(val_ds)}, testing on {len(test_ds)}"
        )
        resume_path = (
            os.path.join(cfg.checkpoint, cfg.resume)
            if cfg.resume and not os.path.exists(cfg.resume)
            else (cfg.resume or None)
        )
        result = runner.fit(train_ds, val_ds, resume=resume_path)
        if result["best_path"]:
            state, _ = restore_checkpoint(result["best_path"], runner.state)
            runner.state = state
            logger.log(f"Loaded the best model from {result['best_path']}\n")

    # ------------------------------------------------------------------
    # Final per-action evaluation (reference run_evaluation:712-766)
    # ------------------------------------------------------------------
    logger.result(
        f"Dataset: {cfg.dataset},\nModel: {cfg.model}\n\nargs={cfg}\n\n\n"
        f"Total Parameters: {n_params}\n\n"
    )
    print("Evaluating...")

    subjects_test = cfg.subjects_test.split(",")
    all_actions = {}
    for subject in subjects_test:
        for action in dataset[subject].keys():
            all_actions.setdefault(action.split(" ")[0], []).append((subject, action))

    action_filter = None if cfg.actions == "*" else cfg.actions.split(",")

    frames, times = [], []
    errors = {k: [] for k in ("e1", "e2", "e3", "ev")}
    for action_key in all_actions:
        if action_filter is not None and not any(
            action_key.startswith(a) for a in action_filter
        ):
            continue
        action_ds = PoseDataset(
            cfg, dataset, cfg.data_root, "test", action_filter=[action_key],
            noise_std=cfg.test_extra_noise_std, joint_drop_rate=cfg.test_joint_drop,
            keypoints_data=keypoints_data,
        )
        m = runner.evaluate(action_ds, action=action_key)
        frames.append(m["n_frames"])
        times.append(m["model_time"])
        for k in errors:
            errors[k].append(m[k])

    total_frames, total_time = np.sum(frames), np.sum(times)
    summary = (
        f"Total eval_frame: {total_frames}\n"
        f"Total inference_time: {total_time / 60}min\n"
        f"inference_speed: {total_frames / total_time if total_time else float('inf')}frame/s\n"
        f"Protocol #1   (MPJPE) action-wise average: {round(np.mean(errors['e1']), 1)}mm\n"
        f"Protocol #2 (P-MPJPE) action-wise average: {round(np.mean(errors['e2']), 1)}mm\n"
        f"Protocol #3 (N-MPJPE) action-wise average: {round(np.mean(errors['e3']), 1)}mm\n"
        f"Velocity      (MPJVE) action-wise average: {round(np.mean(errors['ev']), 2)}mm\n"
    )
    logger.result(summary)
    return errors


if __name__ == "__main__":
    main()
