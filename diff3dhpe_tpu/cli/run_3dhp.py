"""MPI-INF-3DHP train+eval entry point.

TPU-native equivalent of the reference's run_*_3dhp.py: per-test-sequence
(TS1-TS6) evaluation with valid-frame masking, raw-prediction export to
checkpoint/inference_data.mat (same layout the reference feeds the external
MATLAB evaluator, run_3dhp.py:542-547,631-632), PLUS in-framework PCK@150mm
and AUC so no MATLAB is needed (reference outsources these; thresholds per
the standard mpii_test_predictions protocol).

Note on units: the 3DHP arrays are in millimetres (the reference's 3DHP
MPJPE prints are mm without the x1000 used for H3.6M, run_3dhp.py:561-568).
"""
from __future__ import annotations

import os
import sys

import numpy as np


def main(argv=None):
    from diff3dhpe_tpu.cli.args import args_to_overrides, build_parser
    from diff3dhpe_tpu.config import load_config

    parser = build_parser()
    args = parser.parse_args(argv)
    overrides = args_to_overrides(args)
    overrides.setdefault("dataset", None)
    cfg = load_config(args.config, overrides)
    if cfg.dataset != "3dhp":
        cfg = cfg.replace(dataset="3dhp")
    if args.resume and args.evaluate:
        print("Invalid flags: --resume and --evaluate cannot be set at the same time")
        sys.exit(1)

    import jax

    from diff3dhpe_tpu.data import MPIINF3DHPDataset
    from diff3dhpe_tpu.data.dataset import PoseDataset3DHP
    from diff3dhpe_tpu.data.mpiinf3dhp import JOINTS_LEFT, JOINTS_RIGHT, NUM_JOINTS
    from diff3dhpe_tpu.engine.runner import Runner, RunLogger
    from diff3dhpe_tpu.io.checkpoint import load_torch_model_params, restore_checkpoint
    from diff3dhpe_tpu.metrics import auc as auc_metric
    from diff3dhpe_tpu.metrics import pck as pck_metric

    os.makedirs(cfg.checkpoint, exist_ok=True)
    logger = RunLogger(cfg.checkpoint, enabled=True)

    if args.synthetic:
        from diff3dhpe_tpu.data.synthetic import make_synthetic_3dhp

        dataset = make_synthetic_3dhp(
            subjects_train=cfg.subjects_train.split(","),
            subjects_test=cfg.subjects_test.split(","),
            n_frames=max(4 * cfg.number_of_frames, 100),
            seed=cfg.seed,
        )
    else:
        dataset = MPIINF3DHPDataset(
            cfg.subjects_train, cfg.subjects_test, root_path=cfg.data_root
        )

    print(f"INFO: Receptive field: {cfg.number_of_frames} frames")
    runner = Runner(cfg, NUM_JOINTS, JOINTS_LEFT, JOINTS_RIGHT, logger=logger)
    runner.set_params(runner.init_params())
    n_params = runner.param_count()
    logger.config(
        f"Dataset: 3dhp,\nModel: {cfg.model}\n\nparams={cfg}\n\n\n"
        f"Total Parameters: {n_params}\n\n"
    )
    print(f"INFO: Trainable parameter count: {n_params}")
    print(f"INFO: devices: {jax.device_count()}, mesh: {runner.mesh}")

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

    test_all_ds = PoseDataset3DHP(
        cfg, dataset._test, dataset._pos_3d_min, dataset._pos_3d_max, split="test",
        noise_std=cfg.test_extra_noise_std, joint_drop_rate=cfg.test_joint_drop,
    )

    if not cfg.evaluate:
        train_ds = PoseDataset3DHP(
            cfg, dataset._train, dataset._pos_3d_min, dataset._pos_3d_max,
            split="train", noise_std=cfg.train_extra_noise_std,
            joint_drop_rate=cfg.train_joint_drop,
        )
        # Per-epoch validation on the train sequences without augmentation
        # (reference run_3dhp.py:234-236 — note the reference passes
        # train_extra_noise_std, not train_val_*, for this dataset).
        val_ds = PoseDataset3DHP(
            cfg, dataset._train, dataset._pos_3d_min, dataset._pos_3d_max,
            split="val", noise_std=cfg.train_extra_noise_std,
            joint_drop_rate=cfg.train_joint_drop,
        )
        print(
            f"INFO: Training on {len(train_ds)} windows, validating on "
            f"{len(val_ds)}, testing on {len(test_all_ds)}"
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

    # ------------------------------------------------------------------
    # Per-sequence evaluation (reference run_evaluation:593-627)
    # ------------------------------------------------------------------
    logger.result(
        f"Dataset: 3dhp,\nModel: {cfg.model}\n\nargs={cfg}\n\n\nTotal Parameters: {n_params}\n\n"
    )
    print("Evaluating...")
    data_inference = {}
    errors = {k: [] for k in ("e1", "e2", "e3", "ev")}
    all_pred, all_gt, all_valid = [], [], []
    for seq_name in cfg.subjects_test.split(","):
        if seq_name not in dataset._test.poses_3d:
            continue
        seq_ds = PoseDataset3DHP(
            cfg, dataset._test, dataset._pos_3d_min, dataset._pos_3d_max,
            split="test", noise_std=cfg.test_extra_noise_std,
            joint_drop_rate=cfg.test_joint_drop, seq_filter=seq_name,
        )
        # 3DHP poses are natively mm: unit_scale=1.0 keeps the per-sequence
        # report in true mm (the reference also skips the x1000 here).
        m = runner.evaluate(seq_ds, action=seq_name, unit_scale=1.0)
        for k in errors:
            errors[k].append(m[k])
        preds = m["predictions"]  # [N, 17, 3] (mm), masked+ordered
        data_inference[seq_name] = preds.transpose(2, 1, 0)  # MATLAB layout
        gts = _masked_gt(seq_ds)
        all_pred.append(preds)
        all_gt.append(gts)

    for k in errors:
        avg = round(float(np.mean(errors[k])), 2)
        logger.result(f"{k} sequence-wise average: {avg}mm\n")

    # In-framework PCK/AUC over all test sequences (mm thresholds).
    pred_cat = np.concatenate(all_pred)
    gt_cat = np.concatenate(all_gt)
    pck_v = float(pck_metric(pred_cat, gt_cat, threshold=150.0))
    auc_v = float(auc_metric(pred_cat, gt_cat))
    logger.result(f"PCK@150mm: {pck_v:.2f}%\nAUC: {auc_v:.2f}%\n")

    try:
        import scipy.io as scio

        mat_path = os.path.join(cfg.checkpoint, "inference_data.mat")
        scio.savemat(mat_path, data_inference)
        print(f"Saved raw predictions to {mat_path}")
    except ImportError:
        print("scipy unavailable; skipped inference_data.mat export")
    return dict(errors=errors, pck=pck_v, auc=auc_v)


def _masked_gt(seq_ds):
    """Ground truth frames in the same order/mask the runner's predictions
    use (batches of windows, target-mask filtered)."""
    gts = []
    for b in seq_ds.batches(batch_size=512):
        mask = (b.target_mask & b.row_mask[:, None]).reshape(-1)
        gts.append(b.gt_3d.reshape(-1, b.gt_3d.shape[-2], 3)[mask])
    return np.concatenate(gts)


if __name__ == "__main__":
    main()
