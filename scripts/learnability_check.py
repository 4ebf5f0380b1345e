"""Learnability probe for the latent synthetic task (motion="latent").

Trains a mid-size config with enough optimizer steps to converge and
reports the val/test MPJPE trajectory — the pre-flight for the accuracy
study's operating point (VERDICT round-2 Next #2: the study checkpoint must
land at tens of mm, not the ~954 mm of the unlearnable walk task).

Run on the TPU chip:  python scripts/learnability_check.py
Knobs: LEARN_EPOCHS (80), LEARN_FRAMES (81), LEARN_EMBED (128),
LEARN_DEPTH (4), LEARN_BATCH (32), LEARN_ACTIONS (8).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPOCHS = int(os.environ.get("LEARN_EPOCHS", "80"))
FRAMES = int(os.environ.get("LEARN_FRAMES", "81"))
EMBED = int(os.environ.get("LEARN_EMBED", "128"))
DEPTH = int(os.environ.get("LEARN_DEPTH", "4"))
BATCH = int(os.environ.get("LEARN_BATCH", "32"))
N_ACTIONS = int(os.environ.get("LEARN_ACTIONS", "8"))


def main():
    from diff3dhpe_tpu.config import Config
    from diff3dhpe_tpu.data import PoseDataset, make_synthetic_h36m_like
    from diff3dhpe_tpu.engine.runner import Runner

    cfg = Config(
        number_of_frames=FRAMES, stride=FRAMES, embed_dim=EMBED,
        transformer_depth=DEPTH, timesteps=1000, sampling_timesteps=5,
        batch_size=BATCH, batch_size_eval=4 * BATCH, epochs=EPOCHS,
        learning_rate=4e-4, subjects_train="S1,S5", subjects_test="S9",
        checkpoint="/tmp/learnability_ckpt", patience=EPOCHS,
        fast_train=True, fast_eval=True, remat=FRAMES > 100,
    )
    actions = tuple(f"Act{i} 1" for i in range(N_ACTIONS))
    dataset, kp = make_synthetic_h36m_like(
        subjects=("S1", "S5", "S9"), actions=actions,
        n_frames=16 * FRAMES, seed=0, motion="latent",
    )
    train_ds = PoseDataset(cfg, dataset, "data", "train", keypoints_data=kp)
    val_ds = PoseDataset(cfg, dataset, "data", "val", keypoints_data=kp)
    test_ds = PoseDataset(cfg, dataset, "data", "test", keypoints_data=kp)
    print(f"windows: train={len(train_ds)} val={len(val_ds)} test={len(test_ds)}; "
          f"steps/epoch={len(train_ds) // BATCH}")

    runner = Runner(cfg, train_ds.num_joints, train_ds.joints_left,
                    train_ds.joints_right)
    runner.set_params(runner.init_params())
    t0 = time.time()
    fit = runner.fit(train_ds, val_ds)
    m = runner.evaluate(test_ds)
    print(json.dumps(dict(
        best_val_mpjpe_mm=fit["min_loss"], test_mpjpe_mm=m["e1"],
        epochs_run=len(fit["losses_train"]), wall_s=round(time.time() - t0, 1),
    )))


if __name__ == "__main__":
    main()
