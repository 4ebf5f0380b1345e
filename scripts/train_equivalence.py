"""Convergence equivalence: fast_train (fused custom-VJP forward) vs flax.

Trains the SAME tiny synthetic config twice from the same init — once
through the flax path, once through the fused Pallas forward with
XLA-recompute backward — and compares the loss trajectories and final val
MPJPE. The two runs are not bit-identical (drop-path masks come from
different RNG derivations with the same distribution), so the check is
statistical: trajectories track each other and the final quality agrees.

Runs on the virtual CPU mesh by default (tiny config; interpret-mode
kernels):  python scripts/train_equivalence.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("TRAIN_EQ_TPU", "0") != "1":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

EPOCHS = int(os.environ.get("TRAIN_EQ_EPOCHS", "15"))


def run(fast_train: bool):
    from diff3dhpe_tpu.config import Config
    from diff3dhpe_tpu.data import PoseDataset, make_synthetic_h36m_like
    from diff3dhpe_tpu.engine.runner import Runner

    cfg = Config(
        number_of_frames=9, stride=9, embed_dim=64, transformer_depth=2,
        timesteps=50, sampling_timesteps=5, batch_size=16, batch_size_eval=16,
        epochs=EPOCHS, learning_rate=4e-4, subjects_train="S1,S5",
        subjects_test="S9", checkpoint="/tmp/train_eq_ckpt", patience=EPOCHS,
        fast_train=fast_train, drop_path_rate=0.1,
    )
    dataset, kp = make_synthetic_h36m_like(
        subjects=("S1", "S5", "S9"), n_frames=90, seed=0
    )
    train_ds = PoseDataset(cfg, dataset, "data", "train", keypoints_data=kp)
    val_ds = PoseDataset(cfg, dataset, "data", "val", keypoints_data=kp)
    runner = Runner(cfg, train_ds.num_joints, train_ds.joints_left,
                    train_ds.joints_right)
    runner.set_params(runner.init_params())  # same seed -> same init
    fit = runner.fit(train_ds, val_ds)
    return fit


def main():
    flax_fit = run(fast_train=False)
    fast_fit = run(fast_train=True)
    report = {
        "epochs": EPOCHS,
        "flax": dict(losses_train=flax_fit["losses_train"],
                     final_val_mpjpe_mm=flax_fit["min_loss"]),
        "fast_train": dict(losses_train=fast_fit["losses_train"],
                           final_val_mpjpe_mm=fast_fit["min_loss"]),
    }
    lf, lq = flax_fit["losses_train"][-1], fast_fit["losses_train"][-1]
    rel = abs(lq - lf) / max(abs(lf), 1e-9)
    report["final_train_loss_rel_diff"] = rel
    print(json.dumps(report, indent=2))
    assert rel < 0.25, f"trajectories diverged: {lf} vs {lq}"
    print(f"OK: final train loss {lf:.5f} (flax) vs {lq:.5f} (fast_train), "
          f"rel diff {rel:.3f}")


if __name__ == "__main__":
    main()
