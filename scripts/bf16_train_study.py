"""bf16 TRAINING dynamics: same-init f32 vs bf16 runs to convergence.

VERDICT round-2 Next #5: the 41.9 seq/s bf16 fused-train path existed with
only a 15-epoch smoke behind it. This study trains the SAME init on the
LEARNABLE synthetic task (motion="latent", converged MPJPE in the tens of
mm) through the fused custom-VJP forward at f32 and at bf16, and compares
the loss trajectories and the final validation/test MPJPE. The reference
trains f32 (run.py:312-347), so f32 remains the default; bf16+fast_train is
promoted to a RECOMMENDED config iff the curves and final quality agree.

Run on the TPU chip:  python scripts/bf16_train_study.py
Knobs: BF16_EPOCHS (60), BF16_FRAMES (81), BF16_EMBED (256), BF16_DEPTH (6),
BF16_BATCH (32). Writes scripts/bf16_train_study.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPOCHS = int(os.environ.get("BF16_EPOCHS", "60"))
FRAMES = int(os.environ.get("BF16_FRAMES", "81"))
EMBED = int(os.environ.get("BF16_EMBED", "256"))
DEPTH = int(os.environ.get("BF16_DEPTH", "6"))
BATCH = int(os.environ.get("BF16_BATCH", "32"))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bf16_train_study.json")


def run(compute_dtype: str):
    """One training run; returns (fit dict, test MPJPE mm, wall seconds).

    Each run executes in its own subprocess (see main) so the jit caches and
    trace-time dtypes cannot bleed between variants.
    """
    from diff3dhpe_tpu.config import Config
    from diff3dhpe_tpu.data import PoseDataset, make_synthetic_h36m_like
    from diff3dhpe_tpu.engine.runner import Runner

    cfg = Config(
        number_of_frames=FRAMES, stride=FRAMES, embed_dim=EMBED,
        transformer_depth=DEPTH, timesteps=1000, sampling_timesteps=5,
        batch_size=BATCH, batch_size_eval=BATCH, epochs=EPOCHS,
        learning_rate=4e-4, subjects_train="S1,S5", subjects_test="S9",
        checkpoint=f"/tmp/bf16_study_{compute_dtype}", patience=EPOCHS,
        fast_train=True, fast_eval=True, drop_path_rate=0.1,
        compute_dtype=compute_dtype, remat=FRAMES > 100,
    )
    dataset, kp = make_synthetic_h36m_like(
        subjects=("S1", "S5", "S9"), n_frames=16 * FRAMES, seed=0, motion="latent"
    )
    train_ds = PoseDataset(cfg, dataset, "data", "train", keypoints_data=kp)
    val_ds = PoseDataset(cfg, dataset, "data", "val", keypoints_data=kp)
    test_ds = PoseDataset(cfg, dataset, "data", "test", keypoints_data=kp)
    runner = Runner(cfg, train_ds.num_joints, train_ds.joints_left,
                    train_ds.joints_right)
    runner.set_params(runner.init_params())  # same cfg.seed -> same init
    t0 = time.time()
    fit = runner.fit(train_ds, val_ds)
    wall = time.time() - t0
    m = runner.evaluate(test_ds)
    return fit, m["e1"], wall


def main():
    only = os.environ.get("BF16_VARIANT")
    outdir = os.path.join(os.path.dirname(OUT), "study_out")
    os.makedirs(outdir, exist_ok=True)
    if only:
        fit, test_mpjpe, wall = run(only)
        with open(os.path.join(outdir, f"bf16_{only}.json"), "w") as f:
            json.dump(dict(losses_train=fit["losses_train"],
                           losses_valid=fit["losses_valid"],
                           min_loss=fit["min_loss"], test_mpjpe=test_mpjpe,
                           wall_s=wall), f)
        return

    import subprocess
    for dtype in ("float32", "bfloat16"):
        env = dict(os.environ, BF16_VARIANT=dtype)
        r = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env)
        if r.returncode != 0:
            raise RuntimeError(f"variant {dtype} failed (rc={r.returncode})")

    res = {}
    for dtype in ("float32", "bfloat16"):
        with open(os.path.join(outdir, f"bf16_{dtype}.json")) as f:
            res[dtype] = json.load(f)

    lf = res["float32"]["losses_train"]
    lb = res["bfloat16"]["losses_train"]
    n = min(len(lf), len(lb))
    # Trajectory agreement over the back half (past the noisy warm-up).
    half = n // 2
    rel_curve = [abs(a - b) / max(abs(a), 1e-9)
                 for a, b in zip(lf[half:n], lb[half:n])]
    report = {
        "config": dict(frames=FRAMES, embed=EMBED, depth=DEPTH, batch=BATCH,
                       epochs=EPOCHS, motion="latent", fast_train=True),
        "float32": dict(final_train_loss=lf[-1],
                        best_val_mpjpe_mm=res["float32"]["min_loss"],
                        test_mpjpe_mm=res["float32"]["test_mpjpe"],
                        wall_s=round(res["float32"]["wall_s"], 1)),
        "bfloat16": dict(final_train_loss=lb[-1],
                         best_val_mpjpe_mm=res["bfloat16"]["min_loss"],
                         test_mpjpe_mm=res["bfloat16"]["test_mpjpe"],
                         wall_s=round(res["bfloat16"]["wall_s"], 1)),
        "final_train_loss_rel_diff": abs(lf[-1] - lb[-1]) / max(abs(lf[-1]), 1e-9),
        "mean_back_half_loss_rel_diff": sum(rel_curve) / max(len(rel_curve), 1),
        "val_mpjpe_diff_mm": res["bfloat16"]["min_loss"] - res["float32"]["min_loss"],
        "test_mpjpe_diff_mm": res["bfloat16"]["test_mpjpe"] - res["float32"]["test_mpjpe"],
        "losses_train": dict(float32=lf, bfloat16=lb),
    }
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "losses_train"},
                     indent=2))


if __name__ == "__main__":
    main()
