"""Training-dynamics equivalence: compute_dtype=float32 vs bfloat16.

VERDICT round-2 Next #5: the 41.9 seq/s/chip bf16 fused training path can
only be *recommended* if its training dynamics match f32 beyond a smoke
test. This script trains the SAME config twice from the SAME init on the
LEARNABLE synthetic task (motion="latent": poses on a fixed low-dim
manifold viewed through shared cameras, so the converged MPJPE measures
the model, not a task floor) — once with compute_dtype=float32, once with
bfloat16 — and reports loss trajectories + final val MPJPE side by side.

Both runs use the fused custom-VJP training forward (fast_train=True,
gradient-identical to flax per tests/test_fast_train.py), so the ONLY
difference between the runs is the activation/GEMM dtype. The reference
trains f32 (reference run.py:312-347); equivalence here is what justifies
recommending the bf16 config for TPU training.

Run on the TPU chip (default backend):  python scripts/dtype_equivalence.py
Knobs: DTEQ_FRAMES, DTEQ_EMBED, DTEQ_DEPTH, DTEQ_EPOCHS, DTEQ_BATCH,
DTEQ_ACTIONS. Each run lands in its own subprocess (clean jit cache and
trace-time dtype), mirroring scripts/accuracy_study.py's design.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAMES = int(os.environ.get("DTEQ_FRAMES", "243"))
EMBED = int(os.environ.get("DTEQ_EMBED", "512"))
DEPTH = int(os.environ.get("DTEQ_DEPTH", "8"))
EPOCHS = int(os.environ.get("DTEQ_EPOCHS", "60"))
BATCH = int(os.environ.get("DTEQ_BATCH", "8"))
N_ACTIONS = int(os.environ.get("DTEQ_ACTIONS", "8"))
OUTDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "dtype_eq_out")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "dtype_equivalence.json")


def run_one(dtype_name: str):
    import time

    from diff3dhpe_tpu.config import Config
    from diff3dhpe_tpu.data import PoseDataset, make_synthetic_h36m_like
    from diff3dhpe_tpu.engine.runner import Runner

    cfg = Config(
        number_of_frames=FRAMES, stride=FRAMES, embed_dim=EMBED,
        transformer_depth=DEPTH, timesteps=1000, sampling_timesteps=5,
        batch_size=BATCH, batch_size_eval=4 * BATCH, epochs=EPOCHS,
        learning_rate=4e-4, subjects_train="S1,S5", subjects_test="S9",
        checkpoint=os.path.join(OUTDIR, f"ckpt_{dtype_name}"),
        checkpoint_frequency=10,
        patience=EPOCHS, fast_train=True, compute_dtype=dtype_name,
        # Per-epoch validation through the fused eval kernels (the flax
        # val eval dominates the epoch otherwise; see accuracy_study.py).
        # Both runs validate through the same path, so the comparison is
        # unaffected.
        fast_eval=True,
        remat=FRAMES > 100,
    )
    dataset, kp = make_synthetic_h36m_like(
        subjects=("S1", "S5", "S9"),
        actions=tuple(f"Act{i} 1" for i in range(N_ACTIONS)),
        n_frames=8 * FRAMES, seed=0, motion="latent",
    )
    train_ds = PoseDataset(cfg, dataset, "data", "train", keypoints_data=kp)
    val_ds = PoseDataset(cfg, dataset, "data", "val", keypoints_data=kp)
    test_ds = PoseDataset(cfg, dataset, "data", "test", keypoints_data=kp)

    runner = Runner(cfg, train_ds.num_joints, train_ds.joints_left,
                    train_ds.joints_right)
    runner.set_params(runner.init_params())  # seed fixed in Config -> same init
    # Wedge protection: the remote-TPU relay can stall mid-run (PERF.md
    # round-3 harness notes); with checkpoint_frequency=10 a restarted run
    # resumes from the newest periodic checkpoint instead of losing hours.
    resume = None
    if os.path.isdir(cfg.checkpoint):
        snaps = sorted(
            (d for d in os.listdir(cfg.checkpoint) if d.startswith("epoch_")),
            key=lambda s: int(s.split("_")[1]),
        )
        if snaps:
            resume = os.path.join(cfg.checkpoint, snaps[-1])
    t0 = time.time()
    fit = runner.fit(train_ds, val_ds, resume=resume)
    train_s = time.time() - t0

    import jax

    m = runner.evaluate(test_ds, key=jax.random.PRNGKey(123))
    n_epochs_run = len(fit["losses_train"])
    report = dict(
        dtype=dtype_name,
        losses_train=[float(v) for v in fit["losses_train"]],
        # Runner._validate returns METERS; report mm like the other fields.
        losses_val_mpjpe_mm=[float(v) * 1000.0 for v in fit.get("losses_valid", [])],
        best_val_mpjpe_mm=float(fit["min_loss"]),
        test_mpjpe_mm=float(m["e1"]),
        test_p_mpjpe_mm=float(m["e2"]),
        train_seconds=round(train_s, 1),
        # Resume-proof throughput basis: wall seconds per epoch actually
        # run this invocation (train_seconds alone covers only post-resume
        # epochs and would distort the f32/bf16 speedup ratio).
        seconds_per_epoch=round(train_s / n_epochs_run, 2) if n_epochs_run else None,
        # Non-None when a relay wedge forced a restart: the loss curves
        # above then cover only the post-resume epochs.
        resumed_from=resume,
    )
    os.makedirs(OUTDIR, exist_ok=True)
    with open(os.path.join(OUTDIR, f"{dtype_name}.json"), "w") as f:
        json.dump(report, f)
    print(f"[{dtype_name}] best val {report['best_val_mpjpe_mm']:.3f} mm, "
          f"test MPJPE {report['test_mpjpe_mm']:.3f} mm, {train_s:.0f}s")


def main():
    only = os.environ.get("DTEQ_DTYPE")
    if only:
        run_one(only)
        return

    for dtype_name in ("float32", "bfloat16"):
        path = os.path.join(OUTDIR, f"{dtype_name}.json")
        if os.environ.get("DTEQ_REUSE", "1") == "1" and os.path.exists(path):
            print(f"reusing {path}")
            continue
        env = dict(os.environ, DTEQ_DTYPE=dtype_name)
        r = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env)
        if r.returncode != 0:
            raise RuntimeError(f"{dtype_name} run failed (rc={r.returncode})")

    runs = {}
    for dtype_name in ("float32", "bfloat16"):
        with open(os.path.join(OUTDIR, f"{dtype_name}.json")) as f:
            runs[dtype_name] = json.load(f)

    f32, bf16 = runs["float32"], runs["bfloat16"]
    # A run that resumed exactly at its final epoch has an empty curve
    # (everything it would report is already in best_/test_ fields).
    lf = f32["losses_train"][-1] if f32["losses_train"] else None
    lb = bf16["losses_train"][-1] if bf16["losses_train"] else None
    spe_f, spe_b = f32.get("seconds_per_epoch"), bf16.get("seconds_per_epoch")
    summary = dict(
        config=dict(frames=FRAMES, embed=EMBED, depth=DEPTH, epochs=EPOCHS,
                    batch=BATCH, actions=N_ACTIONS, motion="latent",
                    fast_train=True),
        runs=runs,
        final_train_loss_rel_diff=(
            abs(lb - lf) / max(abs(lf), 1e-12)
            if lf is not None and lb is not None else None
        ),
        best_val_mpjpe_diff_mm=bf16["best_val_mpjpe_mm"] - f32["best_val_mpjpe_mm"],
        test_mpjpe_diff_mm=bf16["test_mpjpe_mm"] - f32["test_mpjpe_mm"],
        # Per-epoch basis: immune to mid-run resumes shortening train_seconds.
        speedup=(spe_f / spe_b) if spe_f and spe_b else None,
    )
    with open(OUT, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "runs"}, indent=2))


if __name__ == "__main__":
    main()
