"""Training-quality equivalence: num_heads=8 (reference geometry) vs
num_heads=4 (head_dim-128 TPU geometry).

PERF.md's irreducibility proof ends at "further gains require head_dim
128"; the bench sweep then measured that geometry at +8.8% bf16 / +12.6%
f32 eval throughput. But 4x128 attention is a DIFFERENT model function
from the reference's 8x64 — it can only be recommended if a model trained
with it reaches the same converged MPJPE. This script trains the
flagship-shaped config twice on the LEARNABLE synthetic task
(motion="latent", the same protocol as scripts/dtype_equivalence.py) —
once per head count — and reports converged val/test MPJPE and wall-clock
side by side.

Both legs use the recommended TPU training config (fast_train=True,
compute_dtype=bfloat16 — validated equivalent to f32 in
scripts/dtype_equivalence.json), so the ONLY difference between the legs
is the attention head geometry. The param count is identical (head count
does not change any weight shape); the init draw differs only through the
head-dim-dependent attention scale at trace time, not through shapes.

Run on the TPU chip (default backend), ideally under the watchdog:
  scripts/tpu_watchdog.sh /tmp/headgeom.log 600 4 python scripts/head_geometry_study.py
Knobs: HGEO_FRAMES, HGEO_EMBED, HGEO_DEPTH, HGEO_EPOCHS, HGEO_BATCH,
HGEO_ACTIONS, HGEO_DTYPE. Each leg runs in its own subprocess (clean jit
cache), resumes from its periodic checkpoints after a relay-wedge restart,
and is skipped entirely if its per-leg JSON already exists (HGEO_REUSE=0
disables the reuse).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAMES = int(os.environ.get("HGEO_FRAMES", "243"))
EMBED = int(os.environ.get("HGEO_EMBED", "512"))
DEPTH = int(os.environ.get("HGEO_DEPTH", "8"))
EPOCHS = int(os.environ.get("HGEO_EPOCHS", "60"))
BATCH = int(os.environ.get("HGEO_BATCH", "8"))
N_ACTIONS = int(os.environ.get("HGEO_ACTIONS", "8"))
DTYPE = os.environ.get("HGEO_DTYPE", "bfloat16")
HEAD_COUNTS = (8, 4)
OUTDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "head_geom_out")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "head_geometry_study.json")


def run_one(heads: int):
    import time

    from diff3dhpe_tpu.config import Config
    from diff3dhpe_tpu.data import PoseDataset, make_synthetic_h36m_like
    from diff3dhpe_tpu.engine.runner import Runner

    cfg = Config(
        number_of_frames=FRAMES, stride=FRAMES, embed_dim=EMBED,
        transformer_depth=DEPTH, num_heads=heads, timesteps=1000,
        sampling_timesteps=5, batch_size=BATCH, batch_size_eval=4 * BATCH,
        epochs=EPOCHS, learning_rate=4e-4,
        subjects_train="S1,S5", subjects_test="S9",
        checkpoint=os.path.join(OUTDIR, f"ckpt_h{heads}"),
        checkpoint_frequency=10,
        patience=EPOCHS, fast_train=True, fast_eval=True,
        compute_dtype=DTYPE, remat=FRAMES > 100,
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
    runner.set_params(runner.init_params())
    # Wedge protection (PERF.md round-3): resume from the newest periodic
    # checkpoint if a relay stall killed a previous invocation mid-run.
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
        num_heads=heads,
        head_dim=EMBED // heads,
        dtype=DTYPE,
        param_count=runner.param_count(),
        losses_train=[float(v) for v in fit["losses_train"]],
        losses_val_mpjpe_mm=[float(v) * 1000.0 for v in fit.get("losses_valid", [])],
        best_val_mpjpe_mm=float(fit["min_loss"]),
        test_mpjpe_mm=float(m["e1"]),
        test_p_mpjpe_mm=float(m["e2"]),
        train_seconds=round(train_s, 1),
        seconds_per_epoch=round(train_s / n_epochs_run, 2) if n_epochs_run else None,
        resumed_from=resume,
    )
    os.makedirs(OUTDIR, exist_ok=True)
    with open(os.path.join(OUTDIR, f"h{heads}.json"), "w") as f:
        json.dump(report, f)
    print(f"[heads={heads}] best val {report['best_val_mpjpe_mm']:.3f} mm, "
          f"test MPJPE {report['test_mpjpe_mm']:.3f} mm, {train_s:.0f}s")


def main():
    only = os.environ.get("HGEO_HEADS")
    if only:
        run_one(int(only))
        return

    for heads in HEAD_COUNTS:
        path = os.path.join(OUTDIR, f"h{heads}.json")
        if os.environ.get("HGEO_REUSE", "1") == "1" and os.path.exists(path):
            print(f"reusing {path}")
            continue
        env = dict(os.environ, HGEO_HEADS=str(heads))
        r = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env)
        if r.returncode != 0:
            raise RuntimeError(f"heads={heads} run failed (rc={r.returncode})")

    runs = {}
    for heads in HEAD_COUNTS:
        with open(os.path.join(OUTDIR, f"h{heads}.json")) as f:
            runs[f"h{heads}"] = json.load(f)

    h8, h4 = runs["h8"], runs["h4"]
    spe8, spe4 = h8.get("seconds_per_epoch"), h4.get("seconds_per_epoch")
    summary = dict(
        config=dict(frames=FRAMES, embed=EMBED, depth=DEPTH, epochs=EPOCHS,
                    batch=BATCH, actions=N_ACTIONS, motion="latent",
                    fast_train=True, compute_dtype=DTYPE),
        runs=runs,
        best_val_mpjpe_diff_mm=h4["best_val_mpjpe_mm"] - h8["best_val_mpjpe_mm"],
        test_mpjpe_diff_mm=h4["test_mpjpe_mm"] - h8["test_mpjpe_mm"],
        train_speedup_h4=(spe8 / spe4) if spe8 and spe4 else None,
    )
    with open(OUT, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "runs"}, indent=2))


if __name__ == "__main__":
    main()
