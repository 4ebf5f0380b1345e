"""Localise WHERE bf16 eval error enters the DDIM trajectory (VERDICT r3 #1).

On the accuracy study's trained flagship-shape weights (scripts/study_ckpt,
train_done-certified), this probe measures, on a fixed test batch with
identical x_T:

  1. matched-input per-step forward error: feed the f32 fused trajectory's
     x_t into the bf16 fused forward at every DDIM step and record
     ‖x̂0_bf16 − x̂0_f32‖ (mm) — the per-forward numeric error, free of
     compounding;
  2. trajectory per-step error: the full bf16 DDIM chain's x̂0 vs the f32
     chain's at each step — shows how much error COMPOUNDS through the
     trajectory vs. is re-contracted by the denoiser;
  3. both of the above for the f32-head variant (bf16 trunk, f32 head
     epilogue) — isolating the final output-rounding share.

The decision these numbers feed: whether finishing with one f32 step
(Config.eval_f32_final_steps=1) suffices to pass the accuracy gate — if
the denoiser is strongly contractive, trajectory error stays ~the matched-
input error and one f32 final step recovers almost everything.

Legs run in separate subprocesses (clean jit caches / trace-time env);
results accumulate in scripts/bf16_localise_out/ and combine into
scripts/bf16_localise.json. Run via the watchdog after the accuracy study
finishes training:

  bash scripts/tpu_watchdog.sh /tmp/bf16_localise.log 2400 4 \
      python scripts/bf16_localise.py
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAMES = int(os.environ.get("STUDY_FRAMES", "243"))
EMBED = int(os.environ.get("STUDY_EMBED", "512"))
DEPTH = int(os.environ.get("STUDY_DEPTH", "8"))
BATCH = int(os.environ.get("STUDY_BATCH", "8"))
N_ACTIONS = int(os.environ.get("STUDY_ACTIONS", "8"))
DDIM = int(os.environ.get("STUDY_DDIM", "9"))
HERE = os.path.dirname(os.path.abspath(__file__))
CKPT = os.path.join(HERE, "study_ckpt")
OUTDIR = os.path.join(HERE, "bf16_localise_out")
OUT = os.path.join(HERE, "bf16_localise.json")


def build(fast_dtype_name: str | None, f32_head: bool = False):
    """(runner-less) engine + params + fixed batch, mirroring the accuracy
    study's config/dataset; fast_dtype_name None = flax parity path."""
    import jax
    import jax.numpy as jnp

    from diff3dhpe_tpu.config import Config
    from diff3dhpe_tpu.data import PoseDataset, make_synthetic_h36m_like
    from diff3dhpe_tpu.diffusion import GaussianDiffusion
    from diff3dhpe_tpu.engine.steps import make_fast_denoise_fn
    from diff3dhpe_tpu.io.checkpoint import restore_checkpoint
    from diff3dhpe_tpu.models import HPE_model

    if not os.path.isfile(os.path.join(CKPT, "train_done.json")):
        raise SystemExit(
            f"{CKPT} has no train_done.json — run scripts/accuracy_study.py "
            "to completion first (a bare best_epoch may be half-trained)."
        )

    cfg = Config(
        number_of_frames=FRAMES, stride=FRAMES, embed_dim=EMBED,
        transformer_depth=DEPTH, timesteps=1000, sampling_timesteps=DDIM,
        subjects_train="S1,S5", subjects_test="S9",
        matmul_precision="highest", clip_denoised=True,
    )
    jax.config.update("jax_default_matmul_precision", "highest")
    dataset, kp = make_synthetic_h36m_like(
        subjects=("S1", "S5", "S9"),
        actions=tuple(f"Act{i} 1" for i in range(N_ACTIONS)),
        n_frames=8 * FRAMES, seed=0, motion="latent",
    )
    test_ds = PoseDataset(cfg, dataset, "data", "test", keypoints_data=kp)
    batch = next(iter(test_ds.batches(BATCH)))

    model = HPE_model(cfg.model)(
        num_frame=FRAMES, num_joints=test_ds.num_joints, in_chans=2,
        embed_dim=EMBED, depth=DEPTH, num_heads=8, mlp_ratio=2.0,
        qkv_bias=True, with_time_emb=True,
    )
    # Restore weights through a dummy state of the right tree shape.
    from diff3dhpe_tpu.engine.steps import build_train_state, make_optimizer

    params0 = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, FRAMES, test_ds.num_joints, 5)), jnp.zeros((1,)),
    )["params"]
    state = build_train_state(params0, make_optimizer(1e-4, 0.99, 1))
    state, _ = restore_checkpoint(os.path.join(CKPT, "best_epoch"), state)
    params = state.params

    if fast_dtype_name is None:
        from diff3dhpe_tpu.engine.steps import make_denoise_fn

        denoise_fn = make_denoise_fn(model)
    else:
        denoise_fn = make_fast_denoise_fn(
            num_frame=FRAMES, num_joints=test_ds.num_joints, depth=DEPTH,
            num_heads=8, with_time_emb=True, mode="s2s",
            dtype=jnp.bfloat16 if fast_dtype_name == "bfloat16" else jnp.float32,
            f32_head=f32_head,
        )
    engine = GaussianDiffusion.create(
        denoise_fn, timesteps=1000, sampling_timesteps=DDIM,
        clip_denoised=True, beta_schedule="cosine", ddim_sampling_eta=0.0,
        mode="s2s",
    )
    to_mm = test_ds.reverse_norm_3d_pose
    return engine, denoise_fn, params, batch, to_mm


def chain_for(name, fast_dtype_name, f32_head):
    """Full DDIM chain (states + x0 estimates per step) on the fixed batch."""
    import jax
    import jax.numpy as jnp

    engine, _, params, batch, _ = build(fast_dtype_name, f32_head)
    x2d = jnp.asarray(batch.input_2d)
    b = x2d.shape[0]
    run = jax.jit(
        lambda p, c: engine.ddim_sample_loop(
            p, jax.random.PRNGKey(7), c,
            (b, FRAMES, x2d.shape[2], 3), collect_chain=True,
        )
    )
    final, states, x0s = run(params, x2d)
    np.savez(
        os.path.join(OUTDIR, f"chain_{name}.npz"),
        final=np.asarray(final, np.float64),
        states=np.asarray(states, np.float64),
        x0s=np.asarray(x0s, np.float64),
    )
    print(f"chain_{name} done", flush=True)


def matched_forwards(name, fast_dtype_name, f32_head):
    """x̂0 at every step with the F32 chain's x_t as input (compounding-free
    per-forward error). Requires chain_f32.npz."""
    import jax
    import jax.numpy as jnp

    from diff3dhpe_tpu.diffusion.gaussian_diffusion import ddim_time_pairs

    engine, _, params, batch, _ = build(fast_dtype_name, f32_head)
    z = np.load(os.path.join(OUTDIR, "chain_f32.npz"))
    states = z["states"]  # [..., S]
    x2d = jnp.asarray(batch.input_2d)
    b = x2d.shape[0]
    pairs = ddim_time_pairs(1000, DDIM)
    step_fn = jax.jit(
        lambda p, x, t, c: engine._model_x_start(p, x, t, c)
    )
    # x input at step i: x_T (the per-row keyed draw, identical across
    # engines) for i=0, else the f32 chain's state i-1.
    x_t0 = jax.vmap(
        lambda i: jax.random.normal(
            jax.random.fold_in(jax.random.split(jax.random.PRNGKey(7))[0], i),
            (FRAMES, x2d.shape[2], 3), jnp.float32,
        )
    )(jnp.arange(b))
    x0_hats = []
    for i in range(DDIM):
        x_in = x_t0 if i == 0 else jnp.asarray(states[..., i - 1], jnp.float32)
        x0_hats.append(np.asarray(
            step_fn(params, x_in, float(pairs[i, 0]), x2d), np.float64
        ))
    np.savez(os.path.join(OUTDIR, f"matched_{name}.npz"),
             x0s=np.stack(x0_hats, axis=-1))
    print(f"matched_{name} done", flush=True)


LEGS = [
    ("chain_f32", chain_for, ("f32", "float32", False)),
    ("chain_bf16", chain_for, ("bf16", "bfloat16", False)),
    ("chain_bf16head", chain_for, ("bf16head", "bfloat16", True)),
    ("matched_f32", matched_forwards, ("f32", "float32", False)),
    ("matched_bf16", matched_forwards, ("bf16", "bfloat16", False)),
    ("matched_bf16head", matched_forwards, ("bf16head", "bfloat16", True)),
]


def main():
    os.makedirs(OUTDIR, exist_ok=True)
    leg = os.environ.get("LOCALISE_LEG")
    if leg:
        spec = next(l for l in LEGS if l[0] == leg)
        spec[1](*spec[2])
        return

    import subprocess
    for name, _, _ in LEGS:
        if os.path.isfile(os.path.join(OUTDIR, f"{name}.npz")):
            print(f"{name}: reusing npz")
            continue
        env = dict(os.environ, LOCALISE_LEG=name)
        r = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env)
        if r.returncode != 0:
            raise RuntimeError(f"leg {name} failed rc={r.returncode}")

    # Combine: all deviations vs the f32 chain, in mm.
    _, _, _, batch, to_mm = build("float32")
    f32 = np.load(os.path.join(OUTDIR, "chain_f32.npz"))

    def mm(x):
        return np.asarray(to_mm(x)) * 1000.0

    table = dict(
        config=dict(frames=FRAMES, embed=EMBED, depth=DEPTH, ddim=DDIM,
                    batch=BATCH),
        note=(
            "mean per-joint deviation (mm) vs the f32 fused chain, per DDIM "
            "step. matched_* rows: bf16 forward on the F32 trajectory's "
            "inputs (pure per-forward error); traj_* rows: the bf16 chain's "
            "own x̂0 (compounded). Step indices run t=999 -> t=0."
        ),
        per_step={},
    )
    f32_matched = np.load(os.path.join(OUTDIR, "matched_f32.npz"))["x0s"]
    for name in ["bf16", "bf16head"]:
        traj = np.load(os.path.join(OUTDIR, f"chain_{name}.npz"))["x0s"]
        matched = np.load(os.path.join(OUTDIR, f"matched_{name}.npz"))["x0s"]
        table["per_step"][f"matched_{name}"] = [
            round(float(np.linalg.norm(
                mm(matched[..., i]) - mm(f32_matched[..., i]), axis=-1
            ).mean()), 5)
            for i in range(DDIM)
        ]
        table["per_step"][f"traj_{name}"] = [
            round(float(np.linalg.norm(
                mm(traj[..., i]) - mm(f32["x0s"][..., i]), axis=-1
            ).mean()), 5)
            for i in range(DDIM)
        ]
        table["per_step"][f"final_x_dev_mm_{name}"] = round(float(
            np.linalg.norm(
                mm(np.load(os.path.join(OUTDIR, f"chain_{name}.npz"))["final"])
                - mm(f32["final"]), axis=-1,
            ).mean()
        ), 5)
    with open(OUT, "w") as f:
        json.dump(table, f, indent=2)
    print(json.dumps(table, indent=2))


if __name__ == "__main__":
    main()
