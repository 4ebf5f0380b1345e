"""Benchmark: pose sequences/sec/chip on the reference's eval hot path.

Protocol (matches the reference evaluation, run.py:557-593): H3.6M GT 243f
flagship config (MixSTE s2s, embed 512, depth 8), DDIM-9 reverse diffusion,
flip test-time augmentation (doubled batch through one fused sampling scan),
f32 params. Reported value = pose *sequences* (243 frames each) per second
per chip; each sequence costs 2 x 9 = 18 denoiser forwards.

vs_baseline: ratio against the reference PyTorch implementation executed on
this host via its own code path (torch has no TPU backend; this image has no
GPU, so the baseline runs on host CPU — measured once, cached in
bench_baseline.json). The published repo has no throughput numbers to
compare against (BASELINE.md), so a measured baseline is the only option.

Usage: python bench.py  (runs on whatever backend jax selects; on this image
that is the real TPU chip). One JSON line on stdout.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

DDIM_STEPS = int(os.environ.get("BENCH_DDIM", "9"))
# 243 = the flagship H3.6M long config (the headline protocol); 81/27 are
# the H3.6M-short / MPI-INF-3DHP configs for the all-config table.
FRAMES = int(os.environ.get("BENCH_FRAMES", "243"))
JOINTS, EMBED, DEPTH = 17, 512, 8
# Default dtype is chosen by the trained-weight accuracy budget
# (scripts/accuracy_study.json): only paths inside the two-sided gate
# (|Δ| <= 0.1 mm AND <= 0.5% of baseline, on ALL FOUR protocol metrics
# e1/e2/e3/ev since round 5) may be the default. "mixed" = bf16 trunk +
# f32 head epilogue + the last BENCH_MIXED_F32_STEPS (default 1) DDIM
# steps on the f32 fused forward at the BENCH_FINAL_PREC contract —
# passes the gate on BOTH study checkpoints (r4: +0.0005 mm; r5:
# −0.00003 mm) at 16.7 seq/s, and matches the reference torch sampler on
# trained weights to 0.00033 mm (scripts/torch_parity.json). Pure f32
# with default contracts (round-3 default, 16.1) fails the gate — e1 rel
# on the r4 checkpoint, MPJVE on the r5 one; pure bfloat16 (20.9) fails
# at +0.17–0.42 mm; both stay opt-in. Splitting the final step itself
# (BENCH_TAIL_PAIRS) fails the gate at every depth (+0.22 mm even with
# only 2 of 8 pairs bf16 — PERF.md round-5) and is kept for measurement
# only.
DTYPE = os.environ.get("BENCH_DTYPE", "mixed")
MIXED_F32_STEPS = int(os.environ.get("BENCH_MIXED_F32_STEPS", "1"))
# f32 contraction mode of the mixed mode's final step(s): "high3" (manual
# bf16x3, the accuracy/speed sweet spot), "highest" (6-pass exact), or
# "default" (1 bf16 pass — fails the accuracy gate at the 7.79 mm
# operating point). See scripts/accuracy_study.json.
FINAL_PREC = os.environ.get("BENCH_FINAL_PREC", "high3")
# Precision tail inside the mixed mode's final step(s): 0 = whole step f32;
# K>0 = only the last K block pairs + head run f32 (earlier pairs bf16) —
# see Config.eval_f32_tail_pairs and the accuracy study's tailK variants.
TAIL_PAIRS = int(os.environ.get("BENCH_TAIL_PAIRS", "0"))
# Multi-hypothesis averaging (reference README:79 `-b 4`): hypotheses tile
# the batch, so seq/s scales roughly as 1/repeat_n at fixed B.
REPEAT_N = int(os.environ.get("BENCH_REPEAT_N", "1"))
# Per-dtype fastest eval batch on v5e (B is the logical batch; flip-TTA
# doubles the rows): mixed 16.7 @ B=2 (16.4 @ B=4, 16.1 @ B=6, 15.9 @ B=8,
# round 4); f32 15.8 @ B=2 (15.7 @ B=1, 14.7 @ B=4, 12.1 @ B=8);
# bf16 20.9 @ B=4 (18.1 @ B=8, 15.2 @ B=16, 19.8 @ B=2, round 1).
BATCH = int(os.environ.get("BENCH_BATCH", "4" if DTYPE == "bfloat16" else "2"))
USE_PALLAS = os.environ.get("BENCH_PALLAS", "0") == "1"
# Fused-kernel inference forward (models/fast_eval.py); 1.27x on v5e.
FAST = os.environ.get("BENCH_FAST", "1") == "1"
# Temporal-block layout inside the fused forward: "rows" (XLA transpose +
# multi-group hoisted-GEMM kernel) or "cols" (column-strided BlockSpec).
TMODE = os.environ.get("BENCH_TMODE", "rows")
# In-kernel per-block diffusion-time add (0 = XLA add between kernels).
FUSET = os.environ.get("BENCH_FUSET", "1") == "1"
# Attention head count. 8 = the reference geometry (head_dim 64, half-width
# MXU contracts — the default so the headline matches reference weights);
# 4 = the TPU-optimised head_dim-128 geometry (full-width contracts, ~8-11%
# faster forwards; weights NOT interchangeable with the reference's).
HEADS = int(os.environ.get("BENCH_HEADS", "8"))
# Serve the AOT-exported StableHLO artifact (io/export.py) instead of the
# live jit: serialize + restore the eval step and time the restored callable.
# Measures the end-to-end serving path's overhead vs in-process jit.
EXPORTED = os.environ.get("BENCH_EXPORTED", "0") == "1"
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")


def measure_tpu() -> dict:
    import jax
    import jax.numpy as jnp

    from diff3dhpe_tpu.diffusion import GaussianDiffusion
    from diff3dhpe_tpu.engine import make_denoise_fn
    from diff3dhpe_tpu.engine.steps import make_eval_step
    from diff3dhpe_tpu.models import MixSTEDenoiser

    model = MixSTEDenoiser(
        num_frame=FRAMES, num_joints=JOINTS, in_chans=2, embed_dim=EMBED,
        depth=DEPTH, num_heads=HEADS, mlp_ratio=2.0, qkv_bias=True,
        drop_path_rate=0.1, with_time_emb=True, mode="s2s",
        use_pallas=USE_PALLAS,
        dtype=jnp.bfloat16 if DTYPE == "bfloat16" else None,
    )
    if FAST:
        from diff3dhpe_tpu.engine.steps import make_fast_denoise_fn

        fast_kwargs = dict(
            num_frame=FRAMES, num_joints=JOINTS, depth=DEPTH,
            num_heads=HEADS, with_time_emb=True, mode="s2s",
            temporal_mode=TMODE, fuse_time=FUSET,
        )
        denoise_fn = make_fast_denoise_fn(
            dtype=jnp.float32 if DTYPE == "float32" else jnp.bfloat16,
            f32_head=DTYPE == "mixed", **fast_kwargs,
        )
    else:
        denoise_fn = make_denoise_fn(model)
    diffusion = GaussianDiffusion.create(
        denoise_fn, timesteps=1000, sampling_timesteps=DDIM_STEPS,
        clip_denoised=True, beta_schedule="cosine", mode="s2s",
    )
    if FAST and DTYPE == "mixed":
        import dataclasses

        if TAIL_PAIRS > 0:
            final_fn = make_fast_denoise_fn(
                dtype=jnp.bfloat16, f32_head=True, f32_prec=FINAL_PREC,
                f32_tail_pairs=TAIL_PAIRS, **fast_kwargs
            )
        else:
            final_fn = make_fast_denoise_fn(
                dtype=jnp.float32, f32_prec=FINAL_PREC, **fast_kwargs
            )
        diffusion = dataclasses.replace(
            diffusion,
            final_denoise_fn=final_fn,
            final_denoise_steps=MIXED_F32_STEPS,
        )
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, FRAMES, JOINTS, 5)), jnp.zeros((1,)))["params"]
    eval_step = make_eval_step(
        diffusion, [4, 5, 6, 11, 12, 13], [1, 2, 3, 14, 15, 16],
        repeat_n=REPEAT_N,
    )
    x2d = jax.random.normal(jax.random.PRNGKey(1), (BATCH, FRAMES, JOINTS, 2))
    x2d_flip = jax.random.normal(jax.random.PRNGKey(2), (BATCH, FRAMES, JOINTS, 2))

    if EXPORTED:
        # Round-trip through the serialized serving artifact; the timed loop
        # then drives exactly what a serving host would run.
        spec = lambda a: jax.tree.map(
            lambda p: jax.ShapeDtypeStruct(p.shape, p.dtype), a
        )
        art = jax.export.export(eval_step)(
            spec(params), spec(key), spec(x2d), spec(x2d_flip)
        )
        eval_step = jax.export.deserialize(bytearray(art.serialize())).call

    # NOTE: on the remote-relay backend block_until_ready does not actually
    # wait for device execution; a scalar reduce + host transfer is the only
    # reliable sync. Timing-harness lessons (round-2 bisect of a phantom
    # 12% "regression" that was entirely the harness, PERF.md):
    # - NEVER call a jnp op on a host scalar inside the timed window:
    #   `jnp.isfinite(float(x))` compiles a fresh trivial program through
    #   the compile helper (~0.4 s) — use math.isfinite;
    # - threading a scalar dependence through the iterations serialises
    #   enqueue on a host round trip per call (4x slowdown).
    # The timed loop is exactly a serving loop: independent dispatches,
    # then force the LAST output — on this single-core backend execution is
    # in-order, so that forces the whole queue. Every iteration's output is
    # then verified finite OUTSIDE the timed window (the round-1 review's
    # completeness concern, without poisoning the measurement).
    iters = int(os.environ.get("BENCH_ITERS", "16"))
    sum_sync = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))

    out = eval_step(params, key, x2d, x2d_flip)  # warm-up / compile
    float(sum_sync(out))

    t0 = time.time()
    outs = [
        eval_step(params, jax.random.fold_in(key, i), x2d, x2d_flip)
        for i in range(iters)
    ]
    assert math.isfinite(float(sum_sync(outs[-1])))  # forces the queue
    dt = time.time() - t0

    # Post-timing completeness check: every iteration produced finite output.
    assert all(math.isfinite(float(sum_sync(o))) for o in outs)

    n_chips = jax.device_count()
    seqs_per_sec = BATCH * iters / dt
    return dict(
        seqs_per_sec_per_chip=seqs_per_sec / n_chips,
        frames_per_sec_per_chip=seqs_per_sec * FRAMES / n_chips,
        n_chips=n_chips,
        backend=jax.default_backend(),
        batch=BATCH,
        iters=iters,
        wall_s=dt,
    )


def analytic_model_flops() -> float:
    """Matmul+attention FLOPs of ONE denoiser forward on one sequence
    (batch row) — the basis for the MFU / roofline-gap numbers (PERF.md)."""
    from diff3dhpe_tpu.utils.profiling import denoiser_matmul_flops

    return denoiser_matmul_flops(FRAMES, JOINTS, EMBED, DEPTH)


def measure_torch_baseline() -> float:
    """Reference PyTorch implementation, eval protocol, on host CPU.

    Returns seqs/sec. Times single denoiser forwards and scales by the
    2 x DDIM_STEPS forwards one sequence costs (sampling overhead beyond the
    model calls is negligible at this model size).
    """
    if os.path.isfile(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["torch_cpu_seqs_per_sec"]

    import types

    import torch

    if "timm" not in sys.modules:  # reference imports timm only for DropPath
        timm = types.ModuleType("timm")
        models_mod = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        class DropPath(torch.nn.Module):
            def __init__(self, drop_prob=None):
                super().__init__()

            def forward(self, x):
                return x

        layers.DropPath = DropPath
        models_mod.layers = layers
        timm.models = models_mod
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models_mod
        sys.modules["timm.models.layers"] = layers

    sys.path.insert(0, "/root/reference")
    from common.nets.model_conditional_diffusion_mixste_s2s_grand_linLift import (
        ConditionalDiffusionMixSTES2SGRANDLinLift,
    )

    ref = ConditionalDiffusionMixSTES2SGRANDLinLift(
        num_frame=FRAMES, num_joints=JOINTS, in_chans=2, embed_dim=EMBED,
        depth=DEPTH, num_heads=8, mlp_ratio=2.0, qkv_bias=True,
        drop_path_rate=0.1, with_time_emb=True,
    )
    ref.eval()
    x = torch.randn(1, FRAMES, JOINTS, 5)
    t = torch.zeros(1)
    with torch.no_grad():
        ref.forward_denoise(x, t)  # warm-up
        t0 = time.time()
        n = 2
        for _ in range(n):
            ref.forward_denoise(x, t)
        per_call = (time.time() - t0) / n

    seqs_per_sec = 1.0 / (per_call * 2 * DDIM_STEPS)
    with open(BASELINE_CACHE, "w") as f:
        json.dump(
            dict(
                torch_cpu_seqs_per_sec=seqs_per_sec,
                per_forward_s=per_call,
                note="reference torch impl, host CPU (no GPU in image), "
                     "batch 1, 243f, cost model: 2*9 forwards/seq",
            ),
            f, indent=2,
        )
    return seqs_per_sec


def main():
    result = measure_tpu()
    try:
        # The cached torch baseline is the 243f protocol only.
        baseline = measure_torch_baseline() if FRAMES == 243 else 0.0
        vs = result["seqs_per_sec_per_chip"] / baseline if baseline > 0 else 0.0
    except Exception as e:  # baseline is best-effort; the TPU number stands alone
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        baseline, vs = 0.0, 0.0

    # Hardware-utilisation view (the honest efficiency number: vs_baseline
    # compares against the reference torch impl on this host's CPU — the
    # only place it can run here — which inflates the ratio; judge by MFU /
    # roofline gap instead, see PERF.md).
    # flip-TTA doubles; each extra hypothesis re-runs the whole loop.
    flops_per_seq = 2 * DDIM_STEPS * analytic_model_flops() * REPEAT_N
    achieved_tflops = flops_per_seq * result["seqs_per_sec_per_chip"] / 1e12
    # v5e peak is ~197 TFLOP/s bf16 per chip (394 is the INT8 TOPS figure —
    # round-2 used it for bf16 by mistake, understating bf16 MFU 2x). The
    # f32 path also divides by the bf16 peak: its fused kernels contract via
    # bf16 MXU passes (DIFF_FUSED_F32_PREC=default), so 197 is its roofline.
    peak_tflops = 197.0
    mfu = achieved_tflops / peak_tflops

    print(json.dumps(dict(
        metric=f"pose_seqs_per_sec_per_chip_{FRAMES}f_ddim{DDIM_STEPS}_flipTTA",
        value=round(result["seqs_per_sec_per_chip"], 3),
        unit="seq/s/chip",
        vs_baseline=round(vs, 2),
        detail=dict(
            frames_per_sec_per_chip=round(result["frames_per_sec_per_chip"], 1),
            backend=result["backend"],
            n_chips=result["n_chips"],
            batch=result["batch"],
            dtype=DTYPE,
            mixed_f32_steps=MIXED_F32_STEPS if DTYPE == "mixed" else 0,
            mixed_final_prec=FINAL_PREC if DTYPE == "mixed" else None,
            mixed_f32_tail_pairs=TAIL_PAIRS if DTYPE == "mixed" else 0,
            repeat_n=REPEAT_N,
            baseline_torch_cpu_seqs_per_sec=round(baseline, 4),
            baseline_note="torch reference on host CPU (no GPU/TPU torch "
                          "backend in image); ratio is not a GPU comparison",
            model_tflops_per_seq=round(flops_per_seq / 1e12, 4),
            achieved_tflops_per_chip=round(achieved_tflops, 2),
            mfu=round(mfu, 4),
            exported_artifact=EXPORTED,
        ),
    )))


def supervised_main() -> int:
    """Run the measurement in a supervised child process.

    The remote-TPU relay can wedge mid-request (PERF.md round-3 post-mortem:
    a device call never returns until the blocked client dies). The driver
    runs `python bench.py` exactly once per round, so a single wedge would
    lose the round's BENCH artifact. Supervision re-execs this script with
    BENCH_NO_SUPERVISE=1 in a killable process group, bounds it to
    BENCH_TIMEOUT seconds (default 900 — compile is 2-5 min, measurement
    seconds), and retries once on a stall. BENCH_NO_SUPERVISE=1 opts out.
    """
    from diff3dhpe_tpu.utils.supervise import run_supervised

    timeout_s = float(os.environ.get("BENCH_TIMEOUT", "900"))
    retries = int(os.environ.get("BENCH_RETRIES", "1"))
    env = dict(os.environ, BENCH_NO_SUPERVISE="1")
    rc, out = run_supervised(
        [sys.executable, os.path.abspath(__file__)], timeout_s, retries, env=env
    )
    sys.stdout.buffer.write(out)
    sys.stdout.flush()
    return rc


if __name__ == "__main__":
    if os.environ.get("BENCH_NO_SUPERVISE", "0") == "1":
        main()
    else:
        sys.exit(supervised_main())
