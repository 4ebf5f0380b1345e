"""Training-step microbench + roofline on the real TPU chip.

Times one jitted train step (value_and_grad + AdamW update) for a chosen
variant of the flagship 243f config and reports MFU (VERDICT r3 Next #4:
the train path used to report seq/s only, with no roofline accounting).

  python scripts/train_bench.py VARIANT [B] [FRAMES]   # one point
  python scripts/train_bench.py sweep                  # full table

VARIANT: {flax,flaxblk,fast,fastblk,fastpair,fastattn}_{f32,bf16}
  flax_*:     regular flax forward, WHOLE-graph remat (round-1 path).
  flaxblk_*:  flax forward, per-BLOCK remat (Config remat_mode="block").
  fast_*:     fused Pallas forward + monolithic XLA-recompute backward
              (models/fast_eval.py fast_forward_denoise_train).
  fastblk_*:  fast_* with per-block checkpoint of that backward.
  fastpair_*: fused forward with pair-boundary custom VJP — the backward
              recomputes one (spatial, temporal) pair at a time from
              stored boundaries (fast_forward_denoise_train_pairs).
  fastattn_*: fastpair + the flash-style fused attention backward
              (ops/attention.py::grand_attention_trainable) in the
              recompute mirror.
B defaults to 8, FRAMES to 243 (round-1 baseline: 361 ms/step = 22.2 seq/s).

FLOPs accounting (reference hot path run.py:312-347 has no counterpart —
the reference never reports training FLOPs): one train step runs ONE
denoiser forward (a single random t per batch row, diffusion/loss overhead
negligible) plus its backward (~2x the forward matmul FLOPs). MFU counts
the USEFUL 3x-forward FLOPs against the 197 TFLOP/s v5e bf16 peak (the f32
paths also contract via bf16 MXU passes at default precision). Both paths
recompute the forward for the backward (flax: remat; fast: custom-VJP
XLA-recompute), so executed FLOPs are ~4x forward — reported separately as
hw_util so the remat tax is visible instead of silently inflating MFU.

The sweep accumulates into scripts/train_roofline.json (resumable — safe
to re-run through scripts/tpu_watchdog.sh after a relay wedge).
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.abspath(__file__))
SWEEP_OUT = os.path.join(HERE, "train_roofline.json")
PEAK_TFLOPS = 197.0  # v5e bf16 peak per chip (bench.py uses the same)

# fastattn_* leads the uncached tail of the sweep: its cells are the
# round-5 fused-attention-backward evidence (all earlier variants are
# fully cached in train_roofline.json and skip instantly), so a sweep cut
# short by the relay still measures the new backward before re-attempting
# the fastpair retryable cells.
SWEEP_VARIANTS = ("flax_f32", "flax_bf16", "flaxblk_f32", "flaxblk_bf16",
                  "fast_f32", "fast_bf16", "fastblk_f32", "fastblk_bf16",
                  "fastattn_f32", "fastattn_bf16",
                  "fastpair_f32", "fastpair_bf16")
SWEEP_BATCHES = (8, 16, 32)

# Substrings that identify RETRYABLE infrastructure failures (relay wedge /
# env hiccup) as opposed to terminal ones (OOM, compile overflow). Round-4
# advisor finding: three fastpair cells died on TPU_WORKER_HOSTNAMES / HTTP
# 500 relay errors yet were cached as terminal "failed" entries the
# resumable sweep then skipped forever.
RETRYABLE_MARKERS = (
    "TPU_WORKER_HOSTNAMES", "HTTP", "Connection", "Deadline", "UNAVAILABLE",
    "Socket", "timed out",
)
TERMINAL_MARKERS = ("RESOURCE_EXHAUSTED", "Exhausted", "out of memory", "OOM")


def measure(variant: str, b: int, frames: int) -> dict:
    import jax
    import jax.numpy as jnp

    path, dt = variant.rsplit("_", 1)
    dtype = jnp.bfloat16 if dt == "bf16" else None

    from diff3dhpe_tpu.diffusion import GaussianDiffusion
    from diff3dhpe_tpu.engine import build_train_state, make_denoise_fn, make_train_step
    from diff3dhpe_tpu.engine.steps import make_fast_train_denoise_fn, make_optimizer
    from diff3dhpe_tpu.models import MixSTEDenoiser
    from diff3dhpe_tpu.utils.profiling import denoiser_matmul_flops

    J, C, D = 17, 512, 8
    model = MixSTEDenoiser(
        num_frame=frames, num_joints=J, in_chans=2, embed_dim=C, depth=D,
        num_heads=8, mlp_ratio=2.0, qkv_bias=True, drop_path_rate=0.1,
        with_time_emb=True, mode="s2s", dtype=dtype,
        # flaxblk = per-BLOCK remat (Config remat_mode="block", the
        # recommended mode); flax = whole-graph remat (round-1 behavior).
        remat_blocks=(path == "flaxblk"),
    )
    if path == "flaxblk":
        denoise_fn = make_denoise_fn(model, remat=False)
    elif path == "flax":
        denoise_fn = make_denoise_fn(model, remat=True)
    else:
        # fast = round-3 behavior (backward vjps the monolithic XLA
        # mirror); fastblk = per-block checkpoint of that backward;
        # fastpair = pair-boundary custom VJP (round-4: backward
        # recomputes one (spatial, temporal) pair at a time from stored
        # boundaries — monolithic FLOPs at flaxblk memory).
        # fastattn = fastpair + the flash-style fused attention backward
        # (grand_attention_trainable) in the recompute mirror.
        denoise_fn = make_fast_train_denoise_fn(
            num_frame=frames, num_joints=J, depth=D, num_heads=8,
            with_time_emb=True, mode="s2s",
            dtype=dtype or jnp.float32, drop_path_rate=0.1,
            ckpt_blocks=(path == "fastblk"),
            pair_vjp=(path in ("fastpair", "fastattn")),
            attn_bwd=(path == "fastattn"),
        )
    diffusion = GaussianDiffusion.create(
        denoise_fn, timesteps=1000, sampling_timesteps=9,
        clip_denoised=True, clip_loss=True, beta_schedule="cosine", mode="s2s",
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, frames, J, 5)), jnp.zeros((1,))
    )["params"]
    opt = make_optimizer(4e-5, 0.99, steps_per_epoch=100)
    state = build_train_state(params, opt)
    train_step = make_train_step(diffusion, opt)

    gt = jax.random.normal(jax.random.PRNGKey(1), (b, frames, J, 3))
    x2d = jax.random.normal(jax.random.PRNGKey(2), (b, frames, J, 2))

    t0 = time.time()
    state, loss = train_step(state, jax.random.PRNGKey(3), gt, x2d)
    l0 = float(loss)  # host transfer = true device sync on the relay
    compile_s = time.time() - t0

    iters = int(os.environ.get("TRAIN_ITERS", "10"))
    losses = []
    t0 = time.time()
    for i in range(iters):
        state, loss = train_step(state, jax.random.fold_in(jax.random.PRNGKey(3), i), gt, x2d)
        losses.append(loss)
    # Each step's state input is the previous step's output, so forcing the
    # last loss forces the whole chain by data dependence (no in-order
    # execution assumption needed).
    lf = float(loss)
    ms = (time.time() - t0) / iters * 1000
    assert all(math.isfinite(float(l)) for l in losses)
    assert math.isfinite(lf)

    fwd_flops = denoiser_matmul_flops(frames, J, C, D) * b
    useful_tflops = 3.0 * fwd_flops / (ms / 1000) / 1e12  # fwd + bwd(2x)
    executed_tflops = 4.0 * fwd_flops / (ms / 1000) / 1e12  # + remat fwd
    row = dict(
        variant=variant, batch=b, frames=frames,
        ms_per_step=round(ms, 1),
        seqs_per_sec=round(b / ms * 1000, 2),
        mfu=round(useful_tflops / PEAK_TFLOPS, 4),
        hw_util_with_remat=round(executed_tflops / PEAK_TFLOPS, 4),
        compile_s=round(compile_s, 1),
    )
    print(
        f"{variant} B={b} F={frames}: {ms:.0f} ms/step = "
        f"{row['seqs_per_sec']:.1f} seq/s  MFU {row['mfu']:.3f} "
        f"(hw {row['hw_util_with_remat']:.3f})  loss {l0:.4f}->{lf:.4f}"
        f"  (compile {compile_s:.0f}s)",
        flush=True,
    )
    return row


def sweep():
    table = {}
    if os.path.isfile(SWEEP_OUT):
        with open(SWEEP_OUT) as f:
            table = json.load(f)
    import subprocess

    for variant in SWEEP_VARIANTS:
        for b in SWEEP_BATCHES:
            key = f"{variant}_b{b}"
            if key in table:
                cached = table[key]
                if cached.get("failed") and cached.get("retryable"):
                    # Infra failure (relay wedge / env hiccup): re-attempt
                    # on every sweep run instead of caching it forever.
                    print(f"{key}: cached RETRYABLE failure — re-attempting",
                          flush=True)
                    del table[key]
                elif cached.get("failed"):
                    print(f"{key}: cached TERMINAL failure "
                          f"({cached.get('reason', 'see error field')}; "
                          f"delete from {os.path.basename(SWEEP_OUT)} to "
                          f"re-attempt)", flush=True)
                    continue
                else:
                    print(f"{key}: cached ({cached['seqs_per_sec']} seq/s, "
                          f"MFU {cached['mfu']})", flush=True)
                    continue
            # Each point in its own subprocess: a clean jit cache, and one
            # wedged measurement only loses that point on watchdog restart.
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), variant, str(b),
                 "243", "--json"],
                capture_output=True, text=True,
            )
            if r.returncode != 0:
                # Classify the failure before caching it: terminal failures
                # (OOM / compile overflow — a retry would fail identically
                # and starve the sweep through the watchdog's restart
                # budget) are cached with a reason; infrastructure failures
                # (relay wedge, env hiccup) are cached as retryable, so the
                # next sweep run re-attempts them (round-4 advisor finding).
                err_lines = [l for l in r.stderr.splitlines()
                             if any(s in l for s in
                                    ("Error", "INTERNAL", "RESOURCE",
                                     "Exhausted", "HTTP", "UNAVAILABLE",
                                     "TPU_WORKER_HOSTNAMES"))]
                tail = "\n".join(err_lines[-3:] or
                                 r.stderr.strip().splitlines()[-3:])
                infra = any(m in r.stderr for m in RETRYABLE_MARKERS)
                exhausted = any(m in r.stderr for m in TERMINAL_MARKERS)
                # An unambiguous OOM/compile overflow is terminal. When the
                # stderr carries BOTH a relay signature (HTTP 500 from the
                # remote compile helper, TPU_WORKER_HOSTNAMES env wedge)
                # AND an exhaustion string, the exhaustion text usually
                # comes from the helper's own crash noise — classify it
                # retryable so one re-attempt on the next sweep run settles
                # it (round-5: two fastattn_f32 cells hit exactly this).
                retryable = infra
                if infra and exhausted:
                    reason = ("ambiguous relay error (HTTP/env-wedge "
                              "signature with exhaustion strings in the "
                              "helper noise) — retryable")
                elif retryable:
                    reason = "relay/env infrastructure error (retryable)"
                else:
                    reason = "OOM or compile overflow (terminal)"
                print(f"{key}: FAILED rc={r.returncode} [{reason}]: {tail}",
                      flush=True)
                table[key] = dict(failed=True, retryable=retryable,
                                  reason=reason, rc=r.returncode, error=tail)
                with open(SWEEP_OUT, "w") as f:
                    json.dump(table, f, indent=2, sort_keys=True)
                continue
            row = json.loads(r.stdout.strip().splitlines()[-1])
            print(f"{key}: {row['seqs_per_sec']} seq/s  MFU {row['mfu']} "
                  f"(hw {row['hw_util_with_remat']})", flush=True)
            table[key] = row
            with open(SWEEP_OUT, "w") as f:
                json.dump(table, f, indent=2, sort_keys=True)
    print(json.dumps(table, indent=2, sort_keys=True))


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "fast_f32"
    if variant == "sweep":
        sweep()
        return
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 243
    row = measure(variant, b, frames)
    if "--json" in sys.argv:
        print(json.dumps(row))


if __name__ == "__main__":
    main()
