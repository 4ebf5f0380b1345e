"""Irreducible-gap decomposition for the fused eval path (PERF.md round-3).

VERDICT round-2 Next #3 allows closing the bf16-eval item with "a PERF.md
proof that the remaining gap is irreducible attention VPU work". This probe
produces that proof empirically rather than by estimate: it runs the bench
protocol (bench.py, 243f DDIM-9 flip-TTA) three times per dtype with the
attention tile progressively ablated inside the otherwise-identical fused
kernels (ops/attention.py::grand_attend_tile, trace-time env gates):

  full          the production kernel
  no_softmax    DIFF_FUSED_ABLATE_SOFTMAX=1 — both attention matmuls stay,
                max/exp/sum/normalise dropped  -> delta = softmax VPU cost
  no_attention  DIFF_FUSED_ABLATE_ATTEND=1 — logits matmul, softmax and AV
                matmul all dropped             -> what remains is the
                kernels' own GEMM+LN floor (the EMPIRICAL roofline: same
                tiling, same DMAs, same hoisted GEMMs, zero attention)

Derived columns: attention-core cost (full - no_attention), softmax share
(full - no_softmax), attention-matmul share (no_softmax - no_attention).
Each variant runs bench.py in a subprocess (the gates are read at trace
time; a fresh process guarantees a clean jit cache). Writes
scripts/probe_irreducible.json and prints the table.

Run on the TPU chip: python scripts/probe_irreducible.py
Knobs: PROBE_DTYPES (comma list, default "bfloat16,float32"), BENCH_* pass
through (BENCH_ITERS etc.).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
BENCH = os.path.join(os.path.dirname(HERE), "bench.py")
OUT = os.path.join(HERE, "probe_irreducible.json")

MODES = [
    ("full", {}),
    ("no_softmax", {"DIFF_FUSED_ABLATE_SOFTMAX": "1"}),
    ("no_attention", {"DIFF_FUSED_ABLATE_ATTEND": "1"}),
]


def run_bench(dtype: str, extra_env: dict) -> dict:
    env = dict(os.environ, BENCH_DTYPE=dtype, **extra_env)
    r = subprocess.run([sys.executable, BENCH], env=env,
                       capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"bench failed ({dtype}, {extra_env}): {r.stderr[-2000:]}")
    line = r.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    dtypes = os.environ.get("PROBE_DTYPES", "bfloat16,float32").split(",")
    ddim = int(os.environ.get("BENCH_DDIM", "9"))
    table = {}
    for dtype in dtypes:
        rows = {}
        for name, gates in MODES:
            b = run_bench(dtype, gates)
            batch = b["detail"]["batch"]
            seqs = b["value"]
            # One eval_step = DDIM batched denoiser forwards over the
            # flip-doubled batch; per-batched-forward wall time:
            fwd_ms = batch / seqs / ddim * 1000.0
            rows[name] = dict(seqs_per_sec=seqs, fwd_ms=round(fwd_ms, 2))
            print(f"{dtype:9s} {name:13s} {seqs:7.2f} seq/s  "
                  f"{fwd_ms:6.2f} ms/fwd", flush=True)
        full = rows["full"]["fwd_ms"]
        nsm = rows["no_softmax"]["fwd_ms"]
        natt = rows["no_attention"]["fwd_ms"]
        rows["derived"] = dict(
            attention_core_ms=round(full - natt, 2),
            softmax_vpu_ms=round(full - nsm, 2),
            attention_matmul_ms=round(nsm - natt, 2),
            gemm_ln_floor_ms=natt,
            floor_fraction_of_full=round(natt / full, 3),
        )
        table[dtype] = rows
    with open(OUT, "w") as f:
        json.dump(table, f, indent=2)
    print(json.dumps(table, indent=2))


if __name__ == "__main__":
    main()
