"""One-command regeneration of the all-config eval-throughput table (PERF.md).

Sweeps the three reference eval configurations x {f32, bf16} through
bench.py subprocesses (each self-supervised against relay wedges) at each
config's measured-optimal batch size, and writes scripts/bench_table.json
incrementally — the sweep is resumable: entries already present in the
JSON are skipped, so a wedge-killed or interrupted run continues where it
stopped (delete the file or set BENCH_TABLE_FRESH=1 to re-measure).

Rows (protocol = the reference's eval hot path per config, run.py:557-593 /
run_3dhp.py): 243f DDIM-9 (H3.6M long), 81f DDIM-9 (H3.6M), 27f DDIM-9
(MPI-INF-3DHP shape; its published recipe evals DDIM-7 — keep DDIM fixed
across rows so the column is comparable; override with BENCH_DDIM).

Run on the TPU chip:  python scripts/bench_table.py
Knobs: BENCH_TABLE_HEADS (comma list, default "8" = reference geometry;
add 4 for the TPU head_dim-128 geometry), BENCH_DDIM / BENCH_ITERS pass
through to bench.py.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
# Overridable for tests (BENCH_TABLE_BIN = stub emitting a bench JSON line;
# BENCH_TABLE_OUT = scratch output path).
BENCH = os.environ.get(
    "BENCH_TABLE_BIN", os.path.join(os.path.dirname(HERE), "bench.py")
)
OUT = os.environ.get(
    "BENCH_TABLE_OUT", os.path.join(HERE, "bench_table.json")
)

# (frames, dtype) -> measured-optimal logical batch on one v5e chip
# (PERF.md all-config table; flip-TTA doubles the rows).
BATCHES = {
    (243, "float32"): 2,
    (243, "bfloat16"): 4,
    (81, "float32"): 8,
    (81, "bfloat16"): 16,
    (27, "float32"): 32,
    (27, "bfloat16"): 64,
}


def run_bench(frames: int, dtype: str, batch: int, heads: int) -> dict:
    env = dict(
        os.environ,
        BENCH_FRAMES=str(frames),
        BENCH_DTYPE=dtype,
        BENCH_BATCH=str(batch),
        BENCH_HEADS=str(heads),
    )
    r = subprocess.run(
        [sys.executable, BENCH], env=env, capture_output=True, text=True
    )
    if r.returncode != 0:
        raise RuntimeError(
            f"bench failed ({frames}f {dtype} B={batch} h={heads}): "
            f"{r.stderr[-2000:]}"
        )
    return json.loads(r.stdout.strip().splitlines()[-1])


def main():
    heads_list = [
        int(h) for h in os.environ.get("BENCH_TABLE_HEADS", "8").split(",")
    ]
    table: dict = {}
    if os.path.isfile(OUT) and os.environ.get("BENCH_TABLE_FRESH", "0") != "1":
        with open(OUT) as f:
            table = json.load(f)

    ddim = int(os.environ.get("BENCH_DDIM", "9"))
    for heads in heads_list:
        for (frames, dtype), batch in BATCHES.items():
            key = f"{frames}f_{dtype}_h{heads}"
            # A cached row only counts if it was measured under the SAME
            # protocol: the stored metric string encodes frames + DDIM step
            # count, so re-running with a different BENCH_DDIM re-measures
            # instead of silently mixing protocols in one table.
            expect_metric = f"pose_seqs_per_sec_per_chip_{frames}f_ddim{ddim}_flipTTA"
            if key in table and table[key].get("metric") == expect_metric:
                print(f"{key}: cached ({table[key]['seqs_per_sec']} seq/s)",
                      flush=True)
                continue
            b = run_bench(frames, dtype, batch, heads)
            d = b["detail"]
            table[key] = dict(
                seqs_per_sec=b["value"],
                frames_per_sec=d["frames_per_sec_per_chip"],
                mfu=d["mfu"],
                batch=batch,
                heads=heads,
                metric=b["metric"],
            )
            with open(OUT, "w") as f:  # incremental: survive interruption
                json.dump(table, f, indent=2)
            print(
                f"{key}: {b['value']} seq/s  "
                f"({d['frames_per_sec_per_chip']} frames/s, mfu {d['mfu']})",
                flush=True,
            )

    print(json.dumps(table, indent=2))


if __name__ == "__main__":
    main()
