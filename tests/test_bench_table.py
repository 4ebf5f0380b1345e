"""bench_table.py sweep tool: incremental writes + resume-skip semantics.

Drives the real script in a subprocess with a stub bench binary
(BENCH_TABLE_BIN) so no TPU / jax is involved — the tool's contract is
orchestration: one bench.py call per (frames, dtype) config at the pinned
batch size, JSON written after every entry, completed entries skipped on
re-run (how a wedge-interrupted sweep resumes).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "bench_table.py")

STUB = """\
import json, os
frames = os.environ["BENCH_FRAMES"]
dtype = os.environ["BENCH_DTYPE"]
batch = os.environ["BENCH_BATCH"]
print(json.dumps(dict(
    metric=f"pose_seqs_per_sec_per_chip_{frames}f_ddim9_flipTTA",
    value=float(frames) / 10.0,
    unit="seq/s/chip",
    vs_baseline=0.0,
    detail=dict(frames_per_sec_per_chip=float(frames), mfu=0.5,
                batch=int(batch), dtype=dtype),
)))
"""


def run_sweep(tmp_path, out, extra_env=None):
    stub = tmp_path / "stub_bench.py"
    stub.write_text(STUB)
    env = dict(
        os.environ,
        BENCH_TABLE_BIN=str(stub),
        BENCH_TABLE_OUT=str(out),
        **(extra_env or {}),
    )
    return subprocess.run(
        [sys.executable, SCRIPT], env=env, capture_output=True, text=True,
        timeout=300,
    )


def test_sweep_writes_all_configs_and_resumes(tmp_path):
    out = tmp_path / "table.json"
    r = run_sweep(tmp_path, out)
    assert r.returncode == 0, r.stderr
    table = json.loads(out.read_text())
    # 3 frame configs x 2 dtypes at the reference geometry
    assert set(table) == {
        "243f_float32_h8", "243f_bfloat16_h8",
        "81f_float32_h8", "81f_bfloat16_h8",
        "27f_float32_h8", "27f_bfloat16_h8",
    }
    assert table["243f_float32_h8"]["seqs_per_sec"] == 24.3
    assert table["243f_float32_h8"]["batch"] == 2
    assert table["27f_bfloat16_h8"]["batch"] == 64

    # Second run: every entry cached, nothing re-measured.
    r2 = run_sweep(tmp_path, out)
    assert r2.returncode == 0, r2.stderr
    assert r2.stdout.count("cached") == 6


def test_partial_table_resumes_only_missing(tmp_path):
    out = tmp_path / "table.json"
    out.write_text(json.dumps({
        "243f_float32_h8": dict(
            seqs_per_sec=1.0, batch=2, heads=8,
            metric="pose_seqs_per_sec_per_chip_243f_ddim9_flipTTA",
        ),
    }))
    r = run_sweep(tmp_path, out)
    assert r.returncode == 0, r.stderr
    assert r.stdout.count("cached") == 1
    table = json.loads(out.read_text())
    assert len(table) == 6
    # The pre-existing entry was kept, not re-measured.
    assert table["243f_float32_h8"]["seqs_per_sec"] == 1.0


def test_cached_entry_from_other_protocol_is_remeasured(tmp_path):
    """An entry measured under a different DDIM step count (ADVICE r3: the
    resume cache used to key on shape only, silently mixing protocols) must
    NOT be reused — its stored metric string no longer matches."""
    out = tmp_path / "table.json"
    out.write_text(json.dumps({
        "243f_float32_h8": dict(
            seqs_per_sec=1.0, batch=2, heads=8,
            metric="pose_seqs_per_sec_per_chip_243f_ddim5_flipTTA",
        ),
    }))
    r = run_sweep(tmp_path, out)
    assert r.returncode == 0, r.stderr
    assert r.stdout.count("cached") == 0
    table = json.loads(out.read_text())
    # Re-measured under the current protocol (the fake bench emits 24.3).
    assert table["243f_float32_h8"]["seqs_per_sec"] == 24.3
