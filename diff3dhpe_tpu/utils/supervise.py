"""Wedge-proof subprocess supervision for bounded TPU-relay jobs.

The remote-TPU relay can wedge mid-request (PERF.md round-3 relay-wedge
post-mortem): a device call never returns, and every other process's TPU
calls block until the wedged client dies. The only remediation is to kill
the stuck process group and retry — `scripts/tpu_watchdog.sh` does this
for long training jobs by watching log staleness; this module is the
in-process equivalent for bounded jobs whose total runtime has a known
ceiling (e.g. bench.py, which the driver runs exactly once per round:
losing that single run to a wedge would lose the round's BENCH artifact).

No reference counterpart — this is operations hardening for the remote
TPU environment.
"""
from __future__ import annotations

import os
import signal
import subprocess
import sys
from typing import Mapping, Sequence


def run_supervised(
    argv: Sequence[str],
    timeout_s: float,
    retries: int = 1,
    env: Mapping[str, str] | None = None,
) -> tuple[int, bytes]:
    """Run ``argv`` as a child process group; kill and retry on stall.

    The child inherits stderr (live progress) while stdout is captured and
    returned so the caller can forward the job's result line exactly once.
    A child that produces no exit within ``timeout_s`` is assumed wedged:
    its whole process group gets SIGKILL (killing the group, not just the
    leader, also releases any helper processes holding the relay) and the
    job is retried up to ``retries`` more times.

    Returns ``(returncode, stdout_bytes)`` of the first successful attempt,
    or of the last attempt if all fail (returncode 124 marks a final stall,
    mirroring coreutils ``timeout``).
    """
    last_rc, last_out = 124, b""

    # If the SUPERVISOR is killed (e.g. the caller's own timeout), the
    # detached child group must not outlive it — an orphaned wedged client
    # would keep the whole TPU relay blocked. Forward fatal signals to the
    # current child group, then die with the original signal. Installed
    # BEFORE the first spawn (via a mutable reference) so a signal landing
    # between Popen() and handler setup cannot orphan the group.
    current: list = [None]

    def _forward(signum, frame):
        proc = current[0]
        if proc is not None:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
        signal.signal(signum, signal.SIG_DFL)
        os.kill(os.getpid(), signum)

    prev = {
        s: signal.signal(s, _forward) for s in (signal.SIGTERM, signal.SIGINT)
    }
    try:
        for attempt in range(retries + 1):
            proc = subprocess.Popen(
                list(argv),
                env=dict(env) if env is not None else None,
                stdout=subprocess.PIPE,
                start_new_session=True,  # own process group => killable unit
            )
            current[0] = proc
            try:
                out, _ = proc.communicate(timeout=timeout_s)
            except subprocess.TimeoutExpired:
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except (ProcessLookupError, PermissionError):
                    pass
                # Re-communicate after the kill: returns the FULL buffered
                # output (communicate()'s internal buffer persists across
                # calls), not just what a raw stdout.read() would see.
                out, _ = proc.communicate()
                last_rc, last_out = 124, out or b""
                print(
                    f"supervise: attempt {attempt + 1}/{retries + 1} produced "
                    f"no exit within {timeout_s:.0f}s (TPU relay wedge?); "
                    f"killed process group {proc.pid}"
                    + ("; retrying" if attempt < retries else "; giving up"),
                    file=sys.stderr,
                    flush=True,
                )
                continue
            if proc.returncode == 0:
                return 0, out
            last_rc, last_out = proc.returncode, out
            print(
                f"supervise: attempt {attempt + 1}/{retries + 1} exited "
                f"rc={proc.returncode}"
                + ("; retrying" if attempt < retries else "; giving up"),
                file=sys.stderr,
                flush=True,
            )
    finally:
        for s, handler in prev.items():
            signal.signal(s, handler)
    return last_rc, last_out
