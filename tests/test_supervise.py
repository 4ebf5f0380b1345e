"""Unit tests for the wedge-proof subprocess supervisor (utils/supervise.py).

bench.py runs its measurement under run_supervised so a single TPU-relay
wedge (PERF.md round-3 post-mortem) cannot cost the round's one BENCH run.
These tests drive the supervisor with plain-python children — no jax.
"""
import os
import sys
import time

from diff3dhpe_tpu.utils.supervise import run_supervised

PY = sys.executable


def test_success_passthrough():
    rc, out = run_supervised(
        [PY, "-c", "print('{\"metric\": \"ok\"}')"], timeout_s=30, retries=0
    )
    assert rc == 0
    assert out.strip() == b'{"metric": "ok"}'


def test_stall_is_killed_and_retried(tmp_path):
    # Attempt 1 finds no marker, drops it, and hangs past the timeout
    # (simulating a wedged relay call); attempt 2 sees the marker and
    # succeeds. The supervisor must kill attempt 1's process group and
    # return attempt 2's output.
    marker = tmp_path / "attempted"
    child = (
        "import os, sys, time\n"
        f"m = {str(marker)!r}\n"
        "if not os.path.exists(m):\n"
        "    open(m, 'w').close()\n"
        "    time.sleep(60)\n"
        "print('recovered')\n"
    )
    t0 = time.time()
    # 15 s is comfortably above interpreter start-up on the loaded
    # single-core host, yet far below the child's 60 s hang.
    rc, out = run_supervised([PY, "-c", child], timeout_s=15, retries=1)
    assert rc == 0
    assert out.strip() == b"recovered"
    assert time.time() - t0 < 55  # the stalled attempt did not run its 60 s


def test_stall_exhausts_retries():
    rc, out = run_supervised(
        [PY, "-c", "import time; time.sleep(60)"], timeout_s=1, retries=1
    )
    assert rc == 124  # coreutils-timeout convention for a final stall
    assert out == b""


def test_nonzero_exit_is_retried(tmp_path):
    marker = tmp_path / "attempted"
    child = (
        "import os, sys\n"
        f"m = {str(marker)!r}\n"
        "if not os.path.exists(m):\n"
        "    open(m, 'w').close()\n"
        "    sys.exit(3)\n"
        "print('second try')\n"
    )
    rc, out = run_supervised([PY, "-c", child], timeout_s=30, retries=1)
    assert rc == 0
    assert out.strip() == b"second try"


def test_sigterm_kills_child_group(tmp_path):
    # If the SUPERVISOR is killed (e.g. the driver's own timeout on
    # bench.py), the detached grandchild must not survive — an orphaned
    # wedged TPU client would keep the relay blocked for every process.
    import signal
    import subprocess

    pidfile = tmp_path / "grandchild.pid"
    grandchild = (
        "import os, time\n"
        f"open({str(pidfile)!r}, 'w').write(str(os.getpid()))\n"
        "time.sleep(120)\n"
    )
    driver = (
        "import sys\n"
        "from diff3dhpe_tpu.utils.supervise import run_supervised\n"
        f"run_supervised([sys.executable, '-c', {grandchild!r}],"
        " timeout_s=120, retries=0)\n"
    )
    sup = subprocess.Popen([PY, "-c", driver])
    deadline = time.time() + 60
    while not pidfile.exists() and time.time() < deadline:
        time.sleep(0.2)
    assert pidfile.exists(), "grandchild never started"
    gpid = int(pidfile.read_text())
    sup.send_signal(signal.SIGTERM)
    assert sup.wait(timeout=30) != 0  # died by signal, not a clean exit
    deadline = time.time() + 10
    while time.time() < deadline:
        try:
            os.kill(gpid, 0)
        except ProcessLookupError:
            break  # grandchild is gone — forwarded kill worked
        time.sleep(0.2)
    else:
        os.kill(gpid, 9)  # clean up before failing
        raise AssertionError("grandchild survived the supervisor's SIGTERM")


def test_env_is_forwarded():
    env = dict(os.environ, SUPERVISE_TEST_VAR="42")
    rc, out = run_supervised(
        [PY, "-c", "import os; print(os.environ['SUPERVISE_TEST_VAR'])"],
        timeout_s=30,
        retries=0,
        env=env,
    )
    assert rc == 0
    assert out.strip() == b"42"
