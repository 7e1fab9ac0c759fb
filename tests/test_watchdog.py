"""Stall watchdog (utils/watchdog.py): warn-on-stall semantics.

Pure-host tests — no jax import, safe to run next to a live TPU job.
"""

import io
import signal
import time

from nhans_tpu.utils.watchdog import Heartbeat, install_stack_dump_signal


def test_heartbeat_warns_on_stall_and_rearms():
    out = io.StringIO()
    hb = Heartbeat(name="t", timeout=0.2, dump_stacks=False, out=out).start()
    try:
        hb.beat("phase-A")
        deadline = time.monotonic() + 5.0
        while hb.stall_count < 2 and time.monotonic() < deadline:
            time.sleep(0.05)
    finally:
        hb.stop()
    assert hb.stall_count >= 2  # re-arms and keeps warning
    text = out.getvalue()
    assert "NO PROGRESS" in text and "phase-A" in text


def test_heartbeat_quiet_while_beating():
    out = io.StringIO()
    hb = Heartbeat(name="t", timeout=0.3, dump_stacks=False, out=out).start()
    try:
        for _ in range(8):
            hb.beat("busy")
            time.sleep(0.05)
    finally:
        hb.stop()
    assert hb.stall_count == 0
    assert out.getvalue() == ""


def test_heartbeat_disabled_by_nonpositive_timeout():
    hb = Heartbeat(timeout=0).start()
    assert hb._thread is None
    hb.stop()


def test_stack_dump_signal_installs(capfd):
    # faulthandler.register only works on the main thread (pytest runs
    # tests there) and needs a real fd — capfd keeps one, capsys doesn't.
    install_stack_dump_signal(signal.SIGUSR2)
    try:
        signal.raise_signal(signal.SIGUSR2)
        err = capfd.readouterr().err
        assert "Current thread" in err or "Thread" in err
    finally:
        import faulthandler
        faulthandler.unregister(signal.SIGUSR2)


def test_heartbeat_abort_exits_process():
    """abort_after escalation: a stalled process exits with code 86
    (supervised-restart contract) instead of hanging forever."""
    import subprocess
    import sys
    code = (
        "import time, sys\n"
        "from nhans_tpu.utils.watchdog import Heartbeat\n"
        "hb = Heartbeat(name='t', timeout=0.3, dump_stacks=False,\n"
        "               abort_after=0.8)\n"
        "hb.start()\n"
        "time.sleep(60)\n"   # never beats: watchdog must abort us
        "sys.exit(0)\n")
    rc = subprocess.run([sys.executable, "-c", code],
                        capture_output=True, text=True, timeout=120)
    assert rc.returncode == 86, (rc.returncode, rc.stderr[-400:])
    assert "supervised restart" in rc.stderr
