"""Stall watchdog + on-demand stack dumps for long-running drivers.

Motivation (SURVEY.md §5 failure detection): the reference is a single
process whose only failure mode is a crash-and-restart; this rebuild
talks to the TPU through a remote tunnel, and a dead tunnel makes a
blocking call (``jax.device_get``, a compile, a collective) hang
*silently* forever — observed in production as a trainer stuck 30+
minutes inside the final checkpoint snapshot with zero log output.

Two tools, both pure-host and dependency-free:

* :func:`install_stack_dump_signal` — ``kill -USR1 <pid>`` makes the
  process dump every thread's Python stack to stderr (faulthandler),
  without stopping it.  Installed by ``nhans_train`` at startup.
* :class:`Heartbeat` — a daemon thread that warns loudly (and dumps all
  stacks) when the instrumented loop hasn't reported progress for
  ``timeout`` seconds.  By default it never kills the process: a warning
  is cheap, and blocking calls can be legitimately slow (cold remote
  compiles run ~275 s here).  Timeout override: ``NHANS_STALL_TIMEOUT``
  (seconds).

* escalation (``abort_after`` / env ``NHANS_STALL_ABORT``, seconds,
  0 = off): a hung ``device_get`` on a dead tunnel NEVER returns — the
  axon tunnel was observed dying spontaneously ~80-90 min into two
  independent training runs — so under a supervisor
  (tools/train_supervisor.py) the right move is ``os._exit`` with a
  distinctive code (86) once the stall outlives any legitimate slow
  call; the supervisor restarts the run, which auto-resumes from the
  last checkpoint with an exact seeded-trajectory rejoin
  (tests/test_fault_injection.py).
"""

from __future__ import annotations

import faulthandler
import os
import signal
import sys
import threading
import time

_DEFAULT_TIMEOUT = 900.0  # seconds; > worst observed cold-compile (~275 s)


def install_stack_dump_signal(signum: int = signal.SIGUSR1) -> None:
    """Dump all thread stacks to stderr on ``signum`` (main thread only)."""
    if threading.current_thread() is threading.main_thread():
        faulthandler.register(signum, file=sys.stderr, all_threads=True)


class Heartbeat:
    """Progress heartbeat with a stall-warning daemon thread.

    >>> hb = Heartbeat(name="train loop"); hb.start()
    >>> hb.beat("step 42")   # call from the instrumented loop
    >>> hb.stop()

    When ``time since last beat > timeout`` the watchdog prints a
    diagnostic naming the last phase plus (optionally) all thread
    stacks, then re-arms, so a permanently hung process keeps shouting
    once per timeout period instead of dying quietly.
    """

    ABORT_EXIT_CODE = 86

    def __init__(self, name: str = "loop", timeout: float | None = None,
                 dump_stacks: bool = True, out=None,
                 abort_after: float | None = None):
        env = os.environ.get("NHANS_STALL_TIMEOUT", "")
        self.timeout = float(timeout if timeout is not None
                             else (env or _DEFAULT_TIMEOUT))
        aenv = os.environ.get("NHANS_STALL_ABORT", "")
        self.abort_after = float(abort_after if abort_after is not None
                                 else (aenv or 0.0))
        self.name = name
        self.dump_stacks = dump_stacks
        self.out = out if out is not None else sys.stderr
        self._last = time.monotonic()
        self._last_beat = self._last  # real progress only (abort clock);
        # _last also re-arms on warnings to pace the warn cadence
        self._phase = "startup"
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.stall_count = 0  # total warnings emitted (tests/monitoring)

    def beat(self, phase: str = "") -> None:
        with self._lock:
            self._last = time.monotonic()
            self._last_beat = self._last
            if phase:
                self._phase = phase

    def start(self) -> "Heartbeat":
        if self.timeout <= 0 or self._thread is not None:
            return self
        self._thread = threading.Thread(
            target=self._watch, name=f"watchdog[{self.name}]", daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None

    # ------------------------------------------------------------------ #

    def _watch(self) -> None:
        poll = min(self.timeout / 4.0, 30.0)
        while not self._stop.wait(poll):
            with self._lock:
                now = time.monotonic()
                idle, phase = now - self._last, self._phase
                stalled = now - self._last_beat
            if idle <= self.timeout:
                continue
            self.stall_count += 1
            print(f"[watchdog] {self.name}: NO PROGRESS for {stalled:.0f}s "
                  f"(last phase: {phase}).  A blocking device call may be "
                  f"hung (dead TPU tunnel?).  Checkpoints up to the last "
                  f"completed save are intact; auto-resume recovers this "
                  f"run.  `kill -USR1 {os.getpid()}` dumps stacks.",
                  file=self.out, flush=True)
            if self.dump_stacks:
                try:
                    faulthandler.dump_traceback(file=self.out,
                                                all_threads=True)
                except Exception:  # pragma: no cover - faulthandler quirk
                    pass
            if self.abort_after and stalled > self.abort_after:
                # a dead tunnel's device_get never returns; exit hard so
                # a supervisor can restart + auto-resume (module
                # docstring).  sys.exit would only kill this daemon
                # thread — the hung main thread needs os._exit.
                print(f"[watchdog] {self.name}: stall exceeded "
                      f"abort_after={self.abort_after:.0f}s — exiting "
                      f"{self.ABORT_EXIT_CODE} for supervised restart",
                      file=self.out, flush=True)
                try:
                    self.out.flush()
                except Exception:
                    pass
                os._exit(self.ABORT_EXIT_CODE)
            with self._lock:  # re-arm: warn once per timeout period
                self._last = time.monotonic()
