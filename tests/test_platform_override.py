"""NHANS_PLATFORM env override (nhans_tpu/__init__._apply_platform_override).

Must run in a SUBPROCESS: the override only matters before backend init,
and this test session's backend is already pinned by conftest.py.
"""

import os
import subprocess
import sys


def _run(env_extra):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update(env_extra)
    code = ("import nhans_tpu, jax; "
            "print({d.platform for d in jax.devices()})")
    return subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=300)


def test_nhans_platform_cpu_forces_cpu_devices():
    r = _run({"NHANS_PLATFORM": "cpu"})
    assert r.returncode == 0, r.stderr
    assert "{'cpu'}" in r.stdout


def test_unset_override_is_a_noop():
    # With JAX_PLATFORMS=cpu AND no NHANS_PLATFORM the process must still
    # come up (either honoring the env var or a plugin platform) — the
    # override must not break default initialization.
    r = _run({"JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
