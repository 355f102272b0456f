"""Regression tests for the bench.py device preflight (VERDICT r04 weak #6).

BENCH_r04 recorded rc 134 ('terminate called after throwing an instance
of ... / Aborted') after the diagnostic JSON: SystemExit ran interpreter
teardown while the probe thread was wedged inside a PJRT dispatch. The fix
flushes and os._exit(3)s. These tests drive the preflight in a subprocess
(os._exit would kill pytest itself) with the hang simulated via
SWINWNET_BENCH_PREFLIGHT_HANG_S, forced onto the CPU backend.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_preflight(env_extra, timeout_s):
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu"}, **env_extra)
    return subprocess.run(
        # env alone is not enough here: the ambient TPU plugin re-registers
        # itself via the jax_platforms config (see tests/conftest.py) — and a
        # stray axon probe would contend with whatever owns the real chip
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu')\n"
         f"import bench; bench._preflight(timeout_s={timeout_s}); print('PREFLIGHT_OK')"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=120,
    )


def test_preflight_dead_device_exits_3_cleanly():
    """Wedged dispatch -> diagnostic JSON, rc 3, no Aborted/terminate."""
    proc = _run_preflight({"SWINWNET_BENCH_PREFLIGHT_HANG_S": "60"}, timeout_s=1.0)
    assert proc.returncode == 3, (proc.returncode, proc.stdout, proc.stderr)
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["value"] is None
    assert rec["infra_failure"] is True
    assert "did not complete" in rec["error"]
    assert "PREFLIGHT_OK" not in proc.stdout
    # the round-4 failure mode: C++ teardown abort after the JSON
    assert "terminate called" not in proc.stderr
    assert "Aborted" not in proc.stderr


def test_preflight_live_device_returns():
    """Healthy (CPU) backend -> preflight returns, no output, rc 0."""
    proc = _run_preflight({}, timeout_s=60.0)
    assert proc.returncode == 0, (proc.returncode, proc.stdout, proc.stderr)
    assert "PREFLIGHT_OK" in proc.stdout
    assert "infra_failure" not in proc.stdout
