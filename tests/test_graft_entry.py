"""Driver-contract tests for __graft_entry__.py.

VERDICT round 1 item 1: MULTICHIP_r01 failed because dryrun_multichip ran on
the 1-chip axon platform without self-provisioning virtual devices. These
tests run the entry points in a COLD subprocess (fresh jax, sitecustomize
pre-import and all) exactly like the driver does, so a regression here is a
regression in the driver signal itself.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cold(code: str, timeout: int = 560) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    # Simulate the driver: no CPU forcing, no fake-device flags inherited
    # from this test process — the entry point must self-provision.
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env.pop("TST_DRYRUN_REAL", None)
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.slow
def test_dryrun_multichip_8_cold_subprocess():
    proc = _run_cold(
        "from __graft_entry__ import dryrun_multichip\ndryrun_multichip(8)\n"
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-2000:]}"
    assert "dryrun_multichip OK" in proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_4_cold_subprocess():
    # a second device count exercises the mesh factorization branch
    proc = _run_cold(
        "from __graft_entry__ import dryrun_multichip\ndryrun_multichip(4)\n"
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-2000:]}"
    assert "dryrun_multichip OK" in proc.stdout
