"""Driver contract: bench.py must print ONE parseable JSON line with the
tracked metric, on any backend (CPU here — TPU-only legs self-skip).

A broken bench.py silently costs a round's tracked measurement, so the
contract is pinned as a (slow-ish) subprocess test.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_emits_tracked_metric_json():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the contract is the JSON line's shape, not steady-state timing: shrink
    # the step counts so the CPU run is compile-dominated, not step-dominated
    # (full CPU bench is ~25 min and has timed out under host contention)
    env["TST_BENCH_STEPS"] = "2"
    env["TST_BENCH_WARMUP"] = "1"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(json_lines) == 1, f"expected one JSON line, got: {out.stdout[:500]}"
    rec = json.loads(json_lines[0])
    assert rec["metric"] == "blind_sft_samples_per_sec_per_chip"
    assert rec["value"] > 0
    assert rec["unit"] == "samples/s/chip"
    assert "vs_baseline" in rec and rec["vs_baseline"] > 0
    assert rec["xla_programs_fold_parallel"] == 1
    assert rec["fold_finetunes_per_hour_per_chip"] > 0
