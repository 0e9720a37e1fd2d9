"""Tracing / profiling hooks (SURVEY.md §5).

XProf traces around the hot loops, per-step wall timing with hard host
syncs (this environment's remote PJRT returns early from
``block_until_ready``), and jitted-program cost analysis for FLOPs
accounting.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Optional


@contextlib.contextmanager
def trace(profile_dir: Optional[str]):
    """``with trace("/tmp/prof"):`` → XProf/TensorBoard trace of the block.
    No-op when profile_dir is None (zero overhead in production runs).

    On exit the captured .xplane.pb is summarized into
    ``<profile_dir>/op_summary.json`` (top device ops by total time) via
    tst.aux.xplane — readable without TensorBoard."""
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        try:
            write_op_summary(profile_dir)
        except Exception:  # the trace itself is the product; never fail a run
            pass


def write_op_summary(profile_dir: str, top: int = 60) -> Optional[str]:
    """Summarize the newest trace in ``profile_dir`` → op_summary.json."""
    import json
    import os

    from tst.aux.xplane import device_op_summary, find_xplane

    xp = find_xplane(profile_dir)
    if xp is None:
        return None
    ops = device_op_summary(xp)
    out = os.path.join(profile_dir, "op_summary.json")
    with open(out, "w") as f:
        json.dump({"xplane": xp, "top_ops": ops[:top]}, f, indent=1)
    return out


def cost_analysis(fn, *args) -> Dict[str, Any]:
    """FLOPs/bytes estimate of a jitted function on example args."""
    import jax

    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns [dict]
        costs = costs[0] if costs else {}
    return {
        "flops": costs.get("flops"),
        "bytes_accessed": costs.get("bytes accessed"),
        "transcendentals": costs.get("transcendentals"),
    }


class StepTimer:
    """Per-step wall timing with warmup discard; hard host sync on demand."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times = []
        self._t0 = None
        self._n = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None):
        if sync_value is not None:
            import numpy as np

            np.asarray(sync_value)  # force host materialization
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self._times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self._times) / len(self._times) if self._times else float("nan")

    def summary(self) -> Dict[str, float]:
        import numpy as np

        t = np.asarray(self._times) if self._times else np.asarray([float("nan")])
        return {
            "steps_timed": len(self._times),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
        }
