"""XPlane trace reader: device-op time summaries from jax.profiler traces.

SURVEY.md §5 tracing/profiling: ``tst.aux.profile.trace`` captures XProf
traces; this module makes them *actionable* without TensorBoard — it parses
the ``.xplane.pb`` the profiler writes and aggregates per-HLO-op device
time, which is how the perf work in docs/RESULTS.md attributes step time
(matmul vs elementwise recompute vs Pallas kernels vs infeed).

The schema lives in xplane.proto (transcribed from the public profiler
proto); its pb2 module is generated on first use with the system ``protoc``
and cached next to this file.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

_HERE = os.path.dirname(os.path.abspath(__file__))


def _xplane_pb2():
    """Import (generating if needed) the xplane_pb2 module."""
    gen_dir = os.path.join(_HERE, "_gen")
    pb2_path = os.path.join(gen_dir, "xplane_pb2.py")
    proto = os.path.join(_HERE, "xplane.proto")
    if (not os.path.exists(pb2_path)
            or os.path.getmtime(pb2_path) < os.path.getmtime(proto)):
        os.makedirs(gen_dir, exist_ok=True)
        open(os.path.join(gen_dir, "__init__.py"), "a").close()
        subprocess.run(
            ["protoc", f"--proto_path={_HERE}", f"--python_out={gen_dir}",
             "xplane.proto"],
            check=True, capture_output=True,
        )
    # load under a unique module name via importlib — a bare
    # `import xplane_pb2` would collide with TF/TSL profiler protos if one
    # was imported first (module cache returns the foreign schema and
    # parsing silently misreads traces)
    import importlib.util

    cached = sys.modules.get("tst_xplane_pb2")
    if cached is not None:
        return cached
    spec = importlib.util.spec_from_file_location("tst_xplane_pb2", pb2_path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["tst_xplane_pb2"] = mod
    spec.loader.exec_module(mod)
    return mod


def load_xspace(path: str):
    """Parse one .xplane.pb file → XSpace message."""
    pb2 = _xplane_pb2()
    space = pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    return space


def find_xplane(trace_dir: str) -> Optional[str]:
    """The newest .xplane.pb under a jax.profiler trace directory."""
    hits = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True),
                  key=os.path.getmtime)
    return hits[-1] if hits else None


def device_op_summary(
    path: str,
    line_filter: Tuple[str, ...] = ("XLA Ops",),
) -> List[Dict]:
    """Aggregate device-plane event durations by op name.

    Returns rows sorted by total time: {name, category, total_us,
    occurrences, avg_us, frac} where ``frac`` is the share of the summed
    op time (self-time on the XLA Ops line — events there don't nest).
    """
    space = load_xspace(path)
    rows: Dict[Tuple[str, str], List[float]] = defaultdict(lambda: [0.0, 0])
    for plane in space.planes:
        if "TPU" not in plane.name and "GPU" not in plane.name:
            continue
        meta = plane.event_metadata
        smeta = plane.stat_metadata
        for line in plane.lines:
            lname = line.display_name or line.name
            if line_filter and not any(f in lname for f in line_filter):
                continue
            for ev in line.events:
                em = meta.get(ev.metadata_id)
                name = (em.display_name or em.name) if em else str(ev.metadata_id)
                category = ""
                for st in ev.stats:
                    sm = smeta.get(st.metadata_id)
                    if sm is not None and sm.name == "hlo_category":
                        category = st.str_value
                r = rows[(name, category)]
                r[0] += ev.duration_ps / 1e6  # ps → us
                r[1] += 1
    total = sum(r[0] for r in rows.values()) or 1.0
    out = [
        {"name": n, "category": c, "total_us": round(t, 1),
         "occurrences": k, "avg_us": round(t / max(k, 1), 2),
         "frac": round(t / total, 4)}
        for (n, c), (t, k) in rows.items()
    ]
    out.sort(key=lambda r: -r["total_us"])
    return out


def category_summary(ops: List[Dict]) -> List[Dict]:
    """Roll an op summary up by HLO category."""
    agg: Dict[str, List[float]] = defaultdict(lambda: [0.0, 0])
    for r in ops:
        a = agg[r["category"] or "uncategorized"]
        a[0] += r["total_us"]
        a[1] += r["occurrences"]
    total = sum(a[0] for a in agg.values()) or 1.0
    out = [{"category": c, "total_us": round(t, 1), "occurrences": k,
            "frac": round(t / total, 4)} for c, (t, k) in agg.items()]
    out.sort(key=lambda r: -r["total_us"])
    return out
