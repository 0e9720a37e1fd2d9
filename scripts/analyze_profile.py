"""Join a captured profile (xplane) with the step's optimized HLO: print the
top device ops with their defining HLO lines, so profiler fusion names map
back to source operations. Expects scripts/profile_step.py and
scripts/dump_hlo.py to have run in the SAME build.

Run: python scripts/analyze_profile.py [n_steps_in_trace]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tst.aux.xplane import device_op_summary, find_xplane


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    ops = device_op_summary(find_xplane("/tmp/tst_profile"))
    skip = ("slice", "async-copy", "copy-start", "copy-done")
    leaf = [r for r in ops
            if r["name"] not in skip and not r["name"].startswith("while")]
    txt = ""
    if os.path.exists("/tmp/train_step_hlo.txt"):
        txt = open("/tmp/train_step_hlo.txt").read()
    tot = sum(r["total_us"] for r in leaf)
    print(f"leaf sum per step: {tot/n_steps/1000:.1f} ms")
    for r in leaf[:16]:
        n = r["name"]
        print(f"\n{n:<45} {r['total_us']/n_steps/1000:>7.2f} ms/step  "
              f"x{r['occurrences']//n_steps:<4} avg {r['avg_us']:>7.1f}us")
        m = re.search(rf"%{re.escape(n)} = [^\n]*", txt)
        if m:
            print("   ", m.group(0)[:500])


if __name__ == "__main__":
    main()
