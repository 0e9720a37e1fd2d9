"""Profile the fold-parallel 0.5B train step and print the top device ops.

Captures an XProf trace of a few steady-state steps, then summarizes the
xplane via tst.aux.xplane (no TensorBoard needed) — where the step time
actually goes (matmul vs elementwise recompute vs flash kernels vs saves).
Pair with scripts/dump_hlo.py + scripts/analyze_profile.py to map fusion
names back to source ops. Run: python scripts/profile_step.py
"""

from __future__ import annotations

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from _workload import make_workload

from tst.train.sft import FoldTrainer


def main():
    w = make_workload()
    tr = FoldTrainer(w.spec, w.lspec, k=w.k, lr=1e-4, total_steps=16,
                     use_pallas=w.on_tpu,
                     remat="dots" if w.on_tpu else False, t_max=w.t_max)
    batches = w.batches()
    lora, opt = tr.init_state(jax.random.key(1))
    for t in range(3):  # compile + warm
        lora, opt, loss = tr._step_fn(w.params, lora, opt, w.tokens, w.mask,
                                      w.pos, jnp.asarray(batches[t]))
    np.asarray(loss)

    trace_dir = "/tmp/tst_profile"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for t in range(3, 8):
            lora, opt, loss = tr._step_fn(w.params, lora, opt, w.tokens,
                                          w.mask, w.pos, jnp.asarray(batches[t]))
        np.asarray(loss)

    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    print(f"xplane files: {xplanes}")
    if not xplanes:
        print("no xplane captured (remote PJRT may not support profiling)")
        return

    from tst.aux.xplane import device_op_summary

    ops = device_op_summary(xplanes[-1])
    print(f"top device ops ({len(ops)} total):")
    for r in ops[:20]:
        print(f"  {r['name']:<45} {r['total_us']:>10.1f} us "
              f"x{r['occurrences']:<5} avg {r['avg_us']:>8.1f} us")


if __name__ == "__main__":
    main()
