"""Sweep remat policies × batch sizes for the fold-parallel train step.

VERDICT r1 weak #6 follow-up: find the fastest (remat, batch) point for the
tracked 0.5B metric. Measured conclusions live in docs/RESULTS.md.

Run on the real chip: python scripts/sweep_remat.py [remat:batch ...]
e.g.  python scripts/sweep_remat.py dots:4 light:8 False:4
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from _workload import make_workload, time_train_steps

from tst.aux.flops import train_step_flops
from tst.train.sft import FoldTrainer

V5E_PEAK = 197e12
STEPS, WARM = 12, 3


def main():
    w = make_workload()
    print(f"backend={'tpu' if w.on_tpu else 'cpu'} model={w.spec.name} "
          f"k={w.k} seq={w.seq}")
    print(f"{'remat':>10} {'B':>3} {'rows':>4} {'compile_s':>9} "
          f"{'step_ms':>8} {'samp/s':>8} {'MFU':>6} {'hbm_gb':>7}")

    cases = [(r, b) for r in ("dots", "dots_attn", "light", False)
             for b in (4, 8, 12)]
    if len(sys.argv) > 1:  # e.g. "light:4 False:8"
        cases = [(r if r != "False" else False, int(b))
                 for r, b in (a.split(":") for a in sys.argv[1:])]
    for remat, batch in cases:
        try:
            batches = w.batches(batch=batch)[: STEPS + WARM + 1]
            tr = FoldTrainer(w.spec, w.lspec, k=w.k, lr=1e-4,
                             total_steps=STEPS + WARM, use_pallas=w.on_tpu,
                             remat=remat, t_max=w.t_max)
            compile_s, dt = time_train_steps(w, tr, batches, STEPS, WARM)
            try:
                m = tr._step_fn.lower(
                    w.params, *tr.init_state(jax.random.key(1)),
                    w.tokens, w.mask, w.pos, jnp.asarray(batches[0])
                ).compile().memory_analysis()
                hbm = (m.argument_size_in_bytes + m.output_size_in_bytes
                       + m.temp_size_in_bytes) / 1e9
            except Exception:
                hbm = float("nan")
            flops = train_step_flops(w.spec, w.lspec, n_rows=w.k * batch,
                                     seq=w.seq, t_max=w.t_max,
                                     remat=remat)["model_flops"]
            mfu = flops / dt / V5E_PEAK if w.on_tpu else float("nan")
            print(f"{str(remat):>10} {batch:>3} {w.k*batch:>4} "
                  f"{compile_s:>9.1f} {dt*1e3:>8.1f} "
                  f"{w.k*batch/dt:>8.1f} {mfu:>6.3f} {hbm:>7.2f}")
        except Exception as e:
            print(f"{str(remat):>10} {batch:>3} {w.k*batch:>4}  "
                  f"FAILED: {type(e).__name__}: {str(e)[:600]}")


if __name__ == "__main__":
    main()
