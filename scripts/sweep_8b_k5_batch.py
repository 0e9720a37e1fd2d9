"""Sweep batch/fold for the 8B int8 k=5 (north-star fold count) train leg.

Abstract-lowered compiles (scripts/probe_8b_memory.py) showed the k=5
full-remat program is far smaller than assumed: 10.51 GB total at B=1,
scaling ~+1.2 GB per +1 batch — so B=2..4 fit the 15.75 GB chip with the
8.04 GB int8 base resident. The bench leg has been running B=1
(8.12 samples/s); more rows/step should amortize the per-step fixed work.

Run: python scripts/sweep_8b_k5_batch.py [remat:batch ...]  (default full:1..4)
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from _workload import make_workload, time_train_steps

from tst.aux.flops import train_step_flops
from tst.models.decoder import init_params, spec_by_name
from tst.train.sft import FoldTrainer

V5E_PEAK = 197e12
STEPS, WARM = 8, 2
K = 5


def main():
    w = make_workload()  # reuse the tokenized synthetic dataset + fold ids
    if not w.on_tpu:
        print("needs the real chip", file=sys.stderr)
        return 1
    spec8 = spec_by_name("llama3-8b")
    del w.params  # free the 0.5B base before the 8B int8 init
    params8 = init_params(jax.random.key(0), spec8, quantize=True)
    w.params, w.spec, w.k = params8, spec8, K

    cases = [(True, b) for b in (1, 2, 3, 4)]
    if len(sys.argv) > 1:
        cases = [(r if r != "False" else False, int(b))
                 for r, b in (a.split(":") for a in sys.argv[1:])]
        cases = [(True if r == "True" else r, b) for r, b in cases]

    print(f"{'remat':>8} {'B':>3} {'rows':>4} {'compile_s':>9} "
          f"{'step_ms':>9} {'samp/s':>7} {'MFU':>6}")
    for remat, batch in cases:
        try:
            batches = w.batches(batch=batch)[: STEPS + WARM + 1]
            tr = FoldTrainer(spec8, w.lspec, k=K, lr=1e-4,
                             total_steps=STEPS + WARM, use_pallas=True,
                             remat=remat, t_max=w.t_max)
            compile_s, dt = time_train_steps(w, tr, batches, STEPS, WARM)
            flops = train_step_flops(spec8, w.lspec, n_rows=K * batch,
                                     seq=w.seq, t_max=w.t_max,
                                     remat=remat)["model_flops"]
            print(f"{str(remat):>8} {batch:>3} {K*batch:>4} {compile_s:>9.1f} "
                  f"{dt*1e3:>9.1f} {K*batch/dt:>7.2f} "
                  f"{flops/dt/V5E_PEAK:>6.3f}", flush=True)
        except Exception as e:
            print(f"{str(remat):>8} {batch:>3} {K*batch:>4}  "
                  f"FAILED: {type(e).__name__}: {str(e)[:400]}", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
