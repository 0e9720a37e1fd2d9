"""Sweep folded-GQA flash block shapes AT THE TRAIN-STEP level.

Micro-benching individual kernels through this environment's remote PJRT is
dominated by per-program dispatch latency, so each (block_q, block_k) point
is measured as the full fold-parallel train step's samples/s instead
(the metric that matters). Also compares remat="dots" vs "dots_flash"
(saved flash residuals — no backward re-run of the forward kernel).

Run: python scripts/sweep_fold_blocks.py [remat:bq:bk ...]
e.g. python scripts/sweep_fold_blocks.py dots:None:None dots_flash:896:256
"""

from __future__ import annotations

import sys

from _workload import make_workload, time_train_steps

import tst.kernels.flash_attention as fa
import tst.train.sft as sft_mod
from tst.train.sft import FoldTrainer

STEPS, WARM = 12, 3


def main():
    w = make_workload()
    print(f"{'remat':>11} {'bq':>5} {'bk':>4} {'compile_s':>9} "
          f"{'step_ms':>8} {'samp/s':>8}")
    cases = [("dots", None, None), ("dots_flash", None, None),
             ("dots_flash", 1792, None), ("dots_flash", 896, None),
             ("dots_flash", 512, None), ("dots_flash", None, 256),
             ("dots_flash", 896, 256)]
    if len(sys.argv) > 1:  # e.g. "dots_flash:896:256"
        def parse(a):
            r, bq, bk = a.split(":")
            return (r, None if bq == "None" else int(bq),
                    None if bk == "None" else int(bk))
        cases = [parse(a) for a in sys.argv[1:]]
    for remat, bq, bk in cases:
        fa.FOLD_BLOCK_Q, fa.FOLD_BLOCK_K = bq, bk
        sft_mod._STEP_CACHE.clear()  # block sizes bind at trace time
        try:
            tr = FoldTrainer(w.spec, w.lspec, k=w.k, lr=1e-4,
                             total_steps=STEPS + WARM, use_pallas=w.on_tpu,
                             remat=remat, t_max=w.t_max)
            compile_s, dt = time_train_steps(
                w, tr, w.batches()[: STEPS + WARM + 1], STEPS, WARM)
            print(f"{remat:>11} {str(bq):>5} {str(bk):>4} {compile_s:>9.1f} "
                  f"{dt*1e3:>8.1f} {w.k*w.batch/dt:>8.1f}")
        except Exception as e:
            print(f"{remat:>11} {str(bq):>5} {str(bk):>4}  FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}")
    fa.FOLD_BLOCK_Q = fa.FOLD_BLOCK_K = None


if __name__ == "__main__":
    main()
