"""Sweep the flash softmax-chain variants AT THE TRAIN-STEP level.

Round-3 VPU-gap work (VERDICT r2 item 1): the folded one-shot forward runs
at ~42% of its K=64 practical peak, blamed on the f32 softmax chain. Two
levers, measured here in the real fold-parallel train step:

  * PRESCALE_Q  — fold sm_scale into the [rows, d] operand tiles (8× fewer
    multiplies than scaling the [rows, bk] logits tile; backward drops the
    full-tile ds*scale too)
  * SOFTMAX_BF16 — run mask/max/exp/sum on bf16 logits from the MXU

Run: python scripts/sweep_softmax_variants.py
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
    print(f"{'prescale':>8} {'bf16chain':>9} {'compile_s':>9} "
          f"{'step_ms':>8} {'samp/s':>8}")
    cases = [(False, False), (True, False), (True, True), (False, True)]
    for prescale, bf16 in cases:
        fa.PRESCALE_Q, fa.SOFTMAX_BF16 = prescale, bf16
        sft_mod._STEP_CACHE.clear()  # flags bind at trace time
        try:
            tr = FoldTrainer(w.spec, w.lspec, k=w.k, lr=1e-4,
                             total_steps=STEPS + WARM, use_pallas=w.on_tpu,
                             remat="dots", t_max=w.t_max)
            compile_s, dt = time_train_steps(
                w, tr, w.batches()[: STEPS + WARM + 1], STEPS, WARM)
            print(f"{prescale!s:>8} {bf16!s:>9} {compile_s:>9.1f} "
                  f"{dt*1e3:>8.1f} {w.k*w.batch/dt:>8.1f}", flush=True)
        except Exception as e:
            print(f"{prescale!s:>8} {bf16!s:>9}  FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
    fa.PRESCALE_Q, fa.SOFTMAX_BF16 = True, False


if __name__ == "__main__":
    main()
