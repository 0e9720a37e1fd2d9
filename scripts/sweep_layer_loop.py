"""Measure layer-loop strategy: lax.scan vs fully-unrolled Python loop.

docs/ROADMAP.md item 2: under remat, the scan stacks each layer's saved
activations into [L, ...] buffers via dynamic-update-slice — profiled at
~1 ms/layer of pure write bandwidth the producing matmuls don't cover.
A fully-unrolled loop keeps each layer's saves as individual buffers XLA
can fuse into their producers. Costs: n_layers× larger HLO (compile time)
and per-layer weight slices instead of a scanned operand.

Run on the real chip: python scripts/sweep_layer_loop.py [remat:batch ...]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from _workload import make_workload, time_train_steps

import tst.models.decoder as decoder
from tst.aux.flops import train_step_flops
from tst.train.sft import FoldTrainer

V5E_PEAK = 197e12
STEPS, WARM = 12, 3


def main():
    w = make_workload()
    print(f"backend={'tpu' if w.on_tpu else 'cpu'} model={w.spec.name} "
          f"k={w.k} seq={w.seq}")
    print(f"{'loop':>7} {'remat':>6} {'B':>3} {'compile_s':>9} "
          f"{'step_ms':>8} {'samp/s':>8} {'MFU':>6} {'hbm_gb':>7}")

    cases = [(loop, r, b) for loop in ("scan", "unroll")
             for (r, b) in (("dots", 4),)]
    if len(sys.argv) > 1:  # e.g. "unroll:dots:4 scan:light:8"
        cases = []
        for a in sys.argv[1:]:
            loop, r, b = a.split(":")
            cases.append((loop, r if r != "False" else False, int(b)))
    import tst.train.sft as sft

    for loop, remat, batch in cases:
        decoder.LAYER_LOOP = loop
        sft._STEP_CACHE.clear()  # LAYER_LOOP is read at trace time
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
            print(f"{loop:>7} {str(remat):>6} {batch:>3} {compile_s:>9.1f} "
                  f"{dt*1e3:>8.1f} {w.k*batch/dt:>8.1f} {mfu:>6.3f} "
                  f"{hbm:>7.2f}", flush=True)
        except Exception as e:
            print(f"{loop:>7} {str(remat):>6} {batch:>3}  "
                  f"FAILED: {type(e).__name__}: {str(e)[:600]}", flush=True)
        finally:
            decoder.LAYER_LOOP = "scan"


if __name__ == "__main__":
    main()
