"""8B base-quantization × remat sweep: does int4 (RTN-g128, ~4.6 GB base)
buy back the remat headroom int8 (8.04 GB) does not have at k=5?

Context (docs/RESULTS.md round 2/3): at 8B the int8 base + k=5×B1 step only
fits with FULL remat (8.27 samples/s, MFU 0.602); "dots" fits k=2×B2 and is
+19% there. int4 frees ~3.4 GB — enough, on paper, for dots/flash saves at
k=5. This sweep measures it on the real chip.

Run: python scripts/sweep_8b_int4.py [bits:remat:k:batch ...]
e.g.  python scripts/sweep_8b_int4.py 8:full:5:1 4:dots:5:1 4:flash:5:1
Defaults cover the decision points with the fewest remote compiles.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from _workload import make_workload, time_train_steps

from tst.aux.flops import train_step_flops
from tst.models.decoder import init_params, spec_by_name
from tst.models.lora import LoraSpec
from tst.models.quant import quantized_bytes
from tst.train.sft import FoldTrainer

V5E_PEAK = 197e12
STEPS, WARM = 6, 2

CASES = [
    (8, True, 5, 1),     # round-2/3 reference point: int8 forces full remat
    (4, True, 5, 1),     # weight-read halving alone
    (4, "dots", 5, 1),   # the headroom hypothesis (int8 compile-OOMs here)
    (4, "flash", 5, 1),  # cheapest-saves policy between full and dots
    (4, "dots", 2, 2),   # vs int8's 9.54 samples/s k=2×B2 point
]


def main():
    w = make_workload()  # 0.5B geometry; we only reuse its token batch
    if not w.on_tpu:
        print("needs the real chip", file=sys.stderr)
        return
    spec8 = spec_by_name("llama3-8b")
    lspec8 = LoraSpec(rank=16, alpha=32.0, dtype=spec8.dtype)

    cases = CASES
    if len(sys.argv) > 1:
        def parse(a):
            bits, remat, k, b = a.split(":")
            return (int(bits), True if remat == "full" else remat,
                    int(k), int(b))
        cases = [parse(a) for a in sys.argv[1:]]

    print(f"{'bits':>4} {'remat':>6} {'k':>2} {'B':>2} {'base_gb':>7} "
          f"{'compile_s':>9} {'step_ms':>8} {'samp/s':>7} {'MFU':>6} "
          f"{'hbm_gb':>7}")
    params = {}  # bits -> tree, built lazily, freed between bit widths
    for bits, remat, k, batch in cases:
        try:
            if bits not in params:
                params.clear()  # never hold int8 AND int4 8B trees at once
                params[bits] = init_params(jax.random.key(0), spec8,
                                           quantize=True, bits=bits)
            p8 = params[bits]
            base_gb = quantized_bytes(p8) / 1e9
            tr = FoldTrainer(spec8, lspec8, k=k, lr=1e-4,
                             total_steps=STEPS + WARM, use_pallas=True,
                             remat=remat, t_max=w.t_max)
            w8 = type(w)(**{**w.__dict__, "spec": spec8, "lspec": lspec8,
                            "params": p8, "k": k, "batch": batch})
            batches = w8.batches(batch=batch)[: STEPS + WARM + 1]
            compile_s, dt = time_train_steps(w8, tr, batches, STEPS, WARM)
            try:
                m = tr._step_fn.lower(
                    p8, *tr.init_state(jax.random.key(1)),
                    w.tokens, w.mask, w.pos, jnp.asarray(batches[0])
                ).compile().memory_analysis()
                hbm = (m.argument_size_in_bytes + m.output_size_in_bytes
                       + m.temp_size_in_bytes) / 1e9
            except Exception:
                hbm = float("nan")
            flops = train_step_flops(spec8, lspec8, n_rows=k * batch,
                                     seq=w.seq, t_max=w.t_max,
                                     remat=remat)["model_flops"]
            print(f"{bits:>4} {str(remat):>6} {k:>2} {batch:>2} "
                  f"{base_gb:>7.2f} {compile_s:>9.1f} {dt*1e3:>8.1f} "
                  f"{k*batch/dt:>7.2f} {flops/dt/V5E_PEAK:>6.3f} "
                  f"{hbm:>7.2f}")
        except Exception as e:
            print(f"{bits:>4} {str(remat):>6} {k:>2} {batch:>2}  "
                  f"FAILED: {type(e).__name__}: {str(e)[:400]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
