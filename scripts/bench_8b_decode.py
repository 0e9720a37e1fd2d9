"""8B greedy-decode serving leg: int8 vs int4 base, steps-only rate.

Decode at batch sizes this small is weight-read-bound: each step streams
the whole quantized base from HBM (int8 ~8.0 GB, int4 ~4.6 GB at 8B), so
int4 should land near 1.7x on the steps-only rate if the path is at its
bandwidth floor (the 0.5B leg measured within ~2x of it). This script
pins that number for the serving story (numeric/open scoring at 8B).

Run: python scripts/bench_8b_decode.py [bits ...]   (default: 8 4)
"""

from __future__ import annotations

import sys

import jax
import numpy as np

from _workload import make_workload, time_decode_steps

from tst.models.decode import greedy_decode, layer_loop_for
from tst.models.decoder import init_params, spec_by_name
from tst.models.quant import quantized_bytes

B, MAX_NEW, SHORT_NEW, REPS = 16, 16, 4, 3


def main():
    w = make_workload()
    if not w.on_tpu:
        print("needs the real chip", file=sys.stderr)
        return
    spec8 = spec_by_name("llama3-8b")
    loop = layer_loop_for(spec8)
    rows = np.arange(B) % w.tokens.shape[0]
    dtoks = w.tokens[rows]
    dlen = w.pos[rows] + 1

    bits_list = [int(a) for a in sys.argv[1:]] or [8, 4]
    print(f"{'bits':>4} {'base_gb':>7} {'compile_s':>9} {'tok/s':>8} "
          f"{'step_ms':>8} {'steps_tok/s':>11} {'gbps_weights':>12}")
    for bits in bits_list:
        params = init_params(jax.random.key(0), spec8, quantize=True,
                             bits=bits)
        base_gb = quantized_bytes(params) / 1e9

        def make_fn(n_new, _loop=loop):
            return jax.jit(lambda prm, t, pl_: greedy_decode(
                prm, t, pl_, n_new, spec8, use_pallas=True,
                layer_loop=_loop))

        compile_s, dt, step_ms, steps_rate = time_decode_steps(
            make_fn, (params, dtoks, dlen), B,
            max_new=MAX_NEW, short_new=SHORT_NEW, reps=REPS)
        if step_ms is None:
            step_ms = steps_rate = gbps = float("nan")
        else:
            # effective HBM rate implied by reading the base once per step
            gbps = base_gb / (step_ms / 1e3)
        print(f"{bits:>4} {base_gb:>7.2f} {compile_s:>9.1f} "
              f"{B * MAX_NEW / dt:>8.1f} {step_ms:>8.2f} {steps_rate:>11.1f} "
              f"{gbps:>12.1f}")
        sys.stdout.flush()
        del params


if __name__ == "__main__":
    main()
