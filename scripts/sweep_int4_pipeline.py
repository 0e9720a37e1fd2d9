"""A/B the software-pipelined int4 dequant-matmul body on the real chip.

The serial kernel body makes each grid step's MXU dots depend on that
step's VPU unpack chain; `_kernel_pipe` staggers them through a revolving
VMEM scratch so the VLIW scheduler can co-issue the units. This measures
the full 8B decode step (the kernel's only production consumer) both ways
at B=16 and B=32, steps-only by the difference method (MAX_NEW=16 vs 4).

Run: python scripts/sweep_int4_pipeline.py [B ...]   (default: 16 32)
"""

from __future__ import annotations

import sys

import jax
import numpy as np

from _workload import make_workload, time_decode_steps

from tst.kernels import quant_matmul as qm
from tst.models.decode import greedy_decode, layer_loop_for
from tst.models.decoder import init_params, spec_by_name


def main():
    w = make_workload()
    if not w.on_tpu:
        print("needs the real chip", file=sys.stderr)
        return
    spec8 = spec_by_name("llama3-8b")
    loop = layer_loop_for(spec8)
    params = init_params(jax.random.key(0), spec8, quantize=True, bits=4)

    batches = [int(a) for a in sys.argv[1:]] or [16, 32]
    print(f"{'B':>3} {'pipe':>5} {'compile_s':>9} {'step_ms':>8} "
          f"{'steps_tok/s':>11}")
    for b in batches:
        rows = np.arange(b) % w.tokens.shape[0]
        dtoks = w.tokens[rows]
        dlen = w.pos[rows] + 1
        for pipe in (False, True):
            qm.PIPELINE = pipe

            def make_fn(n_new, _loop=loop):
                return jax.jit(lambda prm, t, pl_: greedy_decode(
                    prm, t, pl_, n_new, spec8, use_pallas=True,
                    layer_loop=_loop))

            compile_s, _, step_ms, steps_tok = time_decode_steps(
                make_fn, (params, dtoks, dlen), b)
            if step_ms is None:
                print(f"{b:>3} {str(pipe):>5} {compile_s:>9.1f} "
                      f"{'n/a (noise)':>8}", flush=True)
                continue
            print(f"{b:>3} {str(pipe):>5} {compile_s:>9.1f} {step_ms:>8.2f} "
                  f"{steps_tok:>11.0f}", flush=True)


if __name__ == "__main__":
    main()
