"""Dump the optimized HLO of the fold-parallel train step and show the
definitions of named fusions (for mapping profiler op names to source ops).

Run: python scripts/dump_hlo.py [op_name ...]
"""

from __future__ import annotations

import re
import sys

import jax
import jax.numpy as jnp

from _workload import make_workload

from tst.train.sft import FoldTrainer


def main():
    w = make_workload()
    tr = FoldTrainer(w.spec, w.lspec, k=w.k, lr=1e-4, total_steps=16,
                     use_pallas=w.on_tpu,
                     remat="dots" if w.on_tpu else False, t_max=w.t_max)
    lora, opt = tr.init_state(jax.random.key(1))
    compiled = tr._step_fn.lower(w.params, lora, opt, w.tokens, w.mask,
                                 w.pos, jnp.asarray(w.batches()[0])).compile()
    txt = compiled.as_text()
    path = "/tmp/train_step_hlo.txt"
    with open(path, "w") as f:
        f.write(txt)
    print(f"wrote {path}: {len(txt)} bytes")
    for name in sys.argv[1:]:
        for m in re.finditer(rf"%?{re.escape(name)}\b[^\n]*=", txt):
            line = txt[m.start(): txt.index("\n", m.start())]
            print("\n==", line[:600])


if __name__ == "__main__":
    main()
