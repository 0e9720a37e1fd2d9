"""Dump the optimized HLO of the fold-parallel train step and show the
definitions of named fusions (for mapping profiler op names to source ops).

Run: python scripts/dump_hlo.py [op_name ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tst.aux.ckpt import enable_compilation_cache
from tst.data.folds import kfold_assign
from tst.data.synthetic import make_synthetic_mcq
from tst.data.tokenize import ByteTokenizer, tokenize_dataset
from tst.models.decoder import init_params, spec_by_name
from tst.models.lora import LoraSpec
from tst.train.sft import FoldTrainer, make_fold_batches


def main():
    enable_compilation_cache()
    on_tpu = jax.default_backend() in ("tpu", "axon")
    spec = spec_by_name("qwen2.5-0.5b" if on_tpu else "small")
    K, BATCH, SEQ = 5, 4, 512
    ds = make_synthetic_mcq(n=256, bias_fraction=0.5, seed=0)
    tb = tokenize_dataset(ds, ByteTokenizer(), max_len=SEQ)
    fold_id = kfold_assign(ds, K, seed=0)
    lspec = LoraSpec(rank=16, alpha=32.0, dtype=spec.dtype)
    t_max = int(np.max(tb.lengths - tb.answer_pos - 1))
    params = init_params(jax.random.key(0), spec)
    tokens = jnp.asarray(tb.tokens)
    mask = jnp.asarray(tb.loss_mask)
    pos = jnp.asarray(tb.answer_pos)
    batches = make_fold_batches(fold_id, K, BATCH, epochs=10, seed=0)

    tr = FoldTrainer(spec, lspec, k=K, lr=1e-4, total_steps=16,
                     use_pallas=on_tpu, remat="dots" if on_tpu else False,
                     t_max=t_max)
    lora, opt = tr.init_state(jax.random.key(1))
    compiled = tr._step_fn.lower(params, lora, opt, tokens, mask, pos,
                                 jnp.asarray(batches[0])).compile()
    txt = compiled.as_text()
    path = "/tmp/train_step_hlo.txt"
    with open(path, "w") as f:
        f.write(txt)
    print(f"wrote {path}: {len(txt)} bytes")
    for name in sys.argv[1:]:
        # the defining line plus any called computation header
        for m in re.finditer(rf"%?{re.escape(name)}\b[^\n]*=", txt):
            line = txt[m.start(): txt.index("\n", m.start())]
            print("\n==", line[:600])


if __name__ == "__main__":
    main()
