"""Sweep folded-GQA flash block shapes AT THE TRAIN-STEP level.

Micro-benching individual kernels through this environment's remote PJRT is
dominated by per-program dispatch latency, so each (block_q, block_k) point
is measured as the full fold-parallel train step's samples/s instead
(the metric that matters). Also compares remat="dots" vs "dots_flash"
(saved flash residuals — no backward re-run of the forward kernel).

Run: python scripts/sweep_fold_blocks.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import tst.kernels.flash_attention as fa
import tst.train.sft as sft_mod
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
    K, BATCH, SEQ, STEPS, WARM = 5, 4, 512, 12, 3

    ds = make_synthetic_mcq(n=256, bias_fraction=0.5, seed=0)
    tb = tokenize_dataset(ds, ByteTokenizer(), max_len=SEQ)
    fold_id = kfold_assign(ds, K, seed=0)
    lspec = LoraSpec(rank=16, alpha=32.0, dtype=spec.dtype)
    t_max = int(np.max(tb.lengths - tb.answer_pos - 1))
    params = init_params(jax.random.key(0), spec)
    tokens = jnp.asarray(tb.tokens)
    mask = jnp.asarray(tb.loss_mask)
    pos = jnp.asarray(tb.answer_pos)
    batches = make_fold_batches(fold_id, K, BATCH, epochs=80, seed=0)

    print(f"{'remat':>11} {'bq':>5} {'bk':>4} {'compile_s':>9} {'step_ms':>8} {'samp/s':>8}")
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
            tr = FoldTrainer(spec, lspec, k=K, lr=1e-4, total_steps=STEPS + WARM,
                             use_pallas=on_tpu, remat=remat, t_max=t_max)
            lora, opt = tr.init_state(jax.random.key(1))
            t0 = time.perf_counter()
            lora, opt, loss = tr._step_fn(params, lora, opt, tokens, mask,
                                          pos, jnp.asarray(batches[0]))
            np.asarray(loss)
            compile_s = time.perf_counter() - t0
            for t in range(1, WARM):
                lora, opt, loss = tr._step_fn(params, lora, opt, tokens, mask,
                                              pos, jnp.asarray(batches[t]))
            np.asarray(loss)
            t0 = time.perf_counter()
            for t in range(WARM, WARM + STEPS):
                lora, opt, loss = tr._step_fn(params, lora, opt, tokens, mask,
                                              pos, jnp.asarray(batches[t]))
            np.asarray(loss)
            dt = (time.perf_counter() - t0) / STEPS
            print(f"{remat:>11} {str(bq):>5} {str(bk):>4} {compile_s:>9.1f} "
                  f"{dt*1e3:>8.1f} {K*BATCH/dt:>8.1f}")
            del lora, opt
        except Exception as e:
            print(f"{remat:>11} {str(bq):>5} {str(bk):>4}  FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}")
    fa.FOLD_BLOCK_Q = fa.FOLD_BLOCK_K = None


if __name__ == "__main__":
    main()
