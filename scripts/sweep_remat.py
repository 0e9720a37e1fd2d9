"""Sweep remat policies × batch sizes for the fold-parallel train step.

VERDICT r1 weak #6 follow-up: find the fastest (remat, batch) point for the
tracked 0.5B metric. Candidates:
  * dots       — round-2 default; recomputes the flash fwd in backward
  * dots_attn  — dots + saved attention output (no flash recompute)
  * light      — saves all but the [S, d_ff] MLP hiddens (backward re-runs
                 gate/up matmuls); ~77% less saved-activation HBM → room for
                 bigger batches
  * False      — no remat at all (if it fits)

Run on the real chip: python scripts/sweep_remat.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tst.aux.ckpt import enable_compilation_cache
from tst.aux.flops import train_step_flops
from tst.data.folds import kfold_assign
from tst.data.synthetic import make_synthetic_mcq
from tst.data.tokenize import ByteTokenizer, tokenize_dataset
from tst.models.decoder import init_params, spec_by_name
from tst.models.lora import LoraSpec
from tst.train.sft import FoldTrainer, make_fold_batches

V5E_PEAK = 197e12


def main():
    enable_compilation_cache()
    on_tpu = jax.default_backend() in ("tpu", "axon")
    spec = spec_by_name("qwen2.5-0.5b" if on_tpu else "small")
    K, SEQ, STEPS, WARM = 5, 512, 12, 3

    ds = make_synthetic_mcq(n=256, bias_fraction=0.5, seed=0)
    tb = tokenize_dataset(ds, ByteTokenizer(), max_len=SEQ)
    fold_id = kfold_assign(ds, K, seed=0)
    lspec = LoraSpec(rank=16, alpha=32.0, dtype=spec.dtype)
    t_max = int(np.max(tb.lengths - tb.answer_pos - 1))
    params = init_params(jax.random.key(0), spec)
    tokens = jnp.asarray(tb.tokens)
    mask = jnp.asarray(tb.loss_mask)
    pos = jnp.asarray(tb.answer_pos)

    print(f"backend={jax.default_backend()} model={spec.name} k={K} seq={SEQ}")
    print(f"{'remat':>10} {'B':>3} {'rows':>4} {'compile_s':>9} "
          f"{'step_ms':>8} {'samp/s':>8} {'MFU':>6} {'hbm_gb':>7}")

    import itertools
    cases = [(r, b) for r in ("dots", "dots_attn", "light", False)
             for b in (4, 8, 12)]
    if len(sys.argv) > 1:  # e.g. "light:4 False:8"
        cases = [(r if r != "False" else False, int(b))
                 for r, b in (a.split(":") for a in sys.argv[1:])]
    for remat, batch in cases:
        if True:
            try:
                batches = make_fold_batches(fold_id, K, batch, epochs=80,
                                            seed=0)[: STEPS + WARM + 1]
                tr = FoldTrainer(spec, lspec, k=K, lr=1e-4,
                                 total_steps=STEPS + WARM, use_pallas=on_tpu,
                                 remat=remat, t_max=t_max)
                lora, opt = tr.init_state(jax.random.key(1))
                t0 = time.perf_counter()
                lora, opt, loss = tr._step_fn(params, lora, opt, tokens, mask,
                                              pos, jnp.asarray(batches[0]))
                np.asarray(loss)
                compile_s = time.perf_counter() - t0
                compiled = tr._step_fn.lower(
                    params, lora, opt, tokens, mask, pos,
                    jnp.asarray(batches[0])).compile()
                try:
                    m = compiled.memory_analysis()
                    hbm = (m.argument_size_in_bytes + m.output_size_in_bytes
                           + m.temp_size_in_bytes) / 1e9
                except Exception:
                    hbm = float("nan")
                for t in range(1, WARM):
                    lora, opt, loss = tr._step_fn(params, lora, opt, tokens,
                                                  mask, pos,
                                                  jnp.asarray(batches[t]))
                np.asarray(loss)
                t0 = time.perf_counter()
                for t in range(WARM, WARM + STEPS):
                    lora, opt, loss = tr._step_fn(params, lora, opt, tokens,
                                                  mask, pos,
                                                  jnp.asarray(batches[t]))
                np.asarray(loss)
                dt = (time.perf_counter() - t0) / STEPS
                flops = train_step_flops(spec, lspec, n_rows=K * batch,
                                         seq=SEQ, t_max=t_max,
                                         remat=remat)["model_flops"]
                mfu = flops / dt / V5E_PEAK if on_tpu else float("nan")
                print(f"{str(remat):>10} {batch:>3} {K*batch:>4} "
                      f"{compile_s:>9.1f} {dt*1e3:>8.1f} "
                      f"{K*batch/dt:>8.1f} {mfu:>6.3f} {hbm:>7.2f}")
                del lora, opt
            except Exception as e:
                print(f"{str(remat):>10} {batch:>3} {K*batch:>4}  "
                      f"FAILED: {type(e).__name__}: {str(e)[:600]}")


if __name__ == "__main__":
    main()
