"""Long-sequence remat comparison: full remat vs "attn" (save only q/k/v +
attention output) at S=16384 through the flash path.

At 16k the attention forward is ~half the model FLOPs, so full remat's
backward recompute of it costs ~25% of executed FLOPs; "attn" keeps the
flash inputs/outputs resident (2·q_dim + kv_dim per token/layer, bf16) and
recomputes only the MLP + projections. Run: python scripts/sweep_longseq_remat.py
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
    K, B, STEPS, WARM = 2, 1, 4, 2
    seqs = [16384, 32768] if on_tpu else [1024]

    ds = make_synthetic_mcq(n=64, bias_fraction=0.5, seed=0)
    fold_id = kfold_assign(ds, K, seed=0)
    lspec = LoraSpec(rank=16, alpha=32.0, dtype=spec.dtype)
    params = init_params(jax.random.key(0), spec)

    print(f"backend={jax.default_backend()} model={spec.name} k={K} B={B}")
    print(f"{'seq':>6} {'remat':>6} {'compile_s':>9} {'step_ms':>8} "
          f"{'tok/s':>9} {'hbm_gb':>7}")
    for seq in seqs:
        tb = tokenize_dataset(ds, ByteTokenizer(), max_len=seq)
        t_max = int(np.max(tb.lengths - tb.answer_pos - 1))
        tokens = jnp.asarray(tb.tokens)
        mask = jnp.asarray(tb.loss_mask)
        pos = jnp.asarray(tb.answer_pos)
        batches = make_fold_batches(fold_id, K, B, epochs=10, seed=0)
        for remat in (True, "attn", "dots", "dots_flash"):
            try:
                tr = FoldTrainer(spec, lspec, k=K, lr=1e-4,
                                 total_steps=STEPS + WARM, use_pallas=on_tpu,
                                 remat=remat, t_max=t_max)
                lora, opt = tr.init_state(jax.random.key(1))
                t0 = time.perf_counter()
                lora, opt, loss = tr._step_fn(params, lora, opt, tokens, mask,
                                              pos, jnp.asarray(batches[0]))
                np.asarray(loss)
                compile_s = time.perf_counter() - t0
                try:
                    m = tr._step_fn.lower(
                        params, lora, opt, tokens, mask, pos,
                        jnp.asarray(batches[0])).compile().memory_analysis()
                    hbm = (m.argument_size_in_bytes + m.output_size_in_bytes
                           + m.temp_size_in_bytes) / 1e9
                except Exception:
                    hbm = float("nan")
                for t in range(1, WARM):
                    lora, opt, loss = tr._step_fn(
                        params, lora, opt, tokens, mask, pos,
                        jnp.asarray(batches[t]))
                np.asarray(loss)
                t0 = time.perf_counter()
                for t in range(WARM, WARM + STEPS):
                    lora, opt, loss = tr._step_fn(
                        params, lora, opt, tokens, mask, pos,
                        jnp.asarray(batches[t]))
                np.asarray(loss)
                dt = (time.perf_counter() - t0) / STEPS
                print(f"{seq:>6} {str(remat):>6} {compile_s:>9.1f} "
                      f"{dt*1e3:>8.1f} {K*B*seq/dt:>9.1f} {hbm:>7.2f}")
                del lora, opt
            except Exception as e:
                print(f"{seq:>6} {str(remat):>6}  FAILED: "
                      f"{type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
