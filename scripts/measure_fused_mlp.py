"""Measure the fused-MLP kernel inside the REAL fold-parallel train step.

VERDICT r1 item 3: wire it and show a throughput delta, or retire it.
Compares compile wall + steady-state samples/s for fused_mlp on/off at the
bench workload (qwen-0.5b geometry, k=5, B=4, S=512, remat variants).
Run on the real chip: python scripts/measure_fused_mlp.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tst.data.folds import kfold_assign
from tst.data.synthetic import make_synthetic_mcq
from tst.data.tokenize import ByteTokenizer, tokenize_dataset
from tst.models.decoder import init_params, spec_by_name
from tst.models.lora import LoraSpec
from tst.train.sft import FoldTrainer, make_fold_batches
from tst.aux.ckpt import enable_compilation_cache

enable_compilation_cache()

K, BATCH, SEQ, STEPS, WARMUP = 5, 4, 512, 10, 3
spec = spec_by_name("qwen2.5-0.5b")
ds = make_synthetic_mcq(n=256, bias_fraction=0.5, seed=0)
tb = tokenize_dataset(ds, ByteTokenizer(), max_len=SEQ)
fold_id = kfold_assign(ds, K, seed=0)
lspec = LoraSpec(rank=16, alpha=32.0, dtype=spec.dtype)
t_max = int(np.max(tb.lengths - tb.answer_pos - 1))
batches = make_fold_batches(fold_id, K, BATCH, epochs=50, seed=0)[: STEPS + WARMUP]
params = init_params(jax.random.key(0), spec)
tokens = jnp.asarray(tb.tokens)
mask = jnp.asarray(tb.loss_mask)
pos = jnp.asarray(tb.answer_pos)


def run(fused: bool, remat) -> dict:
    trainer = FoldTrainer(spec, lspec, k=K, lr=1e-4, total_steps=STEPS + WARMUP,
                          use_pallas=True, remat=remat, t_max=t_max,
                          fused_mlp=fused)
    lora, opt = trainer.init_state(jax.random.key(1))
    t0 = time.perf_counter()
    lora, opt, loss = trainer._step_fn(params, lora, opt, tokens, mask, pos,
                                       jnp.asarray(batches[0]))
    np.asarray(loss)
    compile_s = time.perf_counter() - t0
    for t in range(1, WARMUP):
        lora, opt, loss = trainer._step_fn(params, lora, opt, tokens, mask,
                                           pos, jnp.asarray(batches[t]))
    np.asarray(loss)
    t0 = time.perf_counter()
    for t in range(WARMUP, WARMUP + STEPS):
        lora, opt, loss = trainer._step_fn(params, lora, opt, tokens, mask,
                                           pos, jnp.asarray(batches[t]))
    np.asarray(loss)
    dt = time.perf_counter() - t0
    return {"fused": fused, "remat": remat, "compile_s": round(compile_s, 1),
            "samples_per_s": round(STEPS * K * BATCH / dt, 2),
            "loss": float(np.asarray(loss).mean())}


for fused, remat in [(False, "dots"), (True, "dots"), (True, False)]:
    try:
        print(json.dumps(run(fused, remat)), flush=True)
    except Exception as e:
        print(json.dumps({"fused": fused, "remat": remat,
                          "error": f"{type(e).__name__}: {str(e)[:300]}"}),
              flush=True)
