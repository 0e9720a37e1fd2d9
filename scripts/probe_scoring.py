"""Measure the held-out scoring leg: unpacked-all-rows (round-3 behavior)
vs MCQ-masked unpacked vs packed (round-4 scoring campaign).

The 8B anchor spends 281 s of its 1046 s wall in post-train scoring
(docs/RESULTS.md round-4 anchor). This probe times the three MCQ-scorer
variants plus the numeric decode leg at anchor-like shapes on the real
chip, compile excluded (each program is warmed once before timing).

Run: python scripts/probe_scoring.py [model] [n] [k]
  model default qwen2.5-0.5b (pass llama3-8b for the anchor model —
  int8 base, ~1 min param init)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tst.aux.ckpt import enable_compilation_cache
from tst.data.folds import kfold_assign
from tst.data.synthetic import make_synthetic_vsi
from tst.data.tokenize import ByteTokenizer, tokenize_dataset
from tst.models.decoder import init_params, spec_by_name
from tst.models.lora import LoraSpec
from tst.train.infer import (score_heldout_mcq, score_heldout_mcq_packed,
                             score_heldout_numeric)
from tst.train.sft import FoldTrainer

enable_compilation_cache()

MODEL = sys.argv[1] if len(sys.argv) > 1 else "qwen2.5-0.5b"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
K = int(sys.argv[3]) if len(sys.argv) > 3 else 5
SEQ, PACK_LEN = 512, 1024

spec = spec_by_name(MODEL)
params = init_params(jax.random.key(0), spec, quantize=MODEL.startswith("llama3-8b"))
lspec = LoraSpec(rank=16, alpha=32.0, dtype=spec.dtype)
tr = FoldTrainer(spec, lspec, k=K, lr=1e-4, total_steps=1, use_pallas=True)
lora, _ = tr.init_state(jax.random.key(1))

ds = make_synthetic_vsi(n=N, bias_fraction=0.4, seed=0)
tb = tokenize_dataset(ds, ByteTokenizer(), max_len=SEQ)
fold_id = kfold_assign(ds, K, seed=0)
tokens = jnp.asarray(tb.tokens)
pos = jnp.asarray(tb.answer_pos)
is_mcq = tb.gold >= 0
mcq_fold = np.where(is_mcq, fold_id, -1)
print(f"{MODEL} n={N} k={K}: {int(is_mcq.sum())} mcq / "
      f"{int((~is_mcq).sum())} numeric, mean len "
      f"{tb.lengths.mean():.0f}/{SEQ}", flush=True)


def timed(tag, fn):
    fn()  # warm (compile)
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{tag}: {dt:.2f} s", flush=True)
    return out, dt


ref, t_all = timed("A unpacked, all rows (r3 behavior)", lambda: score_heldout_mcq(
    params, lora, spec, lspec, tokens, pos, tb.option_token_ids,
    tb.n_options, fold_id, K, use_pallas=True))
masked, t_msk = timed("B unpacked, mcq-only grid", lambda: score_heldout_mcq(
    params, lora, spec, lspec, tokens, pos, tb.option_token_ids,
    tb.n_options, mcq_fold, K, use_pallas=True))
packed, t_pck = timed("C packed, mcq-only", lambda: score_heldout_mcq_packed(
    params, lora, spec, lspec, tb, mcq_fold, K, pack_len=PACK_LEN,
    use_pallas=True))

err = np.abs(packed[is_mcq] - ref[is_mcq]).max()
print(f"packed-vs-unpacked max |dprob| = {err:.2e}", flush=True)
print(f"speedup: masked {t_all / t_msk:.2f}x  packed {t_all / t_pck:.2f}x",
      flush=True)

gold_values = np.array([s.answer_value if s.answer_type == "numeric"
                        else np.nan for s in ds], np.float32)
_, t_num = timed("D numeric decode leg", lambda: score_heldout_numeric(
    params, lora, spec, lspec, tokens, pos, gold_values, fold_id, K,
    tokenizer=ByteTokenizer(), use_pallas=True))
