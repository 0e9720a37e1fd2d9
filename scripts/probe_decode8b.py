"""Decompose the 8B held-out numeric-decode leg (86.6 s for 256 rows,
scripts/probe_scoring.py D) into prefill / decode-steps / per-chunk
overhead, and sweep the two obvious knobs (chunk rows, layer loop).

Run: python scripts/probe_decode8b.py
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
from tst.models.decoder import apply_model, init_params, spec_by_name
from tst.models.lora import LoraSpec
from tst.train.infer import _decode_heldout_rows, _make_decode_fn
from tst.train.sft import FoldTrainer

enable_compilation_cache()

K, SEQ, MAX_NEW, N = 5, 512, 12, 1024
spec = spec_by_name("llama3-8b")
params = init_params(jax.random.key(0), spec, quantize=True)
lspec = LoraSpec(rank=16, alpha=32.0, dtype=spec.dtype)
tr = FoldTrainer(spec, lspec, k=K, lr=1e-4, total_steps=1, use_pallas=True)
lora, _ = tr.init_state(jax.random.key(1))

ds = make_synthetic_vsi(n=N, bias_fraction=0.4, seed=0)
tb = tokenize_dataset(ds, ByteTokenizer(), max_len=SEQ)
fold_id = kfold_assign(ds, K, seed=0)
tokens = jnp.asarray(tb.tokens)
pos = jnp.asarray(tb.answer_pos)
gold = np.array([s.answer_value if s.answer_type == "numeric" else np.nan
                 for s in ds], np.float32)
numeric_rows = np.flatnonzero(np.isfinite(gold))
print(f"{len(numeric_rows)} numeric rows", flush=True)


def run_leg(tag, chunk=None, layer_loop=None):
    import tst.models.decode as dec
    from tst.train.infer import _DECODE_CACHE

    old = dec.LAYER_LOOP_MODE
    if layer_loop:
        dec.LAYER_LOOP_MODE = layer_loop
        _DECODE_CACHE.clear()
    try:
        # warm
        _decode_heldout_rows(params, lora, spec, lspec, tokens, pos,
                             numeric_rows, fold_id, K, MAX_NEW, True,
                             chunk=chunk)
        t0 = time.perf_counter()
        _decode_heldout_rows(params, lora, spec, lspec, tokens, pos,
                             numeric_rows, fold_id, K, MAX_NEW, True,
                             chunk=chunk)
        print(f"{tag}: {time.perf_counter() - t0:.2f} s", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)
    finally:
        if layer_loop:
            dec.LAYER_LOOP_MODE = old
            _DECODE_CACHE.clear()


# the default leg, timed warm (probe_scoring D included one cold compile? no
# — it warmed once; this re-establishes the baseline in-process)
run_leg("baseline chunk=auto(5) unroll")

# single [k, 5] program, timed alone: per-chunk wall
fn = _make_decode_fn(spec, lspec, MAX_NEW, True, with_lora=True)
idx5 = jnp.asarray(np.tile(numeric_rows[:5], (K, 1)))
np.asarray(fn(params, lora, tokens, pos + 1, idx5))
t0 = time.perf_counter()
np.asarray(fn(params, lora, tokens, pos + 1, idx5))
per_chunk = time.perf_counter() - t0
print(f"one [k,5] decode program: {per_chunk:.2f} s", flush=True)

# prefill-only at the same rows: the [k*5, S] forward with return_kv
rows25 = np.asarray(idx5).ravel()
tok25 = tokens[jnp.asarray(rows25)]
pf = jax.jit(lambda p, t: apply_model(p, t, spec, use_pallas=True,
                                      return_kv=True)[0])
np.asarray(pf(params, tok25))
t0 = time.perf_counter()
np.asarray(pf(params, tok25))
print(f"prefill-only [25, {SEQ}] forward: {time.perf_counter() - t0:.2f} s",
      flush=True)

run_leg("chunk=2", chunk=2)
run_leg("chunk=10", chunk=10)
run_leg("layer_loop=scan", layer_loop="scan")
