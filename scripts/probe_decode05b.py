"""0.5B fold-vmapped held-out decode: scan vs unroll layer loop.

Companion to probe_decode8b.py — the 8B sweep measured scan 5.1x faster
than unroll for the fold-vmapped decode (16.9 vs 86.6 s); this checks
whether the same holds at 0.5B before hardening the dispatch rule.

Run: python scripts/probe_decode05b.py
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
from tst.train.infer import _decode_heldout_rows
from tst.train.sft import FoldTrainer

enable_compilation_cache()

K, SEQ, MAX_NEW, N = 5, 512, 12, 4096
spec = spec_by_name("qwen2.5-0.5b")
params = init_params(jax.random.key(0), spec)
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


run_leg("unroll chunk=auto(32)", layer_loop="unroll")
run_leg("scan chunk=auto(32)", layer_loop="scan")
