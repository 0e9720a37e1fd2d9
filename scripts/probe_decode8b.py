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


# Measured 2026-08-19 (warm, real v5e, 256 numeric rows, k=5, S=512, 12 new):
#   unroll chunk=auto(5): 86.6 s   unroll chunk=2: 19.2 s
#   unroll chunk=10: compile-helper crash (HTTP 500)
#   scan   chunk=auto(5): 17.0 s
# → the fold-vmapped held-out decode wants SCAN at 8B even though the
#   serving (single-model) decode measured unroll faster. Sweep scan×chunk:
run_leg("scan chunk=auto(5)", layer_loop="scan")
run_leg("scan chunk=2", chunk=2, layer_loop="scan")
run_leg("scan chunk=10", chunk=10, layer_loop="scan")
run_leg("scan chunk=16", chunk=16, layer_loop="scan")
run_leg("unroll chunk=2", chunk=2)
run_leg("unroll chunk=1", chunk=1)


def run_deferred(tag, chunk, layer_loop):
    """Chunk loop that enqueues every chunk before the first host sync —
    does per-chunk np.asarray serialization cost anything under the
    remote PJRT?"""
    import tst.models.decode as dec
    from tst.train.infer import _DECODE_CACHE

    old = dec.LAYER_LOOP_MODE
    dec.LAYER_LOOP_MODE = layer_loop
    _DECODE_CACHE.clear()
    try:
        fn = _make_decode_fn(spec, lspec, MAX_NEW, True, with_lora=True)
        m = max(len(numeric_rows[fold_id[numeric_rows] == f])
                for f in range(K))
        idx = np.zeros((K, m), np.int32)
        for f in range(K):
            r = numeric_rows[fold_id[numeric_rows] == f]
            idx[f, : len(r)] = r
        pad = (-m) % chunk
        idx_p = np.pad(idx, ((0, 0), (0, pad)))

        def leg():
            outs = [fn(params, lora, tokens, pos + 1,
                       jnp.asarray(idx_p[:, c0: c0 + chunk]))
                    for c0 in range(0, m + pad, chunk)]
            return np.concatenate([np.asarray(o) for o in outs], axis=1)

        leg()  # warm
        t0 = time.perf_counter()
        leg()
        print(f"{tag}: {time.perf_counter() - t0:.2f} s", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)
    finally:
        dec.LAYER_LOOP_MODE = old
        _DECODE_CACHE.clear()


run_deferred("scan chunk=auto(5) DEFERRED sync", 5, "scan")
