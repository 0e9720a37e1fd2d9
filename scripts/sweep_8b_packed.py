"""Measure sequence packing on the 8B (int8 base) train legs, real chip.

The 0.5B packed leg won +21% (scripts/sweep_packed.py F) because the bench
workload's rows are only ~61% real tokens. The 8B legs are compute-bound
(MFU 0.75 at k=2), so the same fill gain should convert ~1:1 into
samples/s — this sweep checks that, plus whether the packed activations
still fit the ~7 GB left over the 8.04 GB int8 base.

Variants (k, pack_len or None, rows/fold, remat):
  A. unpacked k=2 B=2 S=512, dots   — the bench 8B leg (baseline)
  B. packed 1024 k=2 B=1, dots      — same tokens/step as A, ~0.9 fill
  C. packed 1024 k=2 B=2, dots      — 2x tokens/step (may OOM)
  D. unpacked k=5 B=1 S=512, attn   — the bench north-star-fold leg
  E. packed 1024 k=5 B=1, attn      — packed north-star folds (may OOM)

Run: python scripts/sweep_8b_packed.py [steps] [variants]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tst.aux.ckpt import enable_compilation_cache
from tst.data.folds import kfold_assign
from tst.data.packing import make_packed_fold_batches, pack_fold_datasets
from tst.data.synthetic import make_synthetic_mcq
from tst.data.tokenize import ByteTokenizer, tokenize_dataset
from tst.models.decoder import init_params, spec_by_name
from tst.models.lora import LoraSpec
from tst.train.sft import FoldTrainer, make_fold_batches
import tst.train.sft as sft_mod

enable_compilation_cache()

SEQ = 512
STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
WARMUP = 2
VARIANTS = sys.argv[2].upper() if len(sys.argv) > 2 else "ABCDE"

spec = spec_by_name("llama3-8b")
ds = make_synthetic_mcq(n=256, bias_fraction=0.5, seed=0)
tb = tokenize_dataset(ds, ByteTokenizer(), max_len=SEQ)
lspec = LoraSpec(rank=16, alpha=32.0, dtype=spec.dtype)
t_max = int(np.max(tb.lengths - tb.answer_pos - 1))
params = init_params(jax.random.key(0), spec, quantize=True)
base_gb = sum(l.size * l.dtype.itemsize
              for l in jax.tree.leaves(params)) / 1e9
print(f"t_max={t_max} mean_len={tb.lengths.mean():.1f} "
      f"int8 base {base_gb:.2f} GB", flush=True)


def run_unpacked(k, batch, remat):
    fold_id = kfold_assign(ds, k, seed=0)
    batches = make_fold_batches(fold_id, k, batch, epochs=50, seed=0)
    tr = FoldTrainer(spec, lspec, k=k, lr=1e-4, total_steps=STEPS + WARMUP,
                     use_pallas=True, remat=remat, t_max=t_max)
    lora, opt = tr.init_state(jax.random.key(1))
    tokens = jnp.asarray(tb.tokens)
    mask = jnp.asarray(tb.loss_mask)
    pos = jnp.asarray(tb.answer_pos)
    t0 = time.perf_counter()
    for t in range(WARMUP):
        lora, opt, loss = tr._step_fn(params, lora, opt, tokens, mask, pos,
                                      jnp.asarray(batches[t]))
    np.asarray(loss)
    print(f"  compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for t in range(WARMUP, WARMUP + STEPS):
        lora, opt, loss = tr._step_fn(params, lora, opt, tokens, mask, pos,
                                      jnp.asarray(batches[t]))
    np.asarray(loss)
    dt = (time.perf_counter() - t0) / STEPS
    return k * batch / dt, dt


def run_packed(k, pack_len, batch, remat):
    fold_id = kfold_assign(ds, k, seed=0)
    fp = pack_fold_datasets(tb, fold_id, k, pack_len)
    batches = make_packed_fold_batches(fp.n_rows, batch, epochs=50, seed=0)
    tr = FoldTrainer(spec, lspec, k=k, lr=1e-4, total_steps=STEPS + WARMUP,
                     use_pallas=True, remat=remat, t_max=t_max, packed=True)
    lora, opt = tr.init_state(jax.random.key(1))
    tokens = jnp.asarray(fp.tokens)
    mask = jnp.asarray(fp.loss_mask)
    pos = jnp.asarray(fp.answer_pos)
    segs = jnp.asarray(fp.seg_starts)
    t0 = time.perf_counter()
    for t in range(WARMUP):
        lora, opt, loss = tr._step_fn(params, lora, opt, tokens, mask, pos,
                                      segs, jnp.asarray(batches[t]))
    np.asarray(loss)
    print(f"  fill={fp.fill_fraction:.3f} rows/fold={fp.n_rows.tolist()} "
          f"compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
    idx = np.asarray(batches[WARMUP: WARMUP + STEPS])
    fold_ax = np.arange(k)[None, :, None]
    n_samples = int(fp.n_segs[fold_ax, idx].sum())
    t0 = time.perf_counter()
    for t in range(WARMUP, WARMUP + STEPS):
        lora, opt, loss = tr._step_fn(params, lora, opt, tokens, mask, pos,
                                      segs, jnp.asarray(batches[t]))
    np.asarray(loss)
    wall = time.perf_counter() - t0
    return n_samples / wall, wall / STEPS


#: (label, k, pack_len or None, rows/fold, remat)
_CASES = {
    "A": ("unpacked k=2 B=2 S=512 dots (bench 8B leg)", 2, None, 2, "dots"),
    "B": ("packed 1024 k=2 B=1 dots", 2, 1024, 1, "dots"),
    "C": ("packed 1024 k=2 B=2 dots", 2, 1024, 2, "dots"),
    "D": ("unpacked k=5 B=1 S=512 attn (north-star folds)", 5, None, 1,
          "attn"),
    "E": ("packed 1024 k=5 B=1 attn", 5, 1024, 1, "attn"),
}

for letter in VARIANTS:
    if letter not in _CASES:
        print(f"unknown variant {letter!r} — skipping", flush=True)
        continue
    label, k, pack_len, batch, remat = _CASES[letter]
    sft_mod._STEP_CACHE.clear()
    jax.clear_caches()
    print(f"{letter}. {label}", flush=True)
    try:
        if pack_len is None:
            sps, dt = run_unpacked(k, batch, remat)
        else:
            sps, dt = run_packed(k, pack_len, batch, remat)
        print(f"  -> {sps:.2f} samples/s  step {dt*1e3:.1f} ms", flush=True)
    except Exception as e:
        print(f"  -> FAILED {type(e).__name__}: {e}", flush=True)
