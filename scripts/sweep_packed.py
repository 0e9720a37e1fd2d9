"""Measure sequence packing at the headline bench shape on the real chip.

Compares, at the Qwen2.5-0.5B k=5 'dots' workload (bench.py leg 1):
  A. unpacked baseline: B=4 rows of S=512 (~61% fill at synthetic n=256)
  B. packed pack_len=1024, B=2 (same 2048 tokens/fold-step, ~88% fill),
     auto attention schedule (groups*1024 = 7168 > FOLD_MAX_ROWS -> tiled
     one-shot whole-KV kernel)
  C. same as B but forcing the folded-GQA schedule with row tiles of one
     group (FOLD_MAX_ROWS=8192, FOLD_BLOCK_Q=1024)

The tracked metric counts REAL samples (packed segments), not rows.
Run: python scripts/sweep_packed.py [steps]
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
import tst.kernels.flash_attention as fa
import tst.train.sft as sft_mod

enable_compilation_cache()

K, SEQ = 5, 512
STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 12
WARMUP = 3
#: which variants to run, e.g. `python scripts/sweep_packed.py 12 FGH`
VARIANTS = sys.argv[2].upper() if len(sys.argv) > 2 else "ABCDEFGH"

spec = spec_by_name("qwen2.5-0.5b")
ds = make_synthetic_mcq(n=256, bias_fraction=0.5, seed=0)
tb = tokenize_dataset(ds, ByteTokenizer(), max_len=SEQ)
fold_id = kfold_assign(ds, K, seed=0)
lspec = LoraSpec(rank=16, alpha=32.0, dtype=spec.dtype)
t_max = int(np.max(tb.lengths - tb.answer_pos - 1))
params = init_params(jax.random.key(0), spec)
print(f"t_max={t_max} mean_len={tb.lengths.mean():.1f} bucket={tb.seq_len}",
      flush=True)


def run_unpacked(batch):
    batches = make_fold_batches(fold_id, K, batch, epochs=50, seed=0)
    tr = FoldTrainer(spec, lspec, k=K, lr=1e-4, total_steps=STEPS + WARMUP,
                     use_pallas=True, remat="dots", t_max=t_max)
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
    return K * batch / dt, dt


def run_packed(pack_len, batch):
    fp = pack_fold_datasets(tb, fold_id, K, pack_len)
    batches = make_packed_fold_batches(fp.n_rows, batch, epochs=50, seed=0)
    tr = FoldTrainer(spec, lspec, k=K, lr=1e-4, total_steps=STEPS + WARMUP,
                     use_pallas=True, remat="dots", t_max=t_max, packed=True)
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
    fold_ax = np.arange(K)[None, :, None]
    n_samples = int(fp.n_segs[fold_ax, idx].sum())
    t0 = time.perf_counter()
    for t in range(WARMUP, WARMUP + STEPS):
        lora, opt, loss = tr._step_fn(params, lora, opt, tokens, mask, pos,
                                      segs, jnp.asarray(batches[t]))
    np.asarray(loss)
    wall = time.perf_counter() - t0
    return n_samples / wall, wall / STEPS


def clear():
    sft_mod._STEP_CACHE.clear()
    jax.clear_caches()



#: (label, pack_len or None=unpacked, batch,
#:  (fold_max, fold_bq, fold_bk) or None,
#:  (seg_sparse_min_s, seg_bq, seg_bk) or None)
_OFF = 1 << 30  # SEG_SPARSE_MIN_S value that disables the sparse schedule
_CASES = {
    "A": ("unpacked B=4 S=512 (baseline)", None, 4, None, None),
    "B": ("packed 1024 B=2 (tiled one-shot)", 1024, 2, None, (_OFF, None, None)),
    "C": ("packed 1024 B=2 (folded, online-softmax kv tiles)", 1024, 2,
          (8192, 1024, None), (_OFF, None, None)),
    "D": ("packed 1024 B=2 (folded one-shot, group row tiles)", 1024, 2,
          (8192, 1024, 1024), (_OFF, None, None)),
    "E": ("packed 1024 B=3 (one-shot, sparse OFF)", 1024, 3, None,
          (_OFF, None, None)),
    "F": ("packed 1024 B=3 (folded one-shot)", 1024, 3, (8192, 1024, 1024),
          (_OFF, None, None)),
    "G": ("packed 1024 B=4 (folded one-shot)", 1024, 4, (8192, 1024, 1024),
          (_OFF, None, None)),
    "H": ("packed 2048 B=1 (folded one-shot, 512-row tiles)", 2048, 1,
          (16384, 512, 2048), (_OFF, None, None)),
    "I": ("packed 2048 B=2 (folded one-shot, 512-row tiles)", 2048, 2,
          (16384, 512, 2048), (_OFF, None, None)),
    "J": ("packed 1024 B=3 (folded one-shot, 2-group row tiles)", 1024, 3,
          (8192, 2048, 1024), (_OFF, None, None)),
    "K": ("packed 1024 B=3 (folded one-shot, 512-row tiles)", 1024, 3,
          (8192, 512, 1024), (_OFF, None, None)),
    # segment-sparse CHUNKED one-shot (round 4): position-contiguous row
    # tiles bq, whole KV in VMEM, [bq, chunk] column chunks skipped when
    # outside the tile's segment window. seg_knobs = (min_s, bq, chunk).
    "L": ("packed 1024 B=3 chunked bq=128 ck=128", 1024, 3, None, (1024, 128, 128)),
    "M": ("packed 1024 B=3 chunked bq=256 ck=256", 1024, 3, None, (1024, 256, 256)),
    "N": ("packed 1024 B=3 chunked bq=512 ck=512", 1024, 3, None, (1024, 512, 512)),
    "P": ("packed 1024 B=3 chunked bq=256 ck=128", 1024, 3, None, (1024, 256, 128)),
    "Q": ("packed 1024 B=3 chunked bq=512 ck=256", 1024, 3, None, (1024, 512, 256)),
    "R": ("packed 1024 B=4 chunked (best tiles: edit me)", 1024, 4, None,
          (1024, 256, 256)),
    "S": ("packed 2048 B=1 chunked bq=256 ck=256", 2048, 1, None, (1024, 256, 256)),
    "T": ("packed 2048 B=2 chunked bq=256 ck=256", 2048, 2, None, (1024, 256, 256)),
    "U": ("packed 2048 B=1 chunked bq=512 ck=512", 2048, 1, None, (1024, 512, 512)),
    "V": ("packed 2048 B=2 chunked bq=512 ck=512", 2048, 2, None, (1024, 512, 512)),
    "W": ("packed 2048 B=2 chunked bq=512 ck=256", 2048, 2, None, (1024, 512, 256)),
    "X": ("packed 2048 B=3 chunked bq=512 ck=512", 2048, 3, None, (1024, 512, 512)),
}

for letter in VARIANTS:
    if letter not in _CASES:
        print(f"unknown variant {letter!r} — skipping", flush=True)
        continue
    label, pack_len, batch, fold_knobs, seg_knobs = _CASES[letter]
    clear()
    if fold_knobs is not None:
        fa.FOLD_MAX_ROWS, fa.FOLD_BLOCK_Q, fa.FOLD_BLOCK_K = fold_knobs
    if seg_knobs is not None:
        fa.SEG_SPARSE_MIN_S, fa.SEG_BLOCK_Q, fa.SEG_CHUNK = seg_knobs
    print(f"{letter}. {label}", flush=True)
    if pack_len is None:
        sps, dt = run_unpacked(batch)
    else:
        sps, dt = run_packed(pack_len, batch)
    print(f"  -> {sps:.1f} samples/s  step {dt*1e3:.1f} ms", flush=True)
    fa.FOLD_MAX_ROWS, fa.FOLD_BLOCK_Q, fa.FOLD_BLOCK_K = 4096, None, None
    fa.SEG_SPARSE_MIN_S, fa.SEG_BLOCK_Q, fa.SEG_CHUNK = 1024, None, None
