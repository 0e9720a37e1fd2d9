"""8B k=5 packed-vs-unpacked probe (north-star fold count, one v5e).

The unpacked 8B k=5 leg runs 8.53 samples/s at B=1 rows of 512 under
"attn" remat, and the B=1..4 sweep is flat (MXU-saturated) — so packing's
fill gain (0.61 -> 0.90) should convert ~1:1 into samples/s. Variants:
  A. unpacked k=5 B=1 S=512, attn remat (the bench leg)
  B. packed 1024 B=1, attn remat, auto dispatch (groups*1024 = 4096 ->
     whole-rows folded, online-softmax kv tiles)
  C. packed 1024 B=1, attn remat, forced one-group row tiles + whole-KV
     (FOLD_BLOCK_Q=1024, FOLD_BLOCK_K=1024 — the 0.5B winner's schedule)

Run: python scripts/sweep_8b_packed.py [steps] [ABC]
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
STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
VARIANTS = sys.argv[2].upper() if len(sys.argv) > 2 else "ABC"
WARMUP = 2

spec = spec_by_name("llama3-8b")
ds = make_synthetic_mcq(n=256, bias_fraction=0.5, seed=0)
tb = tokenize_dataset(ds, ByteTokenizer(), max_len=SEQ)
fold_id = kfold_assign(ds, K, seed=0)
lspec = LoraSpec(rank=16, alpha=32.0, dtype=spec.dtype)
t_max = int(np.max(tb.lengths - tb.answer_pos - 1))
print("building int8 8B base...", flush=True)
params = init_params(jax.random.key(0), spec, quantize=True)
print("base ready", flush=True)


def run(pack_len, batch, remat="attn"):
    if pack_len is None:
        batches = make_fold_batches(fold_id, K, batch, epochs=50, seed=0)
        tr = FoldTrainer(spec, lspec, k=K, lr=1e-4, total_steps=STEPS + WARMUP,
                         use_pallas=True, remat=remat, t_max=t_max)
        lora, opt = tr.init_state(jax.random.key(1))
        args = (jnp.asarray(tb.tokens), jnp.asarray(tb.loss_mask),
                jnp.asarray(tb.answer_pos))
        step = lambda t: tr._step_fn(params, lora, opt, *args,
                                     jnp.asarray(batches[t]))
        n_samples = STEPS * K * batch
    else:
        fp = pack_fold_datasets(tb, fold_id, K, pack_len)
        batches = make_packed_fold_batches(fp.n_rows, batch, epochs=50, seed=0)
        tr = FoldTrainer(spec, lspec, k=K, lr=1e-4, total_steps=STEPS + WARMUP,
                         use_pallas=True, remat=remat, t_max=t_max, packed=True)
        lora, opt = tr.init_state(jax.random.key(1))
        args = (jnp.asarray(fp.tokens), jnp.asarray(fp.loss_mask),
                jnp.asarray(fp.answer_pos), jnp.asarray(fp.seg_starts))
        step = lambda t: tr._step_fn(params, lora, opt, *args,
                                     jnp.asarray(batches[t]))
        idx = np.asarray(batches[WARMUP: WARMUP + STEPS])
        n_samples = int(fp.n_segs[np.arange(K)[None, :, None], idx].sum())
        print(f"  fill={fp.fill_fraction:.3f}", flush=True)
    t0 = time.perf_counter()
    for t in range(WARMUP):
        lora, opt, loss = step(t)
    np.asarray(loss)
    print(f"  compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for t in range(WARMUP, WARMUP + STEPS):
        lora, opt, loss = step(t)
    np.asarray(loss)
    wall = time.perf_counter() - t0
    del lora, opt
    return n_samples / wall, wall / STEPS


def clear():
    sft_mod._STEP_CACHE.clear()


if "A" in VARIANTS:
    print("A. 8B unpacked k=5 B=1 S=512 attn-remat", flush=True)
    sps, dt = run(None, 1)
    print(f"  -> {sps:.2f} samples/s  step {dt*1e3:.0f} ms", flush=True)

if "B" in VARIANTS:
    clear()
    print("B. 8B packed 1024 B=1 attn-remat (auto dispatch)", flush=True)
    sps, dt = run(1024, 1)
    print(f"  -> {sps:.2f} samples/s  step {dt*1e3:.0f} ms", flush=True)

if "C" in VARIANTS:
    clear()
    fa.FOLD_BLOCK_Q, fa.FOLD_BLOCK_K = 1024, 1024
    print("C. 8B packed 1024 B=1 attn-remat (one-group row tiles, whole KV)",
          flush=True)
    sps, dt = run(1024, 1)
    print(f"  -> {sps:.2f} samples/s  step {dt*1e3:.0f} ms", flush=True)
    fa.FOLD_BLOCK_Q, fa.FOLD_BLOCK_K = None, None
