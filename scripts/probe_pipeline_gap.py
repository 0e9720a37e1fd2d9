"""Why does the PIPELINE's packed train step run slower than the bench's?

Anchor r4 measured 626 ms/step (synthetic-vsi n=5000, pipeline loop) where
the bench loop measures 273 ms/step at the same [5 folds, 3 rows, 1024]
packed shape (scripts/sweep_packed.py E). Candidate factors, isolated one
at a time on the real chip with the bench-style raw loop:

  A. baseline: synthetic-mcq n=256, t_max=2, no per-step sync  (expect ~273)
  B. dataset size: n=5000 (1315 rows/fold gathered from, bigger HBM arrays)
  C. data mix: synthetic-vsi (t_max=5, shorter mean len -> more segs/row)
  D. sync cadence: np.asarray(loss) every 10 steps (the trainer's log sync)
  E. everything together (the pipeline's effective regime)

Run: python scripts/probe_pipeline_gap.py [steps]
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
from tst.data.synthetic import make_synthetic_mcq, make_synthetic_vsi
from tst.data.tokenize import ByteTokenizer, tokenize_dataset
from tst.models.decoder import init_params, spec_by_name
from tst.models.lora import LoraSpec
from tst.train.sft import FoldTrainer
import tst.train.sft as sft_mod

enable_compilation_cache()

K, SEQ, PACK_LEN, BATCH = 5, 512, 1024, 3
STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 24
WARMUP = 3

spec = spec_by_name("qwen2.5-0.5b")
params = init_params(jax.random.key(0), spec)
lspec = LoraSpec(rank=16, alpha=32.0, dtype=spec.dtype)


def run(tag, ds, sync_every=None):
    sft_mod._STEP_CACHE.clear()
    jax.clear_caches()
    tb = tokenize_dataset(ds, ByteTokenizer(), max_len=SEQ)
    fold_id = kfold_assign(ds, K, seed=0)
    t_max = int(np.max(tb.lengths - tb.answer_pos - 1))
    fp = pack_fold_datasets(tb, fold_id, K, PACK_LEN)
    batches = make_packed_fold_batches(fp.n_rows, BATCH, epochs=50, seed=0)
    tr = FoldTrainer(spec, lspec, k=K, lr=1e-4, total_steps=STEPS + WARMUP,
                     use_pallas=True, remat="dots", t_max=t_max, packed=True)
    lora, opt = tr.init_state(jax.random.key(1))
    tokens = jnp.asarray(fp.tokens)
    mask = jnp.asarray(fp.loss_mask)
    pos = jnp.asarray(fp.answer_pos)
    segs = jnp.asarray(fp.seg_starts)
    for t in range(WARMUP):
        lora, opt, loss = tr._step_fn(params, lora, opt, tokens, mask, pos,
                                      segs, jnp.asarray(batches[t]))
    np.asarray(loss)
    t0 = time.perf_counter()
    for t in range(WARMUP, WARMUP + STEPS):
        lora, opt, loss = tr._step_fn(params, lora, opt, tokens, mask, pos,
                                      segs, jnp.asarray(batches[t]))
        if sync_every and (t + 1) % sync_every == 0:
            np.asarray(loss)
    np.asarray(loss)
    dt = (time.perf_counter() - t0) / STEPS
    idx = np.asarray(batches[WARMUP: WARMUP + STEPS])
    fold_ax = np.arange(K)[None, :, None]
    sps = int(fp.n_segs[fold_ax, idx].sum()) / (dt * STEPS)
    print(f"{tag}: {dt*1e3:.1f} ms/step  {sps:.1f} samples/s  "
          f"(t_max={t_max} rows/fold={fp.n_rows.tolist()[:2]}... "
          f"fill={fp.fill_fraction:.3f})", flush=True)


mcq_small = make_synthetic_mcq(n=256, bias_fraction=0.5, seed=0)
mcq_big = make_synthetic_mcq(n=5000, bias_fraction=0.5, seed=0)
vsi_big = make_synthetic_vsi(n=5000, bias_fraction=0.4, seed=0)

run("A mcq n=256 nosync", mcq_small)
run("B mcq n=5000 nosync", mcq_big)
run("C vsi n=5000 nosync", vsi_big)
run("D mcq n=256 sync10", mcq_small, sync_every=10)
run("E vsi n=5000 sync10", vsi_big, sync_every=10)
