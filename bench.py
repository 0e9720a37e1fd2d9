"""Benchmark: fold-parallel blind-SFT throughput (samples/sec/chip).

Prints ONE JSON line:
  {"metric": "blind_sft_samples_per_sec_per_chip", "value": N,
   "unit": "samples/s/chip", "vs_baseline": R, ...}

The tracked metric is BASELINE.json's "blind-SFT samples/sec/chip".
``vs_baseline`` is the speedup of the fold-PARALLEL program (all k folds as
one vmapped XLA program — this framework's signature design, north-star) over
the fold-SEQUENTIAL baseline (k separate single-fold programs per step),
which is how the reference's job-level per-fold parallelism maps onto one
chip (SURVEY.md §2b: reference trains folds as independent runs).

Secondary fields (VERDICT r1 items 2/6/10):
  * compile telemetry — parallel = ONE XLA program; reference-style = k job
    programs (raw walls reported; the remote-compile tunnel's 5 s–8 min
    variance makes a derived "seconds saved" noise);
  * MFU — analytic model-FLOPs / step time / chip peak for the 0.5B and 8B
    legs (XLA cost_analysis undercounts scan bodies — tst/aux/flops.py);
  * HBM — compiled-program memory figures; the 8B leg also reports base
    bytes (one int8 copy SHARED by all folds vs k bf16 job replicas);
  * long-seq leg — tokens/s at S=16384 through the flash path.

Workload: Qwen2.5-0.5B geometry (BASELINE.json config 2), bf16, LoRA r=16 on
qkvo, seq 512, k=5 folds x batch 4/fold, answer-window loss. Weights are
random — throughput is architecture-dependent, not weight-dependent.
"""

from __future__ import annotations

import json
import sys
import time

#: TPU v5e peak bf16 matmul throughput per chip.
V5E_PEAK_BF16_FLOPS = 197e12


def _cost(compiled):
    c = compiled.cost_analysis()
    if isinstance(c, list):
        c = c[0] if c else {}
    return c or {}


def _mem_gb(compiled):
    try:
        m = compiled.memory_analysis()
        total = (getattr(m, "argument_size_in_bytes", 0)
                 + getattr(m, "output_size_in_bytes", 0)
                 + getattr(m, "temp_size_in_bytes", 0))
        return round(total / 1e9, 3)
    except Exception:
        return None


def main() -> None:
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

    cache_dir = enable_compilation_cache()

    def _cache_files() -> set:
        import os as _os
        try:
            return set(_os.listdir(cache_dir))
        except OSError:
            return set()

    backend = jax.default_backend()
    n_chips = jax.device_count()
    on_tpu = backend in ("tpu", "axon")

    # north-star fold count; ~20 rows/step is the single-chip sweet spot
    # (more rows degrade via HBM pressure: 40 rows -> 91.7 samples/s/chip)
    K = 5
    BATCH = 4
    SEQ = 512
    # step-count overrides exist for the CPU contract test
    # (tests/test_bench_contract.py) — the driver's TPU runs never set them
    import os

    STEPS = max(1, int(os.environ.get("TST_BENCH_STEPS", 12)))
    WARMUP = max(1, int(os.environ.get("TST_BENCH_WARMUP", 3)))
    spec = spec_by_name("qwen2.5-0.5b" if on_tpu else "small")

    ds = make_synthetic_mcq(n=256, bias_fraction=0.5, seed=0)
    tb = tokenize_dataset(ds, ByteTokenizer(), max_len=SEQ)
    fold_id = kfold_assign(ds, K, seed=0)
    lspec = LoraSpec(rank=16, alpha=32.0, dtype=spec.dtype)
    t_max = int(np.max(tb.lengths - tb.answer_pos - 1))
    batches = make_fold_batches(fold_id, K, BATCH, epochs=50, seed=0)[: STEPS + WARMUP + 1]

    params = init_params(jax.random.key(0), spec)
    tokens = jnp.asarray(tb.tokens)
    mask = jnp.asarray(tb.loss_mask)
    pos = jnp.asarray(tb.answer_pos)

    def bench_trainer(trainer, k_eff, batch_idx_fn) -> dict:
        """AOT-compile the step once (compile wall + cost/memory analysis),
        then time STEPS steady-state steps. Hard-sync with np.asarray —
        under this environment's remote PJRT, block_until_ready returns
        before execution completes."""
        lora, opt = trainer.init_state(jax.random.key(1))
        cache_before = _cache_files()
        t0 = time.perf_counter()
        lora, opt, loss = trainer._step_fn(params, lora, opt, tokens, mask,
                                           pos, batch_idx_fn(0))
        np.asarray(loss)
        compile_s = time.perf_counter() - t0
        # Persistent-cache state: a compile that wrote no new cache entries
        # was a warm hit — lets the driver's time series tell program
        # regressions from remote-compile-tunnel weather (the same program
        # has measured 8 s warm and 497 s cold here).
        cache_hit = len(_cache_files() - cache_before) == 0
        lowered = trainer._step_fn.lower(params, lora, opt, tokens, mask,
                                         pos, batch_idx_fn(0))
        compiled = lowered.compile()  # jit-cache hit: analysis without recompiling
        # NB: cost_analysis()["flops"] undercounts lax.scan bodies by the
        # trip count (tst/aux/flops.py) — FLOPs are computed analytically.
        from tst.aux.flops import train_step_flops

        flops = train_step_flops(trainer.spec, trainer.lora_spec,
                                 n_rows=k_eff * BATCH, seq=tokens.shape[1],
                                 t_max=trainer.t_max or 0,
                                 remat=trainer.remat)["model_flops"]
        mem_gb = _mem_gb(compiled)
        for t in range(1, WARMUP):
            lora, opt, loss = trainer._step_fn(params, lora, opt, tokens,
                                               mask, pos, batch_idx_fn(t))
        np.asarray(loss)
        t0 = time.perf_counter()
        for t in range(WARMUP, WARMUP + STEPS):
            lora, opt, loss = trainer._step_fn(params, lora, opt, tokens,
                                               mask, pos, batch_idx_fn(t))
        np.asarray(loss)
        dt = (time.perf_counter() - t0) / STEPS
        return {
            "samples_per_s": STEPS and (k_eff * BATCH / dt),
            "step_ms": dt * 1e3,
            "compile_s": compile_s,
            "compile_cache_hit": cache_hit,
            "flops_per_step": flops,
            "mfu": (flops / dt / V5E_PEAK_BF16_FLOPS) if on_tpu else None,
            "hbm_gb": mem_gb,
        }

    # ── fold-parallel: ONE program trains all k folds ──
    tr_par = FoldTrainer(spec, lspec, k=K, lr=1e-4, total_steps=STEPS + WARMUP,
                         use_pallas=on_tpu,
                         remat="dots" if on_tpu else False, t_max=t_max)
    par = bench_trainer(tr_par, K, lambda t: jnp.asarray(batches[t]))

    # ── packed fold-parallel: the SAME workload with sequence packing
    # (optim.pack): ~3 samples per 1024-token row lifts fill 0.61 → 0.90;
    # B=3 rows/fold through the row-tiled folded one-shot attention schedule
    # measured 164.3 vs 135.9 samples/s unpacked (scripts/sweep_packed.py) ──
    packed = None
    try:
        from tst.data.packing import (make_packed_fold_batches,
                                      pack_fold_datasets)

        PACK_LEN, PACK_BATCH = 2 * SEQ, 3
        fp = pack_fold_datasets(tb, fold_id, K, PACK_LEN)
        pbatches = make_packed_fold_batches(
            fp.n_rows, PACK_BATCH, epochs=50, seed=0)[: STEPS + WARMUP + 1]
        tr_pack = FoldTrainer(spec, lspec, k=K, lr=1e-4,
                              total_steps=STEPS + WARMUP, use_pallas=on_tpu,
                              remat="dots" if on_tpu else False, t_max=t_max,
                              packed=True)
        plora, popt = tr_pack.init_state(jax.random.key(1))
        ptok = jnp.asarray(fp.tokens)
        pmask = jnp.asarray(fp.loss_mask)
        ppos = jnp.asarray(fp.answer_pos)
        psegs = jnp.asarray(fp.seg_starts)
        t0 = time.perf_counter()
        plora, popt, ploss = tr_pack._step_fn(
            params, plora, popt, ptok, pmask, ppos, psegs,
            jnp.asarray(pbatches[0]))
        np.asarray(ploss)
        pack_compile_s = time.perf_counter() - t0
        for t in range(1, WARMUP):
            plora, popt, ploss = tr_pack._step_fn(
                params, plora, popt, ptok, pmask, ppos, psegs,
                jnp.asarray(pbatches[t]))
        np.asarray(ploss)
        idx = np.asarray(pbatches[WARMUP: WARMUP + STEPS])
        n_real = int(fp.n_segs[np.arange(K)[None, :, None], idx].sum())
        t0 = time.perf_counter()
        for t in range(WARMUP, WARMUP + STEPS):
            plora, popt, ploss = tr_pack._step_fn(
                params, plora, popt, ptok, pmask, ppos, psegs,
                jnp.asarray(pbatches[t]))
        np.asarray(ploss)
        pdt = (time.perf_counter() - t0) / STEPS
        from tst.aux.flops import train_step_flops

        pflops = train_step_flops(spec, lspec, n_rows=K * PACK_BATCH,
                                  seq=PACK_LEN, t_max=t_max,
                                  remat=tr_pack.remat)["model_flops"]
        packed = {
            "samples_per_s": n_real / (pdt * STEPS),
            "step_ms": pdt * 1e3,
            "compile_s": pack_compile_s,
            "fill": fp.fill_fraction,
            "pack_len": PACK_LEN,
            "batch_rows": PACK_BATCH,
            "mfu": (pflops / pdt / V5E_PEAK_BF16_FLOPS) if on_tpu else None,
        }
        del plora, popt, ptok, pmask, ppos, psegs
    except Exception as e:  # the packed leg must never sink the metric
        print(f"packed leg skipped: {type(e).__name__}: {e}", file=sys.stderr)

    # ── fold-sequential baseline: k single-fold programs per step (the
    # reference's job-level parallelism on one chip; each job would also
    # pay its own compile — measured below) ──
    tr_seq = FoldTrainer(spec, lspec, k=1, lr=1e-4, total_steps=STEPS + WARMUP,
                         use_pallas=on_tpu,
                         remat="dots" if on_tpu else False, t_max=t_max)
    states = [tr_seq.init_state(jax.random.key(2 + f)) for f in range(K)]
    t0 = time.perf_counter()
    lo, op, loss = tr_seq._step_fn(params, *states[0], tokens, mask, pos,
                                   jnp.asarray(batches[0, 0:1]))
    np.asarray(loss)
    seq_compile_s = time.perf_counter() - t0
    states[0] = (lo, op)

    def seq_step(t):
        out = None
        for f in range(K):
            lo, op, out = tr_seq._step_fn(params, *states[f], tokens, mask,
                                          pos, jnp.asarray(batches[t, f:f + 1]))
            states[f] = (lo, op)
        return out

    for t in range(1, WARMUP):
        loss = seq_step(t)
    np.asarray(loss)
    t0 = time.perf_counter()
    for t in range(WARMUP, WARMUP + STEPS):
        loss = seq_step(t)
    np.asarray(loss)
    sps_sequential = STEPS * K * BATCH / (time.perf_counter() - t0)

    # ── Llama-3-8B (int8 base) fold-parallel on THE SAME single chip —
    # impossible in bf16 (16.1 GB base > 15.75 GB HBM) ──
    llama8b = None
    if on_tpu:
        try:
            spec8 = spec_by_name("llama3-8b")
            params8 = init_params(jax.random.key(0), spec8, quantize=True)
            base_bytes = sum(l.size * l.dtype.itemsize
                             for l in jax.tree.leaves(params8))
            lspec8 = LoraSpec(rank=16, alpha=32.0, dtype=spec8.dtype)
            # dots-remat beats full remat by 19% here (9.54 vs 8.03
            # samples/s); batch>2/fold or dots at S=16k compile-OOM — the
            # int8 base (8.04 GB) leaves ~7 GB for activations
            tr8 = FoldTrainer(spec8, lspec8, k=2, lr=1e-4, total_steps=10,
                              use_pallas=True, remat="dots", t_max=t_max)
            lora8, opt8 = tr8.init_state(jax.random.key(1))
            # a real 2-fold assignment, shared with the packed k=2 leg below
            # so packed-vs-unpacked deltas compare identical splits (ADVICE
            # r3: reusing the K=5 fold_id here trained on ~4/5 of the rows
            # while the packed leg trained on ~1/2)
            fid2 = kfold_assign(ds, 2, seed=0)
            b8 = make_fold_batches(fid2, 2, 2, epochs=10, seed=0)
            t0 = time.perf_counter()
            lora8, opt8, loss8 = tr8._step_fn(params8, lora8, opt8, tokens,
                                              mask, pos, jnp.asarray(b8[0]))
            np.asarray(loss8)
            compile8_s = time.perf_counter() - t0
            compiled8 = tr8._step_fn.lower(
                params8, lora8, opt8, tokens, mask, pos,
                jnp.asarray(b8[0])).compile()
            from tst.aux.flops import train_step_flops

            flops8 = train_step_flops(spec8, lspec8, n_rows=2 * 2, seq=SEQ,
                                      t_max=t_max, remat="dots")["model_flops"]
            lora8, opt8, loss8 = tr8._step_fn(params8, lora8, opt8, tokens,
                                              mask, pos, jnp.asarray(b8[1]))
            np.asarray(loss8)
            t0 = time.perf_counter()
            for t in range(2, 8):
                lora8, opt8, loss8 = tr8._step_fn(
                    params8, lora8, opt8, tokens, mask, pos, jnp.asarray(b8[t]))
            np.asarray(loss8)
            dt8 = (time.perf_counter() - t0) / 6
            llama8b = {
                "samples_per_s": 2 * 2 / dt8,
                "mfu": flops8 / dt8 / V5E_PEAK_BF16_FLOPS,
                "base_hbm_gb": round(base_bytes / 1e9, 2),
                "hbm_gb": _mem_gb(compiled8),
                "compile_s": compile8_s,
            }
            del lora8, opt8, compiled8
            # north-star fold count at 8B on the SAME single chip. attn
            # remat (save flash residuals, recompute the rest) fits at k=5
            # and beats full remat 8.53 vs 8.15 samples/s; dots-remat
            # activations exceed the ~7 GB left over the int8 base, and the
            # batch sweep B=1..4 is flat (~8.0-8.3 — MXU-saturated), so B=1
            # is the point (scripts/sweep_8b_k5_batch.py). The reference's
            # per-fold jobs cannot hold even ONE bf16 replica here. Nested
            # try: a k=5 failure must not discard the already-collected k=2
            # figures, and params8 must be freed either way so later legs
            # aren't starved of HBM.
            try:
                tr5 = FoldTrainer(spec8, lspec8, k=5, lr=1e-4, total_steps=10,
                                  use_pallas=True, remat="attn", t_max=t_max)
                lora5, opt5 = tr5.init_state(jax.random.key(1))
                b5 = make_fold_batches(fold_id, 5, 1, epochs=5, seed=0)
                for t in range(2):
                    lora5, opt5, loss5 = tr5._step_fn(
                        params8, lora5, opt5, tokens, mask, pos,
                        jnp.asarray(b5[t]))
                np.asarray(loss5)
                t0 = time.perf_counter()
                for t in range(2, 7):
                    lora5, opt5, loss5 = tr5._step_fn(
                        params8, lora5, opt5, tokens, mask, pos,
                        jnp.asarray(b5[t]))
                np.asarray(loss5)
                llama8b["k5_samples_per_s"] = 5 / ((time.perf_counter() - t0) / 5)
                del lora5, opt5
            except Exception as e:
                print(f"8B k=5 leg skipped: {type(e).__name__}: {e}",
                      file=sys.stderr)
            # ── packed 8B legs: the model is compute-bound (MFU 0.75), so
            # fill 0.61 → 0.90 converts ~1:1 into samples/s — measured
            # 13.9 vs 10.4 (k=2 dots) and 12.1 vs 8.5 (k=5 attn) on one
            # v5e (scripts/sweep_8b_packed.py); rows/fold > 1 at pack_len
            # 1024 compile-OOMs (21 GB), so B=1 is the point ──
            try:
                from tst.data.packing import (make_packed_fold_batches,
                                              pack_fold_datasets)
                for kk, rem, key in ((2, "dots", "packed_samples_per_s"),
                                     (5, "attn", "k5_packed_samples_per_s")):
                    fid8 = fid2 if kk == 2 else kfold_assign(ds, kk, seed=0)
                    fp8 = pack_fold_datasets(tb, fid8, kk, 2 * SEQ)
                    pb8 = make_packed_fold_batches(fp8.n_rows, 1, epochs=20,
                                                   seed=0)
                    trp8 = FoldTrainer(spec8, lspec8, k=kk, lr=1e-4,
                                       total_steps=10, use_pallas=True,
                                       remat=rem, t_max=t_max, packed=True)
                    lorap8, optp8 = trp8.init_state(jax.random.key(1))
                    ptok = jnp.asarray(fp8.tokens)
                    pmask = jnp.asarray(fp8.loss_mask)
                    ppos = jnp.asarray(fp8.answer_pos)
                    psegs = jnp.asarray(fp8.seg_starts)
                    for t in range(2):
                        lorap8, optp8, lossp8 = trp8._step_fn(
                            params8, lorap8, optp8, ptok, pmask, ppos,
                            psegs, jnp.asarray(pb8[t]))
                    np.asarray(lossp8)
                    idx8 = np.asarray(pb8[2:8])
                    fold_ax = np.arange(kk)[None, :, None]
                    nsamp = int(fp8.n_segs[fold_ax, idx8].sum())
                    t0 = time.perf_counter()
                    for t in range(2, 8):
                        lorap8, optp8, lossp8 = trp8._step_fn(
                            params8, lorap8, optp8, ptok, pmask, ppos,
                            psegs, jnp.asarray(pb8[t]))
                    np.asarray(lossp8)
                    llama8b[key] = nsamp / (time.perf_counter() - t0)
                    del lorap8, optp8
            except Exception as e:
                print(f"8B packed legs skipped: {type(e).__name__}: {e}",
                      file=sys.stderr)
            finally:
                del params8
        except Exception as e:  # never fail the primary metric
            params8 = None  # free the int8 base for the remaining legs
            print(f"8B leg skipped: {type(e).__name__}: {e}", file=sys.stderr)

    # ── 8B int4 greedy-decode serving leg: weight-read-bound, so the
    # RTN-g128 base (4.76 GB vs int8's 8.04) plus the pallas dequant-matmul
    # (tst/kernels/quant_matmul.py — stack-indexed, no per-layer slice copy)
    # measured 11.6 vs 16.6 ms/step at B=16 (scripts/bench_8b_decode.py) ──
    llama8b_decode = None
    # gated on on_tpu only: this leg builds its own int4 base and shares
    # nothing with the int8 TRAIN leg, so a train-leg failure must not
    # silently drop the serving metric
    if on_tpu:
        try:
            from tst.models.decode import greedy_decode, layer_loop_for

            spec8 = spec_by_name("llama3-8b")
            params4 = init_params(jax.random.key(0), spec8, quantize=True,
                                  bits=4)
            loop8 = layer_loop_for(spec8)
            # B=32 is the best measured serving config (2,255 tok/s vs
            # 1,370 at B=16 — docs/RESULTS.md 8B serving table; VERDICT r3
            # weak #3: the tracked JSON under-reported the repo's own best)
            D8B, D8_NEW, D8_SHORT = 32, 16, 4
            rows8 = np.arange(D8B) % tokens.shape[0]
            dt8_, dl8 = tokens[rows8], pos[rows8] + 1
            f8 = jax.jit(lambda prm, t, pl_: greedy_decode(
                prm, t, pl_, D8_NEW, spec8, use_pallas=True,
                layer_loop=loop8))
            np.asarray(f8(params4, dt8_, dl8))
            t0 = time.perf_counter()
            for _ in range(3):
                g8 = f8(params4, dt8_, dl8)
            np.asarray(g8)
            d_full = (time.perf_counter() - t0) / 3
            f8s = jax.jit(lambda prm, t, pl_: greedy_decode(
                prm, t, pl_, D8_SHORT, spec8, use_pallas=True,
                layer_loop=loop8))
            np.asarray(f8s(params4, dt8_, dl8))
            t0 = time.perf_counter()
            for _ in range(3):
                g8 = f8s(params4, dt8_, dl8)
            np.asarray(g8)
            d_short = (time.perf_counter() - t0) / 3
            if d_full > d_short:
                llama8b_decode = {
                    "step_tokens_per_s": round(
                        D8B * (D8_NEW - D8_SHORT) / (d_full - d_short), 1),
                    "batch": D8B,
                }
            del params4, f8, f8s
        except Exception as e:
            print(f"8B int4 decode leg skipped: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # ── long-sequence leg: S=16384 through the flash path (VideoMME
    # transcripts, BASELINE config 4) ──
    longseq = None
    if on_tpu:
        try:
            tb16 = tokenize_dataset(ds, ByteTokenizer(), max_len=16384)
            t16 = int(np.max(tb16.lengths - tb16.answer_pos - 1))
            # remat="flash": full remat except the flash kernel's residuals
            # — round-3 sweep winner at BOTH 16k (16.2k tok/s vs attn's
            # 16.0k at 8.2 vs 12.8 GB) and 32k (9.1k vs full remat's 7.5k);
            # the dots family exceeds schedulable HBM at these lengths
            # (docs/RESULTS.md remat table).
            trL = FoldTrainer(spec, lspec, k=2, lr=1e-4, total_steps=8,
                              use_pallas=True, remat="flash", t_max=t16)
            loraL, optL = trL.init_state(jax.random.key(1))
            bL = make_fold_batches(fold_id, 2, 1, epochs=10, seed=0)
            tokL = jnp.asarray(tb16.tokens)
            mskL = jnp.asarray(tb16.loss_mask)
            posL = jnp.asarray(tb16.answer_pos)
            for t in range(2):
                loraL, optL, lossL = trL._step_fn(params, loraL, optL, tokL,
                                                  mskL, posL, jnp.asarray(bL[t]))
            np.asarray(lossL)
            t0 = time.perf_counter()
            for t in range(2, 6):
                loraL, optL, lossL = trL._step_fn(params, loraL, optL, tokL,
                                                  mskL, posL, jnp.asarray(bL[t]))
            np.asarray(lossL)
            dtL = (time.perf_counter() - t0) / 4
            longseq = {"tokens_per_s": round(2 * 1 * 16384 / dtL, 1),
                       "seq_len": 16384}
            del loraL, optL
        except Exception as e:
            print(f"long-seq leg skipped: {type(e).__name__}: {e}", file=sys.stderr)

    # ── 32k leg (SURVEY §5 long-context: VideoMME transcripts reach tens of
    # thousands of tokens; DEFAULT_BUCKETS tops at 32768). remat="flash":
    # full remat EXCEPT the flash kernel's residuals — the only policy that
    # both fits 32k and skips the quadratic kernel re-run ──
    longseq32 = None
    if on_tpu:
        try:
            tb32 = tokenize_dataset(ds, ByteTokenizer(), max_len=32768)
            t32 = int(np.max(tb32.lengths - tb32.answer_pos - 1))
            tr32 = FoldTrainer(spec, lspec, k=2, lr=1e-4, total_steps=8,
                               use_pallas=True, remat="flash", t_max=t32)
            lora32, opt32 = tr32.init_state(jax.random.key(1))
            b32 = make_fold_batches(fold_id, 2, 1, epochs=10, seed=0)
            tok32 = jnp.asarray(tb32.tokens)
            msk32 = jnp.asarray(tb32.loss_mask)
            pos32 = jnp.asarray(tb32.answer_pos)
            for t in range(2):
                lora32, opt32, loss32 = tr32._step_fn(
                    params, lora32, opt32, tok32, msk32, pos32,
                    jnp.asarray(b32[t]))
            np.asarray(loss32)
            t0 = time.perf_counter()
            for t in range(2, 5):
                lora32, opt32, loss32 = tr32._step_fn(
                    params, lora32, opt32, tok32, msk32, pos32,
                    jnp.asarray(b32[t]))
            np.asarray(loss32)
            dt32 = (time.perf_counter() - t0) / 3
            longseq32 = {"tokens_per_s": round(2 * 1 * 32768 / dt32, 1)}
            del lora32, opt32, tok32, msk32
        except Exception as e:
            print(f"32k leg skipped: {type(e).__name__}: {e}", file=sys.stderr)

    # ── KV-cached greedy decode leg (numeric/open scoring; B15). NB: model
    # params flow through the jit boundary as ARGUMENTS — closing over them
    # embeds the model as module constants and compile time scales with
    # model bytes (tst/train/infer.py::_make_decode_fn) ──
    decode = None
    if on_tpu:
        try:
            from tst.models.decode import greedy_decode, layer_loop_for

            DB, MAX_NEW, SHORT_NEW = 32, 16, 4
            loop = layer_loop_for(spec)  # unroll at 0.5B: 3.42->2.83 ms/step
            rows = np.arange(DB) % tokens.shape[0]
            dtoks = tokens[rows]
            # contiguous-slot cache reserves [SEQ, SEQ+pad) for generated
            # tokens — no need to clamp prompts away from the cache tail
            dlen = pos[rows] + 1
            # prefill through the flash kernel (it IS the model forward —
            # round 2 ran it dense, paying ~12% extra on the dominant leg)
            fn = jax.jit(lambda prm, t, pl_: greedy_decode(
                prm, t, pl_, MAX_NEW, spec, use_pallas=True,
                layer_loop=loop))
            np.asarray(fn(params, dtoks, dlen))  # compile
            t0 = time.perf_counter()
            for _ in range(3):
                gen = fn(params, dtoks, dlen)
            np.asarray(gen)
            dt = (time.perf_counter() - t0) / 3
            decode = {"tokens_per_s": round(DB * MAX_NEW / dt, 1),
                      "batch": DB, "max_new": MAX_NEW}
            # steps-only rate (excludes the prefill forward, which is
            # FLOP-bound at ~16 TFLOP/call and dominates the number above):
            # difference method over 12 steps
            fn_s = jax.jit(lambda prm, t, pl_: greedy_decode(
                prm, t, pl_, SHORT_NEW, spec, use_pallas=True,
                layer_loop=loop))
            np.asarray(fn_s(params, dtoks, dlen))
            t0 = time.perf_counter()
            for _ in range(3):
                gen = fn_s(params, dtoks, dlen)
            np.asarray(gen)
            dt_s = (time.perf_counter() - t0) / 3
            if dt > dt_s:
                decode["step_tokens_per_s"] = round(
                    DB * (MAX_NEW - SHORT_NEW) / (dt - dt_s), 1)
        except Exception as e:
            print(f"decode leg skipped: {type(e).__name__}: {e}", file=sys.stderr)

    # headline = the fastest honest configuration of the same workload; the
    # packed leg trains identical samples (packing is exactly loss/grad-
    # preserving — tests/test_packing.py), so it competes directly
    best_sps = par["samples_per_s"]
    headline_cfg = "unpacked"
    if packed is not None and packed["samples_per_s"] > best_sps:
        best_sps = packed["samples_per_s"]
        headline_cfg = "packed"
    value = best_sps / max(n_chips, 1)
    out = {
        "metric": "blind_sft_samples_per_sec_per_chip",
        "value": round(value, 3),
        "unit": "samples/s/chip",
        "vs_baseline": round(best_sps / sps_sequential, 3),
        "baseline": "fold-sequential same-chip (reference-style per-fold jobs)",
        "headline_config": headline_cfg,
        "unpacked_samples_per_sec_per_chip": round(
            par["samples_per_s"] / max(n_chips, 1), 3),
        "model": spec.name,
        "k": K, "batch_per_fold": BATCH, "seq_len": SEQ,
        "backend": backend, "n_chips": n_chips,
        "fold_sequential_samples_per_sec_per_chip": round(
            sps_sequential / max(n_chips, 1), 3),
        # fold-parallel pays ONE compile; reference-style pays one PER FOLD
        # JOB. Raw walls only: the remote-compile tunnel here varies 5 s-8 min
        # per program, so a derived "seconds saved" would be noise.
        "xla_programs_fold_parallel": 1,
        "xla_programs_reference_style": K,
        "compile_s_fold_parallel": round(par["compile_s"], 1),
        # True = the persistent XLA cache already held this program (the
        # wall is deserialization, not compilation); False = a real compile
        # through the remote tunnel, whose weather is heavy-tailed.
        "compile_cache_hit_fold_parallel": par["compile_cache_hit"],
        "compile_s_single_fold": round(seq_compile_s, 1),
        "step_hbm_gb": par["hbm_gb"],
    }
    # tracked metric 2 (BASELINE.json "fold fine-tunes/hour"): one fold
    # fine-tune at the config-2 shape = 3 epochs over its (k-1)/k train split
    # of n=512; the fold-parallel program completes k of them concurrently at
    # `value` samples/s/chip.
    samples_per_finetune = 3 * int(512 * (K - 1) / K)
    out["fold_finetunes_per_hour_per_chip"] = round(
        value * 3600.0 / samples_per_finetune, 1)
    if par["mfu"]:
        out["mfu"] = round(par["mfu"], 3)
        out["tflops_per_s"] = round(par["flops_per_step"] / (par["step_ms"] / 1e3) / 1e12, 1)
    if packed is not None:
        out["packed_samples_per_sec_per_chip"] = round(
            packed["samples_per_s"] / max(n_chips, 1), 3)
        out["pack_len"] = packed["pack_len"]
        out["pack_fill_fraction"] = round(packed["fill"], 3)
        out["pack_batch_rows_per_fold"] = packed["batch_rows"]
        if packed["mfu"]:
            out["packed_mfu"] = round(packed["mfu"], 3)
    if llama8b is not None:
        out["llama3_8b_int8_samples_per_sec_per_chip"] = round(
            llama8b["samples_per_s"] / max(n_chips, 1), 3)
        if llama8b["mfu"]:
            out["llama3_8b_mfu"] = round(llama8b["mfu"], 3)
        out["llama3_8b_base_hbm_gb"] = llama8b["base_hbm_gb"]
        out["llama3_8b_step_hbm_gb"] = llama8b["hbm_gb"]
        if "k5_samples_per_s" in llama8b:
            out["llama3_8b_k5_fold_parallel_samples_per_sec_per_chip"] = round(
                llama8b["k5_samples_per_s"] / max(n_chips, 1), 3)
        if "packed_samples_per_s" in llama8b:
            out["llama3_8b_packed_samples_per_sec_per_chip"] = round(
                llama8b["packed_samples_per_s"] / max(n_chips, 1), 3)
        if "k5_packed_samples_per_s" in llama8b:
            out["llama3_8b_k5_packed_samples_per_sec_per_chip"] = round(
                llama8b["k5_packed_samples_per_s"] / max(n_chips, 1), 3)
    if longseq is not None:
        out["longseq_tokens_per_s"] = longseq["tokens_per_s"]
        out["longseq_len"] = longseq["seq_len"]
    if longseq32 is not None:
        out["longseq_32k_tokens_per_s"] = longseq32["tokens_per_s"]
    if decode is not None:
        out["decode_tokens_per_s"] = decode["tokens_per_s"]
        out["decode_batch"] = decode["batch"]
        if "step_tokens_per_s" in decode:
            out["decode_step_tokens_per_s"] = decode["step_tokens_per_s"]
    if llama8b_decode is not None:
        out["llama3_8b_int4_decode_step_tokens_per_s"] = (
            llama8b_decode["step_tokens_per_s"])
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
