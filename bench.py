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

Workload: Qwen2.5-0.5B geometry (BASELINE.json config 2), bf16, LoRA r=16 on
qkvo, seq 512, k=5 folds (the north-star count) x batch 4/fold, answer-window loss. Weights are random —
throughput is architecture-dependent, not weight-dependent.
"""

from __future__ import annotations

import json
import sys
import time


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

    enable_compilation_cache()

    backend = jax.default_backend()
    n_chips = jax.device_count()
    on_tpu = backend in ("tpu", "axon")

    # north-star fold count; ~20 rows/step is the single-chip sweet spot
    # (more rows degrade via HBM pressure: 40 rows -> 91.7 samples/s/chip)
    K = 5
    BATCH = 4
    SEQ = 512
    STEPS = 12
    WARMUP = 3
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

    def run(k_parallel: bool) -> float:
        """Returns samples/sec. Sequential mode = k single-fold programs."""
        k_eff = K if k_parallel else 1
        trainer = FoldTrainer(spec, lspec, k=k_eff, lr=1e-4,
                              total_steps=STEPS + WARMUP,
                              use_pallas=on_tpu,
                              remat="dots" if on_tpu else False, t_max=t_max)
        if k_parallel:
            lora, opt = trainer.init_state(jax.random.key(1))
            step_batches = batches
        else:
            states = [trainer.init_state(jax.random.key(2 + f)) for f in range(K)]
        # warmup (compile + first steps)
        def one_step(t, state_list=None, lora=None, opt=None):
            if k_parallel:
                return trainer._step_fn(params, lora, opt, tokens, mask, pos,
                                        jnp.asarray(batches[t]))
            outs = []
            for f in range(K):
                lo, op = state_list[f]
                lo, op, loss = trainer._step_fn(
                    params, lo, op, tokens, mask, pos,
                    jnp.asarray(batches[t, f : f + 1]),
                )
                state_list[f] = (lo, op)
                outs.append(loss)
            return state_list[0][0], state_list[0][1], outs[-1]

        # NB: hard-sync with np.asarray — under this environment's remote
        # PJRT plugin, block_until_ready returns before execution completes.
        if k_parallel:
            for t in range(WARMUP):
                lora, opt, loss = one_step(t, lora=lora, opt=opt)
            np.asarray(loss)
            t0 = time.perf_counter()
            for t in range(WARMUP, WARMUP + STEPS):
                lora, opt, loss = one_step(t, lora=lora, opt=opt)
            np.asarray(loss)
        else:
            for t in range(WARMUP):
                _, _, loss = one_step(t, state_list=states)
            np.asarray(loss)
            t0 = time.perf_counter()
            for t in range(WARMUP, WARMUP + STEPS):
                _, _, loss = one_step(t, state_list=states)
            np.asarray(loss)
        dt = time.perf_counter() - t0
        return STEPS * K * BATCH / dt

    sps_parallel = run(k_parallel=True)
    sps_sequential = run(k_parallel=False)

    # secondary headline: Llama-3-8B (int8 base) fold-parallel blind SFT on
    # THE SAME single chip — impossible in bf16 (16.1 GB base > 15.75 GB HBM)
    llama8b_sps = None
    if on_tpu:
        try:
            spec8 = spec_by_name("llama3-8b")
            params8 = init_params(jax.random.key(0), spec8, quantize=True)
            lspec8 = LoraSpec(rank=16, alpha=32.0, dtype=spec8.dtype)
            tr8 = FoldTrainer(spec8, lspec8, k=2, lr=1e-4, total_steps=10,
                              use_pallas=True, remat=True, t_max=t_max)
            lora8, opt8 = tr8.init_state(jax.random.key(1))
            b8 = make_fold_batches(fold_id, 2, 2, epochs=10, seed=0)
            for t in range(2):
                lora8, opt8, loss8 = tr8._step_fn(
                    params8, lora8, opt8, tokens, mask, pos, jnp.asarray(b8[t]))
            np.asarray(loss8)
            t0 = time.perf_counter()
            for t in range(2, 8):
                lora8, opt8, loss8 = tr8._step_fn(
                    params8, lora8, opt8, tokens, mask, pos, jnp.asarray(b8[t]))
            np.asarray(loss8)
            llama8b_sps = 2 * 2 * 6 / (time.perf_counter() - t0)
            del params8, lora8, opt8
        except Exception as e:  # never fail the primary metric
            print(f"8B leg skipped: {type(e).__name__}: {e}", file=sys.stderr)

    value = sps_parallel / max(n_chips, 1)
    out = {
        "metric": "blind_sft_samples_per_sec_per_chip",
        "value": round(value, 3),
        "unit": "samples/s/chip",
        "vs_baseline": round(sps_parallel / sps_sequential, 3),
        "baseline": "fold-sequential same-chip (reference-style per-fold jobs)",
        "model": spec.name,
        "k": K, "batch_per_fold": BATCH, "seq_len": SEQ,
        "backend": backend, "n_chips": n_chips,
        "fold_sequential_samples_per_sec_per_chip": round(sps_sequential / max(n_chips, 1), 3),
    }
    if llama8b_sps is not None:
        out["llama3_8b_int8_samples_per_sec_per_chip"] = round(
            llama8b_sps / max(n_chips, 1), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
