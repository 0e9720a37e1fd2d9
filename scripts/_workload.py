"""Shared canonical bench workload for the sweep/profile scripts.

One definition of the fold-parallel training workload (the tracked BASELINE
config-2 shape by default) so every measurement script benchmarks the SAME
thing — the per-script copies had drifted (different epochs/step counts).
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tst.aux.ckpt import enable_compilation_cache
from tst.data.folds import kfold_assign
from tst.data.synthetic import make_synthetic_mcq
from tst.data.tokenize import ByteTokenizer, tokenize_dataset
from tst.models.decoder import ModelSpec, init_params, spec_by_name
from tst.models.lora import LoraSpec


@dataclasses.dataclass
class Workload:
    spec: ModelSpec
    lspec: LoraSpec
    params: dict
    tokens: jnp.ndarray
    mask: jnp.ndarray
    pos: jnp.ndarray
    fold_id: np.ndarray
    t_max: int
    on_tpu: bool
    k: int
    batch: int
    seq: int

    def batches(self, epochs: int = 80, seed: int = 0, batch=None):
        from tst.train.sft import make_fold_batches

        return make_fold_batches(self.fold_id, self.k, batch or self.batch,
                                 epochs=epochs, seed=seed)


def make_workload(seq: int = 512, n: int = 256, k: int = 5,
                  batch: int = 4) -> Workload:
    """Canonical workload: 0.5B geometry on TPU ("small" on CPU), random
    weights, byte tokenizer, synthetic 50%-biased MCQs."""
    enable_compilation_cache()
    on_tpu = jax.default_backend() in ("tpu", "axon")
    spec = spec_by_name("qwen2.5-0.5b" if on_tpu else "small")
    ds = make_synthetic_mcq(n=n, bias_fraction=0.5, seed=0)
    tb = tokenize_dataset(ds, ByteTokenizer(), max_len=seq)
    return Workload(
        spec=spec,
        lspec=LoraSpec(rank=16, alpha=32.0, dtype=spec.dtype),
        params=init_params(jax.random.key(0), spec),
        tokens=jnp.asarray(tb.tokens),
        mask=jnp.asarray(tb.loss_mask),
        pos=jnp.asarray(tb.answer_pos),
        fold_id=kfold_assign(ds, k, seed=0),
        t_max=int(np.max(tb.lengths - tb.answer_pos - 1)),
        on_tpu=on_tpu, k=k, batch=batch, seq=seq,
    )


def time_train_steps(w: Workload, trainer, batches, steps: int = 12,
                     warmup: int = 3):
    """(compile_s, step_s): AOT-ish first-call wall + steady-state mean.
    Hard-syncs with np.asarray (remote PJRT returns early from
    block_until_ready)."""
    import time

    lora, opt = trainer.init_state(jax.random.key(1))
    t0 = time.perf_counter()
    lora, opt, loss = trainer._step_fn(w.params, lora, opt, w.tokens, w.mask,
                                       w.pos, jnp.asarray(batches[0]))
    np.asarray(loss)
    compile_s = time.perf_counter() - t0
    for t in range(1, warmup):
        lora, opt, loss = trainer._step_fn(w.params, lora, opt, w.tokens,
                                           w.mask, w.pos, jnp.asarray(batches[t]))
    np.asarray(loss)
    t0 = time.perf_counter()
    for t in range(warmup, warmup + steps):
        lora, opt, loss = trainer._step_fn(w.params, lora, opt, w.tokens,
                                           w.mask, w.pos, jnp.asarray(batches[t]))
    np.asarray(loss)
    return compile_s, (time.perf_counter() - t0) / steps


def time_decode_steps(make_fn, args, batch: int, max_new: int = 16,
                      short_new: int = 4, reps: int = 3):
    """Steps-only decode rate by the difference method.

    ``make_fn(max_new)`` must return a jitted decode callable taking
    ``*args``; the per-call prefill cost cancels between the ``max_new``
    and ``short_new`` walls. Returns ``(compile_s, full_wall_s, step_ms,
    steps_tok_per_s)`` — the last two are None when the measured
    difference is non-positive (noise floor), so callers never divide by
    a negative interval. One definition for every sweep script; bench.py
    inlines the same pattern on purpose (it stays import-free of
    scripts/).
    """
    import time

    walls = {}
    compile_s = None
    for n_new in (max_new, short_new):
        fn = make_fn(n_new)
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        if compile_s is None:
            compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            gen = fn(*args)
        np.asarray(gen)
        walls[n_new] = (time.perf_counter() - t0) / reps
    if walls[max_new] <= walls[short_new]:
        return compile_s, walls[max_new], None, None
    step_ms = (walls[max_new] - walls[short_new]) / (max_new - short_new) * 1e3
    return compile_s, walls[max_new], step_ms, batch * 1e3 / step_ms
