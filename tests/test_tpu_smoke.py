"""Opt-in real-TPU tests (SURVEY.md §4.5): throughput smoke, compile-cache
sanity, fold-parallel numerics on hardware.

Run with: TST_TEST_TPU=1 python -m pytest tests/test_tpu_smoke.py -m tpu
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def workload():
    from tst.aux.ckpt import enable_compilation_cache
    from tst.data.folds import kfold_assign
    from tst.data.synthetic import make_synthetic_mcq
    from tst.data.tokenize import ByteTokenizer, tokenize_dataset
    from tst.models.decoder import init_params, spec_by_name
    from tst.models.lora import LoraSpec
    from tst.train.sft import FoldTrainer, make_fold_batches

    enable_compilation_cache()
    spec = spec_by_name("qwen2.5-0.5b")
    ds = make_synthetic_mcq(n=128, bias_fraction=0.5, seed=0)
    tb = tokenize_dataset(ds, ByteTokenizer(), max_len=512)
    fid = kfold_assign(ds, 2, seed=0)
    lspec = LoraSpec(rank=16, alpha=32.0, dtype=spec.dtype)
    t_max = int(np.max(tb.lengths - tb.answer_pos - 1))
    batches = make_fold_batches(fid, 2, 8, epochs=10, seed=0)
    params = init_params(jax.random.key(0), spec)
    trainer = FoldTrainer(spec, lspec, k=2, lr=1e-4, total_steps=20,
                          use_pallas=True, remat="dots", t_max=t_max)
    return dict(trainer=trainer, params=params, batches=batches,
                tokens=jnp.asarray(tb.tokens), mask=jnp.asarray(tb.loss_mask),
                pos=jnp.asarray(tb.answer_pos))


class TestTPUTraining:
    def test_throughput_smoke(self, workload):
        """The tracked metric must stay above a floor on a v5e chip
        (BASELINE.json.metric: blind-SFT samples/sec/chip)."""
        w = workload
        tr = w["trainer"]
        lora, opt = tr.init_state(jax.random.key(1))
        for t in range(3):  # compile + warmup
            lora, opt, loss = tr._step_fn(w["params"], lora, opt, w["tokens"],
                                          w["mask"], w["pos"],
                                          jnp.asarray(w["batches"][t]))
        np.asarray(loss)
        t0 = time.perf_counter()
        for t in range(3, 9):
            lora, opt, loss = tr._step_fn(w["params"], lora, opt, w["tokens"],
                                          w["mask"], w["pos"],
                                          jnp.asarray(w["batches"][t]))
        np.asarray(loss)
        sps = 6 * 16 / (time.perf_counter() - t0)
        assert sps > 60, f"{sps:.1f} samples/s/chip below floor (expected ~104)"

    def test_losses_finite_and_decreasing(self, workload):
        w = workload
        tr = w["trainer"]
        lora, opt = tr.init_state(jax.random.key(2))
        losses = []
        for t in range(10):
            lora, opt, loss = tr._step_fn(w["params"], lora, opt, w["tokens"],
                                          w["mask"], w["pos"],
                                          jnp.asarray(w["batches"][t]))
            losses.append(np.asarray(loss).mean())
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_compilation_cache_populated(self, workload):
        import os

        from tst.aux.ckpt import enable_compilation_cache

        cache_dir = enable_compilation_cache()
        assert os.path.isdir(cache_dir)
        # after the smoke tests above at least one entry should exist
        assert any(os.scandir(cache_dir)), "compile cache is empty"
