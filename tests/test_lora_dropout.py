"""LoRA dropout (lora.dropout config knob, PEFT convention).

Train-only inverted dropout on the adapter input: dropout=0 is bit-identical
to the pre-dropout path; inference paths (no rng threaded) are unaffected at
any rate; masks differ across steps/folds/projections but are deterministic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tst.models.decoder import apply_model, init_params, spec_by_name
from tst.models.lora import LoraSpec, apply_lora_delta, init_lora
from tst.train.sft import FoldTrainer, make_fold_batches

SPEC = spec_by_name("tiny", dtype=jnp.float32)


def _nonzero_lora(spec, lspec, seed=1):
    lora = init_lora(jax.random.key(seed), spec, lspec)
    return jax.tree.map(lambda x: x + 0.05, lora)


class TestDelta:
    def test_zero_rate_identity(self):
        l0 = LoraSpec(rank=4, dtype=jnp.float32)
        l1 = LoraSpec(rank=4, dtype=jnp.float32, dropout=0.0)
        layer = {"a": jnp.ones((4, 8)) * 0.1, "b": jnp.ones((8, 4)) * 0.2}
        x = jnp.ones((2, 3, 8))
        d0 = apply_lora_delta(layer, x, l0, rng=None)
        d1 = apply_lora_delta(layer, x, l1, rng=jax.random.key(0))
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))

    def test_no_rng_means_no_dropout(self):
        lspec = LoraSpec(rank=4, dtype=jnp.float32, dropout=0.5)
        layer = {"a": jnp.ones((4, 8)) * 0.1, "b": jnp.ones((8, 4)) * 0.2}
        x = jnp.ones((2, 3, 8))
        d_eval = apply_lora_delta(layer, x, lspec, rng=None)
        d_ref = apply_lora_delta(layer, x, LoraSpec(rank=4, dtype=jnp.float32), rng=None)
        np.testing.assert_array_equal(np.asarray(d_eval), np.asarray(d_ref))

    def test_dropout_changes_delta_and_is_deterministic(self):
        lspec = LoraSpec(rank=4, dtype=jnp.float32, dropout=0.5)
        layer = {"a": jnp.ones((4, 8)) * 0.1, "b": jnp.ones((8, 4)) * 0.2}
        x = jnp.ones((2, 16, 8))
        d1 = apply_lora_delta(layer, x, lspec, rng=jax.random.key(7))
        d2 = apply_lora_delta(layer, x, lspec, rng=jax.random.key(7))
        d3 = apply_lora_delta(layer, x, lspec, rng=jax.random.key(8))
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
        assert not np.allclose(np.asarray(d1), np.asarray(d3))

    def test_expected_scale_preserved(self):
        """Inverted dropout: E[delta] == the no-dropout delta."""
        lspec = LoraSpec(rank=2, dtype=jnp.float32, dropout=0.3)
        base = LoraSpec(rank=2, dtype=jnp.float32)
        layer = {"a": jnp.ones((2, 8)) * 0.5, "b": jnp.ones((8, 2)) * 0.5}
        x = jnp.ones((1, 4, 8))
        ref = np.asarray(apply_lora_delta(layer, x, base))
        draws = np.mean(
            [np.asarray(apply_lora_delta(layer, x, lspec, rng=jax.random.key(i)))
             for i in range(400)], axis=0)
        np.testing.assert_allclose(draws, ref, rtol=0.12)


class TestModelAndTrainer:
    def test_apply_model_eval_unaffected(self):
        lspec = LoraSpec(rank=4, dtype=jnp.float32, dropout=0.4)
        params = init_params(jax.random.key(0), SPEC)
        lora = _nonzero_lora(SPEC, lspec)
        tokens = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
        no_rng = apply_model(params, tokens, SPEC, lora=lora, lora_spec=lspec)
        ref = apply_model(params, tokens, SPEC, lora=lora,
                          lora_spec=LoraSpec(rank=4, dtype=jnp.float32))
        np.testing.assert_allclose(np.asarray(no_rng), np.asarray(ref), atol=1e-6)

    def test_apply_model_train_mode_differs(self):
        lspec = LoraSpec(rank=4, dtype=jnp.float32, dropout=0.4)
        params = init_params(jax.random.key(0), SPEC)
        lora = _nonzero_lora(SPEC, lspec)
        tokens = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
        out = apply_model(params, tokens, SPEC, lora=lora, lora_spec=lspec,
                          lora_rng=jax.random.key(3))
        ref = apply_model(params, tokens, SPEC, lora=lora, lora_spec=lspec)
        assert not np.allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    @pytest.mark.parametrize("dropout", [0.0, 0.3])
    def test_trainer_runs_and_loss_finite(self, dropout):
        from tst.data.synthetic import make_synthetic_mcq
        from tst.data.tokenize import ByteTokenizer, tokenize_dataset
        from tst.data.folds import kfold_assign

        ds = make_synthetic_mcq(n=24, bias_fraction=0.5, seed=0)
        tb = tokenize_dataset(ds, ByteTokenizer(), max_len=256)
        fold_id = kfold_assign(ds, 2, seed=0)
        lspec = LoraSpec(rank=2, dtype=jnp.float32, dropout=dropout)
        t_max = int(np.max(tb.lengths - tb.answer_pos - 1))
        tr = FoldTrainer(SPEC, lspec, k=2, lr=1e-3, total_steps=4, t_max=t_max)
        lora, opt = tr.init_state(jax.random.key(1))
        batches = make_fold_batches(fold_id, 2, 4, epochs=1, seed=0)[:4]
        base = init_params(jax.random.key(0), SPEC)
        lora, opt, log = tr.fit(base, lora, opt,
                                jnp.asarray(tb.tokens),
                                jnp.asarray(tb.loss_mask),
                                batches,
                                all_pos=jnp.asarray(tb.answer_pos))
        assert np.isfinite(log.losses).all()
