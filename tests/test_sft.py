"""SFT engine + held-out scoring tests (SURVEY.md §4.4 integration semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tst.config import RunConfig
from tst.data.folds import kfold_assign
from tst.data.synthetic import make_synthetic_mcq
from tst.data.tokenize import ByteTokenizer, tokenize_dataset
from tst.models.decoder import init_params, spec_by_name
from tst.models.lora import LoraSpec
from tst.train.infer import heldout_index_grid, letter_probs, score_heldout_mcq
from tst.train.sft import FoldTrainer, make_fold_batches, sft_loss, sft_loss_window


class TestFoldBatches:
    def test_shapes_and_exclusion(self):
        fid = np.array([0, 1, 2, 0, 1, 2, 0, 1, 2, 0], np.int32)
        b = make_fold_batches(fid, k=3, batch_size=4, epochs=2, seed=0)
        assert b.shape[1] == 3 and b.shape[2] == 4
        for f in range(3):
            rows = b[:, f, :].ravel()
            assert not np.isin(rows, np.flatnonzero(fid == f)).any()

    def test_batch_multiple(self):
        fid = np.arange(12, dtype=np.int32) % 3
        b = make_fold_batches(fid, 3, batch_size=5, epochs=1, seed=0, batch_multiple=4)
        assert b.shape[2] == 8

    def test_deterministic(self):
        fid = np.arange(20, dtype=np.int32) % 4
        b1 = make_fold_batches(fid, 4, 4, 2, seed=3)
        b2 = make_fold_batches(fid, 4, 4, 2, seed=3)
        np.testing.assert_array_equal(b1, b2)


class TestHeldoutGrid:
    def test_grid(self):
        fid = np.array([0, 1, 1, 0, 1], np.int32)
        idx, valid = heldout_index_grid(fid, 2)
        assert idx.shape == (2, 3)
        assert valid.sum() == 5
        assert set(idx[0][valid[0]]) == {0, 3}
        assert set(idx[1][valid[1]]) == {1, 2, 4}

    def test_letter_probs_masks_invalid_options(self):
        ll = np.array([[[2.0, 1.0, 0.5, 99.0]]], np.float32)  # C=4, but sample has 2 options
        probs = letter_probs(ll, np.array([2]), np.array([[0]]), np.array([[True]]), 1)
        assert probs[0, 2] == 0 and probs[0, 3] == 0
        assert probs[0].sum() == pytest.approx(1.0)


class TestLossAndTraining:
    def _setup(self, n=48, bias=1.0, k=2, seed=0):
        ds = make_synthetic_mcq(n=n, bias_fraction=bias, bias_kind="longest_option", seed=seed)
        tok = ByteTokenizer()
        tb = tokenize_dataset(ds, tok)
        fid = kfold_assign(ds, k, seed)
        spec = spec_by_name("tiny", dtype=jnp.float32)
        params = init_params(jax.random.key(0), spec)
        return ds, tb, fid, spec, params

    @pytest.mark.slow  # ~72 s on the 1-core host
    def test_loss_decreases(self):
        ds, tb, fid, spec, params = self._setup()
        lspec = LoraSpec(rank=8, alpha=16, dtype=jnp.float32)
        batches = make_fold_batches(fid, 2, batch_size=8, epochs=8, seed=0)
        trainer = FoldTrainer(spec, lspec, k=2, lr=3e-3, total_steps=batches.shape[0])
        lora, opt = trainer.init_state(jax.random.key(1))
        lora, opt, log = trainer.fit(
            params, lora, opt, jnp.asarray(tb.tokens), jnp.asarray(tb.loss_mask),
            batches, log_every=5,
        )
        assert log.losses[-1] < log.losses[0] * 0.8, log.losses

    def test_loss_mask_only_targets(self):
        """Loss must not depend on prompt tokens' own predictions."""
        ds, tb, fid, spec, params = self._setup(n=8)
        lspec = LoraSpec(rank=2, dtype=jnp.float32)
        tokens = jnp.asarray(tb.tokens[:4])
        mask = jnp.asarray(tb.loss_mask[:4])
        l1 = sft_loss(params, None, tokens, mask, spec, lspec)
        # scramble a PROMPT region token (before answer_pos) of every row
        scrambled = tb.tokens[:4].copy()
        scrambled[:, 5] = 77
        l2 = sft_loss(params, None, jnp.asarray(scrambled), mask, spec, lspec)
        # losses differ (context changed) but both are finite and positive
        assert np.isfinite(float(l1)) and np.isfinite(float(l2))
        # zero mask => zero-ish loss denominator guard
        l3 = sft_loss(params, None, tokens, jnp.zeros_like(mask), spec, lspec)
        assert float(l3) == 0.0

    @pytest.mark.slow  # ~7-9 s on the 1-core host
    def test_windowed_loss_equals_full(self):
        """The answer-window loss must be numerically identical to the
        full-sequence loss (loss_mask is zero outside the window)."""
        ds, tb, fid, spec, params = self._setup(n=8)
        lspec = LoraSpec(rank=2, dtype=jnp.float32)
        tokens = jnp.asarray(tb.tokens)
        mask = jnp.asarray(tb.loss_mask)
        pos = jnp.asarray(tb.answer_pos)
        t_max = int(np.max(tb.lengths - tb.answer_pos - 1))
        full = sft_loss(params, None, tokens, mask, spec, lspec)
        win = sft_loss_window(params, None, tokens, mask, pos, t_max, spec, lspec)
        assert float(full) == pytest.approx(float(win), abs=1e-5)
        # and with a window larger than needed (clipping path)
        win2 = sft_loss_window(params, None, tokens, mask, pos, t_max + 7, spec, lspec)
        assert float(full) == pytest.approx(float(win2), abs=1e-5)


@pytest.mark.slow
class TestDiagnosticSemantics:
    """Planted-bias end-to-end (SURVEY.md §4.4): blind SFT must learn the
    shortcut on biased data and stay near chance on clean data."""

    def _run(self, bias: float, seed: int = 0, epochs: int = 6):
        cfg = RunConfig()
        cfg.data.bench = "synthetic"
        cfg.data.k = 2
        cfg.data.seed = seed
        cfg.model.name = "tiny"
        cfg.model.dtype = "float32"
        cfg.model.use_pallas = False
        cfg.lora.rank = 4
        cfg.lora.alpha = 8.0
        cfg.lora.targets = ("q_proj", "v_proj")
        cfg.optim.lr = 5e-3
        cfg.optim.epochs = epochs
        cfg.optim.batch_size = 16
        import tempfile

        cfg.out_dir = tempfile.mkdtemp()
        # position bias ("answer is always A") is learnable even through a
        # random frozen base — it only needs a letter-marginal shift. The
        # harder content biases are exercised with pretrained bases.
        ds = make_synthetic_mcq(n=64, bias_fraction=bias,
                                bias_kind="position", seed=seed)
        from tst.train.pipeline import run_sft_diagnostic

        return run_sft_diagnostic(ds, cfg)

    def test_biased_above_chance(self):
        rep = self._run(bias=1.0)
        assert rep["blind_accuracy"] > rep["chance_accuracy"] + 0.2, rep

    def test_unbiased_near_chance(self):
        rep = self._run(bias=0.0)
        assert rep["blind_accuracy"] < rep["chance_accuracy"] + 0.2, rep

    def test_multiseed_multiepoch_aggregation(self):
        """n_seeds × score_epochs snapshots all average into s(x)."""
        import tempfile

        from tst.data.synthetic import make_synthetic_mcq
        from tst.train.pipeline import run_sft_diagnostic

        cfg = RunConfig()
        cfg.data.k = 2
        cfg.model.name = "tiny"
        cfg.model.dtype = "float32"
        cfg.model.use_pallas = False
        cfg.lora.rank = 2
        cfg.lora.targets = ("q_proj",)
        cfg.optim.epochs = 2
        cfg.optim.score_epochs = (1,)
        cfg.optim.n_seeds = 2
        cfg.optim.batch_size = 8
        cfg.out_dir = tempfile.mkdtemp()
        ds = make_synthetic_mcq(n=32, bias_fraction=1.0, bias_kind="position", seed=0)
        rep = run_sft_diagnostic(ds, cfg, return_state=True)
        s_x = rep["_state"]["s_x"]
        assert np.isfinite(s_x).all()
        # 2 seeds x (epoch-1 snapshot + final) = 4 prob sets averaged; probs
        # remain a distribution per sample
        probs = rep["_state"]["probs"]
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)
        # a fully position-biased benchmark must give highly seed-stable s(x)
        assert rep["sx_seed_spearman"] > 0.5, rep["sx_seed_spearman"]
        # prune-set stability: top-q sets across seeds (the IBP product);
        # bounded and present for both reported quantiles
        tj = rep["sx_seed_top_jaccard"]
        assert set(tj) == {"0.1", "0.2"} and all(0 <= v <= 1 for v in tj.values()), tj

    def test_mixed_numeric_pipeline(self):
        """MCQ + numeric benchmark exercises the greedy-decode scoring leg."""
        import tempfile

        from tst.data.schema import BlindDataset
        from tst.data.synthetic import make_synthetic_mcq, make_synthetic_numeric
        from tst.train.pipeline import run_sft_diagnostic

        mcq = make_synthetic_mcq(n=24, bias_fraction=0.5, bias_kind="position", seed=0)
        num = make_synthetic_numeric(n=8, seed=0)
        ds = BlindDataset("mixed", list(mcq) + list(num))
        cfg = RunConfig()
        cfg.data.k = 2
        cfg.model.name = "tiny"
        cfg.model.dtype = "float32"
        cfg.model.use_pallas = False
        cfg.lora.rank = 2
        cfg.lora.targets = ("q_proj", "v_proj")
        cfg.optim.epochs = 1
        cfg.optim.batch_size = 8
        cfg.out_dir = tempfile.mkdtemp()
        rep = run_sft_diagnostic(ds, cfg, return_state=True)
        assert rep["n_numeric"] == 8
        assert 0.0 <= rep["numeric_blind_mra"] <= 1.0
        s_x = rep["_state"]["s_x"]
        gold_numeric = np.array([s.answer_type == "numeric" for s in ds])
        # numeric rows must carry a (finite) numeric s(x), MCQ rows a prob s(x)
        assert np.isfinite(s_x[gold_numeric]).all()
        assert np.isfinite(s_x[~gold_numeric]).all()


@pytest.mark.slow  # ~8 s on the 1-core host
class TestPackedScorer:
    """Packed held-out MCQ scoring must reproduce the unpacked scorer's
    probabilities exactly (segment isolation + per-segment RoPE restart make
    a packed row a batch of independent samples)."""

    def _setup(self, k=3, n=30, seed=0):
        from tst.data.synthetic import make_synthetic_vsi

        ds = make_synthetic_vsi(n=n, bias_fraction=0.5, seed=seed)
        tb = tokenize_dataset(ds, ByteTokenizer(), max_len=256)
        fid = kfold_assign(ds, k, seed)
        spec = spec_by_name("tiny", dtype=jnp.float32)
        params = init_params(jax.random.key(0), spec)
        lspec = LoraSpec(rank=4, alpha=8.0, dtype=jnp.float32)
        trainer = FoldTrainer(spec, lspec, k=k, lr=1e-3, total_steps=4)
        lora, _ = trainer.init_state(jax.random.key(1))
        return ds, tb, fid, spec, params, lspec, lora

    def test_matches_unpacked(self):
        from tst.train.infer import score_heldout_mcq_packed

        ds, tb, fid, spec, params, lspec, lora = self._setup()
        mcq_fold = np.where(tb.gold >= 0, fid, -1)
        ref = score_heldout_mcq(
            params, lora, spec, lspec, jnp.asarray(tb.tokens),
            jnp.asarray(tb.answer_pos), tb.option_token_ids, tb.n_options,
            mcq_fold, k=3,
        )
        got = score_heldout_mcq_packed(
            params, lora, spec, lspec, tb, mcq_fold, k=3, pack_len=512,
        )
        is_mcq = tb.gold >= 0
        assert is_mcq.any() and (~is_mcq).any()  # mixed set exercised
        np.testing.assert_allclose(got[is_mcq], ref[is_mcq],
                                   atol=2e-4, rtol=2e-4)
        # numeric rows are never letter-scored on either path
        assert (got[~is_mcq] == 0).all() and (ref[~is_mcq] == 0).all()
        # every scored row is a distribution over its valid options
        np.testing.assert_allclose(got[is_mcq].sum(-1), 1.0, atol=1e-4)

    def test_pad_rows_to_pins_and_guards(self):
        """pad_rows_to pins the packed scorer grid (IBP round invariant):
        a larger pin pads with dead rows and changes nothing; a pin below
        the real packed row count raises instead of silently truncating."""
        import pytest as _pytest

        from tst.train.infer import (pack_heldout_mcq, packed_scorer_batch,
                                     score_heldout_mcq_packed)

        ds, tb, fid, spec, params, lspec, lora = self._setup()
        mcq_fold = np.where(tb.gold >= 0, fid, -1)
        b = packed_scorer_batch(512)
        ptok, _, _, _ = pack_heldout_mcq(tb, mcq_fold, 3, 512, b)
        r0 = ptok.shape[1]
        base = score_heldout_mcq_packed(
            params, lora, spec, lspec, tb, mcq_fold, k=3, pack_len=512)
        pinned = score_heldout_mcq_packed(
            params, lora, spec, lspec, tb, mcq_fold, k=3, pack_len=512,
            pad_rows_to=r0 + 2 * b)
        np.testing.assert_array_equal(pinned, base)
        with _pytest.raises(ValueError, match="pinned grid"):
            pack_heldout_mcq(tb, mcq_fold, 3, 512, b, pad_rows_to=r0 - b)

    def test_masked_fold_grid_matches_full(self):
        """Scoring with numeric rows masked out of the grid (fold id -1) must
        leave MCQ probabilities untouched vs scoring every row."""
        ds, tb, fid, spec, params, lspec, lora = self._setup()
        full = score_heldout_mcq(
            params, lora, spec, lspec, jnp.asarray(tb.tokens),
            jnp.asarray(tb.answer_pos), tb.option_token_ids, tb.n_options,
            fid, k=3,
        )
        masked = score_heldout_mcq(
            params, lora, spec, lspec, jnp.asarray(tb.tokens),
            jnp.asarray(tb.answer_pos), tb.option_token_ids, tb.n_options,
            np.where(tb.gold >= 0, fid, -1), k=3,
        )
        is_mcq = tb.gold >= 0
        np.testing.assert_allclose(masked[is_mcq], full[is_mcq],
                                   atol=1e-5, rtol=1e-5)
