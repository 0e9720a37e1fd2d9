"""Open (free-form) answer scoring — VERDICT r1 item 5.

MMMU's open split (reference README.md:35) must be diagnosable and prunable:
held-out greedy decode → normalized exact-match s(x), integrated into
diagnose-sft, eval-blind, and the IBP loop.
"""

import numpy as np
import pytest

from tst.data.adapters import load_benchmark
from tst.data.schema import OPEN
from tst.data.synthetic import make_synthetic_open
from tst.eval.metrics import normalize_open_answer, open_exact_match


class TestNormalization:
    def test_case_punct_whitespace(self):
        assert normalize_open_answer("  The  Red, Box! ") == "red box"

    def test_leading_article(self):
        assert normalize_open_answer("an apple") == "apple"
        assert normalize_open_answer("a") == "a"  # bare article is kept

    def test_numeric_canonical(self):
        assert normalize_open_answer("42.") == "42"
        assert normalize_open_answer("42.0") == "42"
        assert normalize_open_answer("42.5") == "42.5"

    def test_match(self):
        assert open_exact_match("The red box", "red box.") == 1.0
        assert open_exact_match("blue", "red") == 0.0


class TestSyntheticOpen:
    def test_generator(self):
        ds = make_synthetic_open(n=40, bias_fraction=0.5, seed=0)
        assert len(ds) == 40
        assert all(s.answer_type == OPEN for s in ds)
        biased = [s for s in ds if s.meta["planted_bias"]]
        assert len(biased) == 20
        assert all(s.answer == "red" for s in biased)

    def test_load_benchmark_spec(self):
        ds = load_benchmark("synthetic-open:0.25", n=16, seed=3)
        assert sum(s.meta["planted_bias"] for s in ds) == 4


class TestHeldoutOpenScoring:
    def test_scores_match_gold_reproduction(self):
        """A fold-model that reproduces gold answers must get s(x)=1 on
        exactly those rows; scoring must leave non-open rows NaN."""
        import jax
        import jax.numpy as jnp

        from tst.data.folds import kfold_assign
        from tst.data.tokenize import ByteTokenizer, tokenize_dataset
        from tst.models.decoder import init_params, spec_by_name
        from tst.train.infer import score_heldout_open

        ds = make_synthetic_open(n=12, bias_fraction=0.0, seed=1)
        tok = ByteTokenizer()
        tb = tokenize_dataset(ds, tok, max_len=256)
        fold_id = kfold_assign(ds, 2, seed=0)
        spec = spec_by_name("tiny")
        params = init_params(jax.random.key(0), spec)
        gold_texts = [s.answer for s in ds]
        preds, s_open = score_heldout_open(
            params, None, spec, None, jnp.asarray(tb.tokens),
            jnp.asarray(tb.answer_pos), gold_texts, fold_id, k=2,
            tokenizer=tok,
        )
        assert len(preds) == 12 and all(p is not None for p in preds)
        assert np.isfinite(s_open).all()
        # random weights almost surely don't reproduce the gold word;
        # the identity under test is s_open == exact-match(pred, gold)
        for p, g, s in zip(preds, gold_texts, s_open):
            assert s == open_exact_match(p, g)

    def test_non_open_rows_nan(self):
        import jax
        import jax.numpy as jnp

        from tst.data.tokenize import ByteTokenizer, tokenize_dataset
        from tst.models.decoder import init_params, spec_by_name
        from tst.train.infer import score_heldout_open

        ds = make_synthetic_open(n=6, seed=2)
        tb = tokenize_dataset(ds, ByteTokenizer(), max_len=256)
        spec = spec_by_name("tiny")
        params = init_params(jax.random.key(0), spec)
        gold_texts = [s.answer if i % 2 == 0 else None for i, s in enumerate(ds)]
        _, s_open = score_heldout_open(
            params, None, spec, None, jnp.asarray(tb.tokens),
            jnp.asarray(tb.answer_pos), gold_texts,
            np.zeros(6, np.int32), k=1, tokenizer=ByteTokenizer(),
        )
        assert np.isfinite(s_open[::2]).all()
        assert np.isnan(s_open[1::2]).all()


@pytest.mark.slow
class TestEndToEnd:
    def test_diagnose_sft_detects_open_answer_prior(self, tmp_path):
        """Planted answer-prior ("red" on 60% of rows): blind SFT must
        reproduce it on held-out biased rows → s(x) ranks biased first."""
        from tst.config import RunConfig
        from tst.train.pipeline import run_sft_diagnostic

        ds = make_synthetic_open(n=48, bias_fraction=0.6, seed=0)
        cfg = RunConfig()
        cfg.data.k = 2
        cfg.data.max_len = 256
        cfg.model.name = "tiny"
        cfg.model.dtype = "float32"
        cfg.model.use_pallas = False
        cfg.optim.epochs = 10
        cfg.optim.lr = 5e-3
        cfg.optim.batch_size = 8
        cfg.out_dir = str(tmp_path)
        report = run_sft_diagnostic(ds, cfg)
        assert report["n_open"] == 48
        # the planted prior is learnable blind: decoded "red" matches gold on
        # biased rows only
        assert report["open_blind_accuracy"] > 0.4
        import json

        sx = {}
        with open(tmp_path / "sx.jsonl") as f:
            for line in f:
                row = json.loads(line)
                if row["s_x"] is not None:
                    sx[row["id"]] = row["s_x"]
        biased_mean = np.mean([sx[s.id] for s in ds if s.meta["planted_bias"]])
        clean_mean = np.mean([sx[s.id] for s in ds if not s.meta["planted_bias"]])
        assert biased_mean > clean_mean + 0.3

    def test_ibp_prunes_open_rows(self, tmp_path):
        from tst.config import RunConfig
        from tst.debias.ibp import run_ibp

        ds = make_synthetic_open(n=32, bias_fraction=0.5, seed=1)
        cfg = RunConfig()
        cfg.data.k = 2
        cfg.data.max_len = 256
        cfg.model.name = "tiny"
        cfg.model.dtype = "float32"
        cfg.model.use_pallas = False
        cfg.optim.epochs = 10
        cfg.optim.lr = 5e-3
        cfg.optim.batch_size = 8
        cfg.ibp.rounds = 2
        cfg.ibp.prune_rate = 0.25
        cfg.ibp.stop_epsilon = -1.0  # force both rounds
        cfg.out_dir = str(tmp_path)
        report = run_ibp(ds, cfg)
        assert report["n_debiased"] < len(ds)
        # pruned rows must be mostly the planted-bias ones
        import json

        kept_ids = set()
        with open(tmp_path / "debiased.jsonl") as f:
            for line in f:
                row = json.loads(line)
                if "id" in row:
                    kept_ids.add(row["id"])
        pruned = [s for s in ds if s.id not in kept_ids]
        assert len(pruned) > 0
        frac_biased = np.mean([s.meta["planted_bias"] for s in pruned])
        assert frac_biased >= 0.6
