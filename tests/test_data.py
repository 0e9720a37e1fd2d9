"""Unit tests for the data layer (SURVEY.md §4.1)."""

import numpy as np
import pytest

from tst.data import blind
from tst.data.folds import check_partition, fold_masks, kfold_assign
from tst.data.schema import MCQ, NUMERIC, BlindDataset, Sample, normalize_letter
from tst.data.synthetic import make_synthetic_mcq, make_synthetic_numeric
from tst.data.tokenize import (
    ByteTokenizer,
    pad_batch_n,
    pick_bucket,
    tokenize_dataset,
)


def _sample(**kw):
    base = dict(
        id="s0",
        question="What color is the chair?",
        options=["red", "blue", "green", "yellow"],
        answer="B",
        category="color",
    )
    base.update(kw)
    return Sample(**base)


class TestSchema:
    def test_answer_normalization(self):
        assert normalize_letter("(c)", 4) == "C"
        assert normalize_letter("b.", 4) == "B"
        assert normalize_letter("A) red", 4) == "A"
        with pytest.raises(ValueError):
            normalize_letter("E", 4)

    def test_answer_index(self):
        assert _sample(answer="C").answer_index == 2

    def test_numeric(self):
        s = Sample(id="n", question="How big?", options=[], answer="12.5",
                   answer_type=NUMERIC)
        assert s.answer_value == 12.5
        assert s.answer_index == -1

    def test_chance_accuracy(self):
        ds = BlindDataset("t", [_sample(id=f"s{i}") for i in range(10)])
        assert ds.chance_accuracy() == pytest.approx(0.25)

    def test_jsonl_roundtrip(self, tmp_path):
        ds = make_synthetic_mcq(n=16, seed=3)
        p = tmp_path / "ds.jsonl"
        ds.save_jsonl(str(p))
        ds2 = BlindDataset.load_jsonl(str(p))
        assert ds2.name == ds.name
        assert ds2.fingerprint() == ds.fingerprint()

    def test_fingerprint_changes(self):
        a = make_synthetic_mcq(n=8, seed=0)
        b = make_synthetic_mcq(n=8, seed=1)
        assert a.fingerprint() != b.fingerprint()


class TestBlindRendering:
    def test_prompt_contains_question_and_options_only(self):
        s = _sample()
        p = blind.render_prompt(s)
        assert "What color is the chair?" in p
        assert "A. red" in p and "D. yellow" in p
        assert p.endswith(blind.ANSWER_MARKER)
        # gold answer must NOT leak into the prompt
        assert "Answer: B" not in p

    def test_target(self):
        assert blind.render_target(_sample()) == " B"

    def test_context_included(self):
        s = _sample(context="a long transcript")
        assert "a long transcript" in blind.render_prompt(s)
        assert "transcript" not in blind.render_prompt(s, include_context=False)

    def test_deterministic(self):
        s = _sample()
        assert blind.render_prompt(s) == blind.render_prompt(s)


class TestFolds:
    def test_partition_and_determinism(self):
        ds = make_synthetic_mcq(n=100, seed=0)
        f1 = kfold_assign(ds, 5, seed=7)
        f2 = kfold_assign(ds, 5, seed=7)
        np.testing.assert_array_equal(f1, f2)
        counts = check_partition(f1, 5)
        assert max(counts) - min(counts) <= len(ds.categories) * 4  # loose balance

    def test_seed_changes_split(self):
        ds = make_synthetic_mcq(n=100, seed=0)
        assert (kfold_assign(ds, 5, 0) != kfold_assign(ds, 5, 1)).any()

    def test_stratification(self):
        ds = make_synthetic_mcq(n=400, seed=0)
        fid = kfold_assign(ds, 4, seed=0)
        # within each (category, answer) stratum fold counts differ by <= 1
        strata = {}
        for i, s in enumerate(ds):
            strata.setdefault((s.category, s.answer), []).append(fid[i])
        for key, fids in strata.items():
            c = np.bincount(np.array(fids), minlength=4)
            assert c.max() - c.min() <= 1, (key, c)

    def test_fold_masks(self):
        fid = np.array([0, 1, 2, 0, 1], dtype=np.int32)
        m = fold_masks(fid, 3)
        assert m.shape == (3, 5)
        assert not m[0, 0] and m[0, 1]
        # every sample is excluded from exactly one fold's training set
        np.testing.assert_array_equal((~m).sum(axis=0), np.ones(5))


class TestTokenize:
    def test_bucket(self):
        assert pick_bucket(100) == 128
        assert pick_bucket(129) == 256

    def test_byte_tokenizer_roundtrip(self):
        t = ByteTokenizer()
        ids = t.encode("hello")
        assert t.decode(ids) == "hello"

    def test_single_token_options(self):
        t = ByteTokenizer()
        ids = t.option_token_ids(4)
        assert ids.shape == (4,)
        assert len(set(ids.tolist())) == 4

    def test_tokenize_dataset_shapes_and_answer_pos(self):
        ds = make_synthetic_mcq(n=12, seed=0)
        t = ByteTokenizer()
        tb = tokenize_dataset(ds, t)
        assert tb.tokens.shape[0] == 12
        assert tb.tokens.shape[1] in (128, 256, 512)
        opt_ids = tb.option_token_ids
        for i, s in enumerate(ds):
            # token AT answer_pos+1 is the first target token == gold letter id
            first_target = tb.tokens[i, tb.answer_pos[i] + 1]
            assert first_target == opt_ids[s.answer_index]
            # loss mask starts exactly at the first target position
            assert tb.loss_mask[i, tb.answer_pos[i]] == 0.0
            assert tb.loss_mask[i, tb.answer_pos[i] + 1] == 1.0
            assert tb.gold[i] == s.answer_index

    def test_truncation_keeps_tail(self):
        ds = BlindDataset("t", [_sample(context="x" * 5000)])
        tb = tokenize_dataset(ds, ByteTokenizer(), max_len=256)
        assert tb.tokens.shape[1] == 256
        i = 0
        first_target = tb.tokens[i, tb.answer_pos[i] + 1]
        assert first_target == tb.option_token_ids[1]  # answer B survived truncation

    def test_pad_batch_n(self):
        ds = make_synthetic_mcq(n=10, seed=0)
        tb = tokenize_dataset(ds, ByteTokenizer())
        padded, valid = pad_batch_n(tb, 8)
        assert padded.n == 16
        assert valid.sum() == 10
        assert (padded.gold[10:] == -1).all()
        assert (padded.loss_mask[10:] == 0).all()


class TestSynthetic:
    def test_planted_fraction(self):
        ds = make_synthetic_mcq(n=200, bias_fraction=0.3, seed=0)
        planted = [s.meta["planted_bias"] for s in ds]
        assert sum(planted) == 60

    def test_longest_option_bias_holds(self):
        ds = make_synthetic_mcq(n=100, bias_fraction=1.0, bias_kind="longest_option")
        hits = sum(
            1 for s in ds
            if max(range(len(s.options)), key=lambda j: len(s.options[j])) == s.answer_index
        )
        assert hits >= 95

    def test_position_bias_holds(self):
        ds = make_synthetic_mcq(n=100, bias_fraction=1.0, bias_kind="position")
        assert all(s.answer == "A" for s in ds)

    def test_unbiased_is_uniform_ish(self):
        ds = make_synthetic_mcq(n=400, bias_fraction=0.0, seed=0)
        counts = np.bincount([s.answer_index for s in ds], minlength=4)
        assert counts.min() > 60

    def test_numeric(self):
        ds = make_synthetic_numeric(n=16)
        # CLI route: load_benchmark("synthetic-numeric") reaches the same
        # generator (the decode-scored numeric path is CLI-drivable)
        from tst.data.adapters import load_benchmark

        ds_cli = load_benchmark("synthetic-numeric", n=16, seed=0)
        assert [x.id for x in ds_cli] == [x.id for x in ds]
        assert all(s.answer_type == NUMERIC for s in ds)
        assert np.isfinite([s.answer_value for s in ds]).all()
