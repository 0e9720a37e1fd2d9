"""Ranking-parity utilities + compare CLI (SURVEY.md §4.6 golden ranking)."""

import json

import numpy as np
import pytest

from tst.cli import main
from tst.eval.parity import membership_agreement, spearman


class TestSpearman:
    def test_perfect(self):
        a = np.array([0.1, 0.5, 0.9, 0.3])
        assert spearman(a, a * 7 + 1) == pytest.approx(1.0)

    def test_reversed(self):
        a = np.array([1.0, 2.0, 3.0, 4.0])
        assert spearman(a, -a) == pytest.approx(-1.0)

    def test_nan_excluded(self):
        a = np.array([1.0, 2.0, np.nan, 4.0, 5.0])
        b = np.array([1.1, 2.2, 0.0, 4.4, 5.5])
        assert spearman(a, b) == pytest.approx(1.0)


class TestMembershipAgreement:
    def test_perfect_partition(self):
        s = np.array([0.9, 0.1, 0.8, 0.2])
        ids = ["a", "b", "c", "d"]
        rep = membership_agreement(s, ids, reference_kept_ids=["b", "d"])
        assert rep["removed_f1"] == 1.0
        assert rep["removed_precision"] == 1.0

    def test_partial(self):
        s = np.array([0.9, 0.8, 0.1, 0.2])
        rep = membership_agreement(s, ["a", "b", "c", "d"], ["b", "d"])
        # our removed = {a, b}; reference removed = {a, c} → 1 of 2 match
        assert rep["removed_precision"] == 0.5

    def test_bad_reference(self):
        with pytest.raises(ValueError):
            membership_agreement(np.array([0.1]), ["a"], ["zzz"])


class TestCompareCLI:
    def test_end_to_end(self, tmp_path, capsys):
        run = str(tmp_path / "run")
        main(["diagnose-rf", "--bench", "synthetic:0.5", "--k", "3",
              "--set", "data.n=120", "--set", "rf.n_estimators=30", "--out", run])
        capsys.readouterr()
        # build a "reference" kept-set from planted-bias ground truth
        from tst.data.schema import BlindDataset

        ds = BlindDataset.load_jsonl(f"{run}/dataset.jsonl")
        kept = ds.subset([i for i, s in enumerate(ds) if not s.meta["planted_bias"]])
        ref_path = str(tmp_path / "ref_kept.jsonl")
        kept.save_jsonl(ref_path)
        rc = main(["compare", run, "--reference-kept", ref_path,
                   "--reference-sx", f"{run}/sx.jsonl"])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out)
        # s(x) from the RF must largely reproduce the planted partition
        assert rep["removed_f1"] > 0.7, rep
        assert rep["spearman"] == pytest.approx(1.0)  # self-comparison
