"""The ``tst generate`` serving surface: plain greedy + speculative drafts.

Speculative decoding must be invisible in the artifacts — same
generations.jsonl bit-for-bit — while the report carries the acceptance
accounting that justifies (or indicts) the draft.
"""

import json

import pytest

from tst.cli import main


def _run(tmp_path, out, extra):
    rc = main([
        "generate", "--platform", "cpu", "--bench", "synthetic-numeric",
        "--set", "data.n=12", "--set", "model.name=tiny",
        "--set", "model.dtype=float32", "--set", "model.use_pallas=false",
        "--set", "data.max_len=160",
        "--out", str(tmp_path / out), "--max-new", "8", *extra,
    ])
    assert rc == 0
    rows = [json.loads(l) for l in
            (tmp_path / out / "generations.jsonl").read_text().splitlines()]
    report = json.loads((tmp_path / out / "generate_report.json").read_text())
    return rows, report


def test_plain_generate_artifacts(tmp_path):
    rows, report = _run(tmp_path, "plain", [])
    assert len(rows) == 12 == report["n_samples"]
    assert report["tokens_generated"] == 12 * 8
    assert all(r["answer_type"] == "numeric" and "value" in r for r in rows)
    assert "spec_rounds" not in report


def test_speculative_matches_plain_bit_for_bit(tmp_path):
    rows_plain, _ = _run(tmp_path, "plain2", [])
    # same geometry + same seed -> the draft IS the target: acceptance 1.0,
    # so rounds hit the ideal and the artifact must be identical
    rows_spec, report = _run(
        tmp_path, "spec", ["--draft-model", "tiny", "--gamma", "3"])
    assert rows_spec == rows_plain
    assert report["draft"] == "tiny" and report["gamma"] == 3
    assert report["committed_per_round"] == pytest.approx(4.0, abs=0.8)
    assert report["draft_acceptance"] >= 0.7


def test_speculative_unrelated_draft_still_exact(tmp_path):
    rows_plain, _ = _run(tmp_path, "plain3", [])
    # a draft with different geometry (still byte tokenizer) disagrees
    # almost always — output identical, acceptance near zero
    rows_spec, report = _run(
        tmp_path, "spec3",
        ["--draft-model", "small", "--gamma", "2"])
    assert rows_spec == rows_plain
    assert report["draft_acceptance"] <= 0.5
