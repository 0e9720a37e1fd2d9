"""`tst warmup` — AOT compilation of a config's programs (VERDICT r2 #6).

The subcommand must build and compile the train step, held-out scorer and
(when the dataset has numeric rows) the decode program through the same
constructors the real run uses, and write a warmup_report.json with the
per-program compile walls.
"""

import json
import os

import pytest

from tst.cli import main


def test_warmup_end_to_end(tmp_path, capsys):
    out = str(tmp_path / "warm")
    rc = main([
        "warmup", "--platform", "cpu", "--bench", "synthetic:0.5:position",
        "--k", "2", "--set", "data.n=32", "--set", "model.name=tiny",
        "--set", "model.dtype=float32", "--set", "model.use_pallas=false",
        "--set", "optim.batch_size=8", "--out", out,
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["model"] == "tiny" and report["k"] == 2
    assert report["train_step_compile_s"] >= 0
    assert report["scorer_compile_s"] >= 0
    assert os.path.exists(os.path.join(out, "warmup_report.json"))


@pytest.mark.slow  # ~10 s on the 1-core host
def test_warmup_covers_numeric_decode(tmp_path, capsys):
    """A mixed MCQ+numeric dataset warms the decode program too."""
    out = str(tmp_path / "warm2")
    rc = main([
        "warmup", "--platform", "cpu", "--bench", "synthetic-numeric",
        "--k", "2", "--set", "data.n=32", "--set", "model.name=tiny",
        "--set", "model.dtype=float32", "--set", "model.use_pallas=false",
        "--set", "optim.batch_size=8", "--out", out,
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert "decode_numeric_compile_s" in report, report


def test_warmup_covers_spec_decode_draft(tmp_path, capsys):
    """With perf.spec_draft_* set, warmup compiles the fold-vmapped
    SPECULATIVE decode program — the one the run will actually execute."""
    out = str(tmp_path / "warm3")
    rc = main([
        "warmup", "--platform", "cpu", "--bench", "synthetic-numeric",
        "--k", "2", "--set", "data.n=32", "--set", "model.name=tiny",
        "--set", "model.dtype=float32", "--set", "model.use_pallas=false",
        "--set", "optim.batch_size=8",
        "--set", "perf.spec_draft_model=small",
        "--set", "perf.spec_draft_quantize=none",
        "--out", out,
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert "decode_numeric_compile_s" in report, report
