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


def test_warmup_ibp_mode(tmp_path, capsys):
    """`tst warmup --ibp` warms the debias-ibp ROUND programs: the loop's
    shapes are pinned at round 0 (pad_m scorer grid, pad_numeric decode
    bound, total_steps0 LR constant — tst.debias.ibp.round0_sizing), which
    differ from the diagnose-sft shapes, so a plain warmup leaves round 0
    paying the full compile wall (measured 171 s at n=300 on the chip,
    docs/RESULTS.md round-5)."""
    out = str(tmp_path / "warmibp")
    rc = main([
        "warmup", "--platform", "cpu", "--bench", "synthetic-vsi:0.5",
        "--k", "2", "--set", "data.n=40", "--set", "model.name=tiny",
        "--set", "model.dtype=float32", "--set", "model.use_pallas=false",
        "--set", "optim.batch_size=8", "--ibp", "--out", out,
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["target"] == "debias-ibp"
    assert "decode_numeric_compile_s" in report, report

    # the mode exists because these shapes genuinely differ: the IBP
    # trainer's LR constant is the across-rounds upper bound, not the
    # diagnose run's actual step count
    from tst.cli import _load_dataset, _resolve, build_parser
    from tst.debias.ibp import round0_sizing

    args = build_parser().parse_args([
        "warmup", "--platform", "cpu", "--bench", "synthetic-vsi:0.5",
        "--k", "2", "--set", "data.n=40", "--set", "model.name=tiny",
        "--set", "optim.batch_size=8", "--out", out,
    ])
    cfg = _resolve(args)
    ds = _load_dataset(cfg)
    sizing = round0_sizing(ds, cfg, cfg.data.k)
    assert sizing["total_steps0"] >= 1 and sizing["pad_m"] >= 1
    assert sizing["pad_numeric"] is not None  # synthetic-vsi mixes numeric


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
