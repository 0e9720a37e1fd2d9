"""Staged s(x)-parity protocol (VERDICT r1 item 4; BASELINE.json north-star:
Spearman >= 0.99 vs the released VSI-Bench-Debiased).

The real artifact is unreachable offline, so this test stages the ENTIRE
protocol against a reference-SHAPED fixture: raw HF-schema VSI-Bench rows
with a planted shortcut, a "released debiased split" file in the same raw
schema (the kept rows), and the one-command check `tst compare
--reference-kept <file> --bench vsi_bench`. When the real dataset lands,
the same commands run unchanged (docs/PARITY.md).
"""

import json

import numpy as np
import pytest

from tst import cli


def _vsi_rows(n: int, bias_fraction: float, seed: int):
    """Raw HuggingFace-schema VSI-Bench rows (id / question_type / question /
    options / ground_truth) with a longest-option shortcut planted on the
    first ``bias_fraction`` of rows."""
    rng = np.random.default_rng(seed)
    nouns = ["chair", "table", "sofa", "lamp", "window", "door", "shelf"]
    rows = []
    n_biased = int(round(n * bias_fraction))
    for i in range(n):
        biased = i < n_biased
        opts = [" ".join(rng.choice(nouns, 2)) for _ in range(4)]
        gold = int(rng.integers(4))
        if biased:
            opts[gold] = opts[gold] + " " + " ".join(rng.choice(nouns, 6))
        rows.append({
            "id": f"vsi-fixture-{i:05d}",
            "question_type": "route_planning",
            "question": f"Which path leads from the {rng.choice(nouns)} to the {rng.choice(nouns)}?",
            "options": opts,
            "ground_truth": "ABCD"[gold],
            "scene_name": f"scene{i % 7}",
            "dataset": "fixture",
            "planted_bias": bool(biased),  # extra column; adapters ignore it
        })
    order = rng.permutation(n)
    return [rows[j] for j in order]


@pytest.mark.slow
def test_compare_protocol_end_to_end(tmp_path, capsys):
    rows = _vsi_rows(n=150, bias_fraction=0.4, seed=0)
    full = tmp_path / "vsi_full.jsonl"
    with open(full, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    # the "released debiased split": raw rows WITHOUT the planted shortcut,
    # in the same HF schema the real artifact ships
    ref_kept = tmp_path / "vsi_debiased.jsonl"
    with open(ref_kept, "w") as f:
        for r in rows:
            if not r["planted_bias"]:
                f.write(json.dumps(r) + "\n")

    run_dir = tmp_path / "run"
    rc = cli.main([
        "diagnose-rf", "--bench", "vsi_bench", "--source", str(full),
        "--k", "4", "--platform", "cpu", "--out", str(run_dir),
        "--set", "rf.backend=sklearn",
    ])
    assert rc == 0
    capsys.readouterr()

    rc = cli.main([
        "compare", str(run_dir),
        "--reference-kept", str(ref_kept), "--bench", "vsi_bench",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    # the RF diagnostic must reconstruct the reference's removed set well
    assert report["n"] == 150
    assert report["n_ref_kept"] == sum(not r["planted_bias"] for r in rows)
    assert report["removed_f1"] >= 0.75, report
    assert report["sx_removed_pointbiserial"] >= 0.5, report
    # compare writes its report as a machine-checkable artifact into the run
    # dir, like every other stage (VERDICT r2 weak #7)
    parity_path = run_dir / "parity.json"
    assert parity_path.exists()
    on_disk = json.loads(parity_path.read_text())
    assert on_disk["removed_f1"] == report["removed_f1"]
    assert on_disk["reference_kept"] == str(ref_kept)


@pytest.mark.slow
def test_compare_spearman_against_reference_sx(tmp_path, capsys):
    """When a reference publishes an s(x) table, compare reports Spearman —
    a rank-preserving monotone transform of our own scores must clear the
    0.99 north-star (sanity of the metric plumbing end to end)."""
    rows = _vsi_rows(n=100, bias_fraction=0.4, seed=1)
    full = tmp_path / "full.jsonl"
    with open(full, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    run_dir = tmp_path / "run"
    assert cli.main([
        "diagnose-rf", "--bench", "vsi_bench", "--source", str(full),
        "--k", "4", "--platform", "cpu", "--out", str(run_dir),
        "--set", "rf.backend=sklearn",
    ]) == 0
    capsys.readouterr()

    # reference s(x): monotone transform (rank-equal) of ours
    ref_sx = tmp_path / "ref_sx.jsonl"
    with open(run_dir / "sx.jsonl") as f, open(ref_sx, "w") as g:
        for line in f:
            row = json.loads(line)
            s = row["s_x"]
            g.write(json.dumps({
                "id": row["id"],
                "s_x": None if s is None else float(np.tanh(3.0 * s) + 1.0),
            }) + "\n")
    ref_kept = tmp_path / "kept.jsonl"
    with open(ref_kept, "w") as f:
        for r in rows:
            if not r["planted_bias"]:
                f.write(json.dumps(r) + "\n")
    assert cli.main([
        "compare", str(run_dir), "--reference-kept", str(ref_kept),
        "--bench", "vsi_bench", "--reference-sx", str(ref_sx),
    ]) == 0
    report = json.loads(capsys.readouterr().out)
    assert report["spearman"] >= 0.99, report


@pytest.mark.slow  # ~29 s on the 1-core host
def test_diagnose_sft_reports_cross_diagnostic_spearman(tmp_path):
    """Every diagnose-sft report carries Spearman(s_x_rf, s_x_sft) — the
    self-measured analogue of the cross-implementation parity number."""
    from tst.config import RunConfig
    from tst.data.synthetic import make_synthetic_mcq
    from tst.train.pipeline import run_sft_diagnostic

    ds = make_synthetic_mcq(n=48, bias_fraction=0.5, bias_kind="position", seed=0)
    cfg = RunConfig()
    cfg.data.k = 2
    cfg.model.name = "tiny"
    cfg.model.dtype = "float32"
    cfg.model.use_pallas = False
    cfg.optim.epochs = 2
    cfg.optim.batch_size = 16
    cfg.out_dir = str(tmp_path)
    report = run_sft_diagnostic(ds, cfg)
    assert "rf_sft_spearman" in report
    assert np.isfinite(report["rf_sft_spearman"])
    assert "rf_blind_accuracy" in report
