"""IBP pruning math + end-to-end semantics (SURVEY.md §4.1/§4.4)."""

import tempfile

import numpy as np
import pytest

from tst.config import RunConfig
from tst.data.synthetic import make_synthetic_mcq
from tst.debias.ibp import prune_mask, run_ibp


class TestPruneMask:
    def test_prunes_top_fraction(self):
        s = np.array([0.9, 0.1, 0.8, 0.2, 0.5, 0.3, 0.7, 0.4], np.float32)
        alive = np.ones(8, bool)
        out = prune_mask(s, alive, prune_rate=0.25, min_keep=2)
        assert out.sum() == 6
        assert not out[0] and not out[2]  # two highest s(x) pruned

    def test_never_prunes_nan(self):
        s = np.array([np.nan, np.nan, 0.1, 0.2], np.float32)
        out = prune_mask(s, np.ones(4, bool), prune_rate=0.5, min_keep=1)
        assert out[0] and out[1]

    def test_respects_min_keep(self):
        s = np.linspace(0, 1, 10).astype(np.float32)
        out = prune_mask(s, np.ones(10, bool), prune_rate=0.9, min_keep=8)
        assert out.sum() == 8

    def test_dead_stay_dead(self):
        s = np.array([0.9, 0.8, 0.1, 0.2], np.float32)
        alive = np.array([False, True, True, True])
        out = prune_mask(s, alive, prune_rate=0.34, min_keep=1)
        assert not out[0]
        assert out.sum() == 2

    def test_category_balanced(self):
        # category 0 has the top s(x) everywhere; unbalanced pruning would
        # remove only category-0 samples
        s = np.array([0.9, 0.95, 0.85, 0.8, 0.3, 0.2, 0.25, 0.1], np.float32)
        cats = np.array([0, 0, 0, 0, 1, 1, 1, 1])
        out = prune_mask(s, np.ones(8, bool), prune_rate=0.5, categories=cats,
                         min_keep=2)
        assert out.sum() == 4
        assert (~out[:4]).sum() == 2 and (~out[4:]).sum() == 2

    def test_zero_budget(self):
        s = np.array([0.9, 0.1], np.float32)
        out = prune_mask(s, np.ones(2, bool), prune_rate=0.01, min_keep=1)
        assert out.all()


class TestIBPEndToEnd:
    """IBP with the RF diagnostic must prune planted-bias samples first and
    stop once blind accuracy reaches chance (SURVEY.md §4.4)."""

    def _cfg(self, rounds=6, rate=0.15):
        cfg = RunConfig()
        cfg.data.k = 3
        cfg.rf.n_estimators = 40
        cfg.ibp.rounds = rounds
        cfg.ibp.prune_rate = rate
        cfg.ibp.stop_epsilon = 0.04
        cfg.ibp.diagnostic = "rf"
        cfg.out_dir = tempfile.mkdtemp()
        return cfg

    @pytest.mark.slow  # ~7 s on the 1-core host
    def test_prunes_planted_bias_first(self):
        ds = make_synthetic_mcq(n=300, bias_fraction=0.4,
                                bias_kind="longest_option", seed=3)
        cfg = self._cfg()
        rep = run_ibp(ds, cfg)
        assert rep["rounds_run"] >= 2
        from tst.data.schema import BlindDataset

        removed = BlindDataset.load_jsonl(f"{cfg.out_dir}/removed.jsonl")
        kept = BlindDataset.load_jsonl(f"{cfg.out_dir}/debiased.jsonl")
        assert len(removed) + len(kept) == 300
        planted_removed = np.mean([s.meta["planted_bias"] for s in removed])
        planted_kept = np.mean([s.meta["planted_bias"] for s in kept])
        assert planted_removed > 0.7, (planted_removed, rep)
        assert planted_kept < planted_removed

    def test_debiased_blind_acc_reaches_chance(self):
        ds = make_synthetic_mcq(n=300, bias_fraction=0.3,
                                bias_kind="longest_option", seed=5)
        rep = run_ibp(ds, self._cfg(rounds=8, rate=0.12))
        assert rep["final_blind_accuracy"] <= rep["final_chance"] + 0.08, rep

    def test_unbiased_stops_immediately(self):
        ds = make_synthetic_mcq(n=200, bias_fraction=0.0, seed=0)
        rep = run_ibp(ds, self._cfg())
        assert rep["stop_reason"] == "blind_acc<=chance+eps"
        assert rep["rounds_run"] <= 2
        assert rep["fraction_kept"] >= 0.8


@pytest.mark.slow
class TestIBPSftFastPath:
    """SFT-diagnostic IBP: one tokenization/model, constant program shapes
    across rounds (the on-device loop the north-star requires)."""

    def test_prunes_position_bias(self):
        cfg = RunConfig()
        cfg.data.k = 2
        cfg.model.name = "tiny"
        cfg.model.dtype = "float32"
        cfg.model.use_pallas = False
        cfg.lora.rank = 4
        cfg.lora.alpha = 8.0
        cfg.lora.targets = ("q_proj", "v_proj")
        cfg.optim.lr = 5e-3
        cfg.optim.epochs = 5
        cfg.optim.batch_size = 16
        cfg.ibp.diagnostic = "sft"
        cfg.ibp.rounds = 3
        cfg.ibp.prune_rate = 0.25
        cfg.ibp.stop_epsilon = 0.05
        cfg.out_dir = tempfile.mkdtemp()
        ds = make_synthetic_mcq(n=96, bias_fraction=0.5, bias_kind="position",
                                seed=0)
        rep = run_ibp(ds, cfg)
        assert rep["rounds_run"] >= 2
        accs = [a["blind_accuracy"] for a in rep["per_round"]]
        assert accs[0] > 0.4  # position shortcut learned in round 0
        assert accs[-1] < accs[0]  # pruning reduces exploitability
        from tst.data.schema import BlindDataset

        removed = BlindDataset.load_jsonl(f"{cfg.out_dir}/removed.jsonl")
        assert np.mean([s.meta["planted_bias"] for s in removed]) > 0.6
        # parity-evidence fields (VERDICT r2 #7): RF-vs-SFT rank agreement
        # rides along in the IBP report like in diagnose-sft's
        assert "rf_sft_spearman" in rep
        assert -1.0 <= rep["rf_sft_spearman"] <= 1.0
        assert "rf_blind_accuracy" in rep


class TestIBPScoreEpochs:
    """optim.score_epochs now composes with the IBP loop (VERDICT r1 weak #3):
    mid-training snapshots are scored into s(x) with the same pinned-shape
    scorer program."""

    @pytest.mark.slow
    def test_score_epochs_runs_and_prunes(self):
        cfg = RunConfig()
        cfg.data.k = 2
        cfg.model.name = "tiny"
        cfg.model.dtype = "float32"
        cfg.model.use_pallas = False
        cfg.lora.rank = 4
        cfg.lora.alpha = 8.0
        cfg.lora.targets = ("q_proj", "v_proj")
        cfg.optim.lr = 5e-3
        cfg.optim.epochs = 4
        cfg.optim.batch_size = 16
        cfg.optim.score_epochs = (2,)  # mid-training snapshot joins s(x)
        cfg.ibp.diagnostic = "sft"
        cfg.ibp.rounds = 2
        cfg.ibp.prune_rate = 0.25
        cfg.ibp.stop_epsilon = 0.05
        cfg.out_dir = tempfile.mkdtemp()
        ds = make_synthetic_mcq(n=64, bias_fraction=0.5, bias_kind="position",
                                seed=1)
        rep = run_ibp(ds, cfg)
        assert rep["rounds_run"] >= 1
        assert rep["per_round"][0]["blind_accuracy"] > 0.4


def _numeric_cfg(out_dir, rounds=3):
    cfg = RunConfig()
    cfg.data.k = 2
    cfg.model.name = "tiny"
    cfg.model.dtype = "float32"
    cfg.model.use_pallas = False
    cfg.lora.rank = 4
    cfg.lora.alpha = 8.0
    cfg.lora.targets = ("q_proj", "v_proj")
    cfg.optim.lr = 5e-3
    cfg.optim.epochs = 6
    cfg.optim.batch_size = 4  # n=48, k=2: enough steps to learn the prior
    cfg.ibp.diagnostic = "sft"
    cfg.ibp.rounds = rounds
    cfg.ibp.prune_rate = 0.25
    cfg.ibp.stop_epsilon = 0.05
    cfg.out_dir = out_dir
    return cfg


@pytest.mark.slow
class TestIBPNumeric:
    """Numeric-only debiasing (VERDICT r3 missing #3): the stop rule must
    use the numeric MRA-vs-chance signal — previously the degenerate MCQ
    accuracy (0 <= 0 + eps) stopped the loop at round 0 having pruned
    nothing, making debias-ibp a silent no-op on numeric benchmarks."""

    def test_prunes_constant_answer_prior(self):
        from tst.data.synthetic import make_synthetic_numeric

        ds = make_synthetic_numeric(n=48, bias_fraction=0.75, seed=0)
        rep = run_ibp(ds, _numeric_cfg(tempfile.mkdtemp()))
        # round 0 must run, exploit the constant prior, and prune
        assert rep["rounds_run"] >= 2, rep
        r0 = rep["per_round"][0]
        assert r0["numeric_mra"] > r0["numeric_chance_mra"] + 0.05, r0
        assert rep["fraction_kept"] < 1.0
        assert rep["stop_reason"] == "numeric_mra<=chance+eps"

    def test_unbiased_numeric_stops_without_pruning(self):
        from tst.data.synthetic import make_synthetic_numeric

        ds = make_synthetic_numeric(n=48, bias_fraction=0.0, seed=1)
        rep = run_ibp(ds, _numeric_cfg(tempfile.mkdtemp()))
        assert rep["fraction_kept"] == 1.0
        assert rep["per_round"][0]["numeric_chance_mra"] > 0.0


@pytest.mark.slow
class TestIBPResume:
    """IBP round-level checkpoint/resume (SURVEY §5: "IBP resumes mid-loop
    from (round, surviving mask)" — VERDICT r3 missing #4): a run killed
    after round r resumes at round r+1 and produces the identical split."""

    def test_resume_after_injected_failure(self):
        from tst.data.schema import BlindDataset
        from tst.data.synthetic import make_synthetic_numeric

        ds = make_synthetic_numeric(n=48, bias_fraction=0.75, seed=0)
        ref_dir, res_dir = tempfile.mkdtemp(), tempfile.mkdtemp()
        ref = run_ibp(ds, _numeric_cfg(ref_dir))  # uninterrupted reference

        import os

        cfg = _numeric_cfg(res_dir)
        cfg.ibp.fail_after_rounds = 1
        with pytest.raises(RuntimeError, match="injected failure"):
            run_ibp(ds, cfg)
        assert os.path.exists(f"{res_dir}/ibp_state.json")
        cfg.ibp.fail_after_rounds = 0
        rep = run_ibp(ds, cfg)
        assert rep["resumed_from_round"] == 1
        assert not os.path.exists(f"{res_dir}/ibp_state.json")  # cleaned up
        kept_ref = [s.id for s in BlindDataset.load_jsonl(f"{ref_dir}/debiased.jsonl")]
        kept_res = [s.id for s in BlindDataset.load_jsonl(f"{res_dir}/debiased.jsonl")]
        assert kept_ref == kept_res

        # trajectories must match exactly; wall-clock keys (round_wall_s +
        # the round_*_s stage decomposition) legitimately differ per run
        def _traj(rows):
            return [{k: v for k, v in r.items()
                     if not (k.startswith("round_") and k.endswith("_s"))}
                    for r in rows]

        assert _traj(rep["per_round"]) == _traj(ref["per_round"])

    def test_config_mismatch_starts_fresh(self):
        from tst.data.synthetic import make_synthetic_numeric

        ds = make_synthetic_numeric(n=48, bias_fraction=0.75, seed=0)
        out = tempfile.mkdtemp()
        cfg = _numeric_cfg(out)
        cfg.ibp.fail_after_rounds = 1
        with pytest.raises(RuntimeError, match="injected failure"):
            run_ibp(ds, cfg)
        # a different prune_rate invalidates the persisted trajectory
        cfg2 = _numeric_cfg(out)
        cfg2.ibp.prune_rate = 0.5
        rep = run_ibp(ds, cfg2)
        assert rep["resumed_from_round"] is None
