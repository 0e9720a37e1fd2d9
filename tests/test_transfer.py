"""Train-transfer control experiment (the VSI-Train-10k leg)."""

import tempfile

import numpy as np
import pytest

from tst.config import RunConfig
from tst.data.synthetic import make_synthetic_mcq
from tst.train.transfer import run_train_transfer


def _cfg():
    cfg = RunConfig()
    cfg.model.name = "tiny"
    cfg.model.dtype = "float32"
    cfg.model.use_pallas = False
    cfg.lora.rank = 4
    cfg.lora.alpha = 8.0
    cfg.lora.targets = ("q_proj", "v_proj")
    cfg.optim.lr = 5e-3
    cfg.optim.epochs = 5
    cfg.optim.batch_size = 16
    cfg.out_dir = tempfile.mkdtemp()
    return cfg


@pytest.mark.slow
class TestTrainTransfer:
    def test_shared_prior_transfers(self):
        """Training data with the SAME position bias as the test set lifts
        blind accuracy on the test set — the transferable-prior case."""
        train = make_synthetic_mcq(n=64, bias_fraction=1.0, bias_kind="position",
                                   seed=1)
        test = make_synthetic_mcq(n=48, bias_fraction=1.0, bias_kind="position",
                                  seed=2)
        rep = run_train_transfer(train, test, _cfg())
        assert rep["blind_accuracy"] > rep["chance_accuracy"] + 0.2, rep
        assert rep["experiment"] == "train_transfer"
        assert rep["n_train"] == 64 and rep["n_eval"] == 48

    def test_unbiased_training_does_not_transfer(self):
        """Clean training data must NOT lift blind accuracy on a clean test
        set (the null control)."""
        train = make_synthetic_mcq(n=64, bias_fraction=0.0, seed=3)
        test = make_synthetic_mcq(n=48, bias_fraction=0.0, seed=4)
        rep = run_train_transfer(train, test, _cfg())
        assert rep["blind_accuracy"] < rep["chance_accuracy"] + 0.2, rep

    def test_zero_shot_baseline_rides_in_report(self):
        """The experiment's claim is the delta vs zero-shot (VERDICT r3 weak
        #4): the report must carry both legs and the delta itself."""
        train = make_synthetic_mcq(n=48, bias_fraction=1.0,
                                   bias_kind="position", seed=1)
        test = make_synthetic_mcq(n=32, bias_fraction=1.0,
                                  bias_kind="position", seed=2)
        rep = run_train_transfer(train, test, _cfg())
        assert "zero_shot_blind_accuracy" in rep, rep
        assert "transfer_delta_blind_accuracy" in rep
        assert rep["transfer_delta_blind_accuracy"] == pytest.approx(
            rep["blind_accuracy"] - rep["zero_shot_blind_accuracy"], abs=1e-3)

    def test_numeric_rows_scored(self):
        """VSI-shaped eval sets are ~25% numeric (VERDICT r3 missing #2):
        the eval leg must decode and MRA-score them, zero-shot and post."""
        from tst.data.synthetic import make_synthetic_vsi

        train = make_synthetic_vsi(n=40, bias_fraction=0.5,
                                   numeric_fraction=0.25, seed=5)
        test = make_synthetic_vsi(n=32, bias_fraction=0.5,
                                  numeric_fraction=0.25, seed=6)
        cfg = _cfg()
        cfg.optim.epochs = 2
        rep = run_train_transfer(train, test, cfg)
        assert "numeric_blind_mra" in rep, rep
        assert "zero_shot_numeric_blind_mra" in rep
        assert "transfer_delta_numeric_blind_mra" in rep
        assert 0.0 <= rep["numeric_blind_mra"] <= 1.0
        assert rep["n_numeric"] == sum(
            1 for s in test if s.answer_type == "numeric")
