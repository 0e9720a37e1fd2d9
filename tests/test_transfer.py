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
