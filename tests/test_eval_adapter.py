"""eval-blind with a trained adapter checkpoint (the serving leg)."""

import tempfile

import numpy as np
import pytest

from tst.config import RunConfig
from tst.data.synthetic import make_synthetic_mcq
from tst.train.pipeline import run_blind_eval, run_sft_diagnostic


@pytest.mark.slow
class TestEvalWithAdapter:
    def test_adapter_checkpoint_scores_above_zero_shot(self):
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
        cfg.out_dir = tempfile.mkdtemp()
        cfg.checkpoint_dir = tempfile.mkdtemp()
        ds = make_synthetic_mcq(n=64, bias_fraction=1.0, bias_kind="position",
                                seed=0)
        run_sft_diagnostic(ds, cfg)

        # evaluate a DIFFERENT position-biased set with the trained adapters
        eval_ds = make_synthetic_mcq(n=32, bias_fraction=1.0,
                                     bias_kind="position", seed=9)
        adapter = f"{cfg.checkpoint_dir}/seed_0_epoch_{cfg.optim.epochs - 1:03d}"
        with_adapter = run_blind_eval(eval_ds, cfg, adapter_dir=adapter)
        zero_shot = run_blind_eval(eval_ds, cfg)
        assert with_adapter["zero_shot"] is False
        assert zero_shot["zero_shot"] is True
        assert (with_adapter["blind_accuracy"]
                > zero_shot["blind_accuracy"] + 0.2), (with_adapter, zero_shot)
