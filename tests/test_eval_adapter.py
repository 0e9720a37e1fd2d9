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

        # VERDICT r1 item 8: k comes from the checkpoint stamp, not the
        # serving config — loading with a DIFFERENT cfg.data.k must work
        cfg_wrong_k = RunConfig.from_json(cfg.to_json())
        cfg_wrong_k.data.k = 5
        served = run_blind_eval(eval_ds, cfg_wrong_k, adapter_dir=adapter)
        assert served["blind_accuracy"] == with_adapter["blind_accuracy"]

        # fold selection: fold 1 and the fold-mean ensemble both serve
        f1 = run_blind_eval(eval_ds, cfg, adapter_dir=adapter, fold="1")
        assert f1["adapter_fold"] == "1"
        fm = run_blind_eval(eval_ds, cfg, adapter_dir=adapter, fold="mean")
        assert fm["blind_accuracy"] > zero_shot["blind_accuracy"]
        with pytest.raises(ValueError, match="out of range"):
            run_blind_eval(eval_ds, cfg, adapter_dir=adapter, fold="7")

        # model-name mismatch is an error, not silently wrong serving
        cfg_wrong_model = RunConfig.from_json(cfg.to_json())
        cfg_wrong_model.model.name = "small"
        with pytest.raises(ValueError, match="trained on model"):
            run_blind_eval(eval_ds, cfg_wrong_model, adapter_dir=adapter)
