"""Cross-diagnostic consistency: the RF auditor and the blind-SFT engine
must largely agree on WHICH samples are shortcut-exploitable (the paper uses
the RF as the fast interpretable cross-check of the SFT diagnostic,
reference README.md:35)."""

import tempfile

import numpy as np
import pytest

from tst.config import RunConfig
from tst.data.synthetic import make_synthetic_mcq
from tst.diagnose.rf import run_rf_diagnostic
from tst.eval.parity import membership_agreement, spearman


@pytest.mark.slow
class TestCrossDiagnosticAgreement:
    def test_rf_and_sft_rank_same_samples(self):
        # position bias is learnable by both diagnostics
        ds = make_synthetic_mcq(n=96, bias_fraction=0.5, bias_kind="position",
                                seed=0)
        rf = run_rf_diagnostic(ds, k=3, seed=0, n_estimators=60)

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
        cfg.optim.batch_size = 16
        cfg.out_dir = tempfile.mkdtemp()
        from tst.train.pipeline import run_sft_diagnostic

        sft = run_sft_diagnostic(ds, cfg, return_state=True)
        s_sft = sft["_state"]["s_x"]

        planted = np.array([s.meta["planted_bias"] for s in ds])
        # both diagnostics must put planted samples in their top halves
        for s_x, name in ((rf.s_x, "rf"), (s_sft, "sft")):
            top = np.argsort(-np.nan_to_num(s_x))[: planted.sum()]
            assert planted[top].mean() > 0.6, (name, planted[top].mean())
        # and correlate with each other on the ranking itself
        rho = spearman(rf.s_x, s_sft)
        assert rho > 0.2, rho  # tiny-model SFT scores are noisy; the top-half
        # membership checks above carry the semantic assertion
