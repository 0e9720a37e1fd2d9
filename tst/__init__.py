"""tst — TPU-native Test-Set Stress-Testing framework.

A brand-new JAX / XLA / Pallas / pjit implementation of the capabilities of
``vision-x-nyu/test-set-training`` (TsT, arXiv:2511.04655). The reference repo
ships no code ("Code / Coming soon!", reference README.md:38-39); the
behavioral spec is the paper abstract reproduced at reference README.md:32-35:

  * blind fine-tuning of an LLM on exclusively the non-visual, textual inputs
    of a benchmark test set, under k-fold cross-validation, assigning each
    sample a bias score s(x);
  * a lightweight, interpretable Random-Forest diagnostic over hand-crafted
    features;
  * Iterative Bias Pruning (IBP) to filter high-bias samples;
  * applied to VSI-Bench, CV-Bench, MMMU and VideoMME.

TPU-native realization (see SURVEY.md §1-§2): fold-parallel LoRA SFT as one
vmapped / GSPMD-sharded program over a ``(fold, data, tensor)`` device mesh,
Pallas fused attention/MLP kernels, a JAX tree-ensemble backend for the RF
auditor, and an on-device IBP prune→retrain loop.
"""

__version__ = "0.1.0"

from tst.data.schema import Sample, BlindDataset  # noqa: F401
