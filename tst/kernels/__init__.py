"""Pallas TPU kernels (SURVEY.md §2b B12): fused attention + MLP, fwd+bwd.

  * ``flash_attention.flash_attention`` — online-softmax fwd, dQ/dKV bwd
    kernels, causal, GQA (``model.use_pallas``, ON by default on TPU: +12%
    step rate and removes the S^2 f32 probs buffer).
  * ``fused_mlp.fused_swiglu_mlp`` — gate/up/down in one kernel,
    VMEM-resident hidden tiles (``model.fused_mlp``, OFF by default:
    measured 15% BELOW XLA's own fusion in the fold-parallel train step on
    v5e at S=512 — scripts/measure_fused_mlp.py, docs/RESULTS.md).

XLA fallbacks live in the model core; both kernels are flag-switchable.
NB: no re-exports here — ``from tst.kernels import flash_attention`` must
keep resolving to the SUBMODULE (tests monkeypatch its _INTERPRET flag).
"""
