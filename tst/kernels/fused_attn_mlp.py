"""Fused attention + MLP Pallas kernels — façade (SURVEY.md §2b B12).

The two hot-path kernels of the SFT engine, each with a custom_vjp and a
pure-XLA fallback in the model core (flag ``model.use_pallas``):

  * :func:`flash_attention` — tst.kernels.flash_attention (online-softmax
    fwd, dQ/dKV bwd kernels, causal, GQA);
  * :func:`fused_swiglu_mlp` — tst.kernels.fused_mlp (gate/up/down in one
    kernel, VMEM-resident hidden tiles).
"""

from tst.kernels.flash_attention import flash_attention, mha_reference  # noqa: F401
from tst.kernels.fused_mlp import fused_swiglu_mlp, swiglu_reference  # noqa: F401
