"""Llama-3 model family (SURVEY.md §2b B10; BASELINE.json configs 3/5).

The architecture core lives in tst.models.decoder (shared with Qwen2 — same
RMSNorm/RoPE/GQA/SwiGLU family); this module pins the family's geometry and
checkpoint conventions: no QKV biases, untied lm_head, rope_theta=5e5.
"""

from __future__ import annotations

from tst.models.decoder import ModelSpec, spec_by_name
from tst.models.hf_load import load_checkpoint, spec_from_hf_config

#: canonical geometry of meta-llama/Meta-Llama-3-8B
LLAMA3_8B: ModelSpec = spec_by_name("llama3-8b")


def spec(name: str = "llama3-8b", **overrides) -> ModelSpec:
    return spec_by_name(name, **overrides)


def from_pretrained(ckpt_dir: str, dtype=None, put=None):
    """(spec, params) from a local HF Llama checkpoint directory."""
    s = spec_from_hf_config(ckpt_dir, name="llama3")
    if s.qkv_bias:
        raise ValueError(f"{ckpt_dir} looks like a Qwen2 checkpoint, not Llama")
    params = load_checkpoint(ckpt_dir, s, dtype=dtype, put=put)
    return s, params
