"""Qwen2 / Qwen2.5 model family (SURVEY.md §2b B10; BASELINE.json config 2).

Same decoder core as Llama (tst.models.decoder); family differences pinned
here: QKV biases, tied embeddings (0.5B), rope_theta=1e6.
"""

from __future__ import annotations

from tst.models.decoder import ModelSpec, spec_by_name
from tst.models.hf_load import load_checkpoint, spec_from_hf_config

#: canonical geometry of Qwen/Qwen2.5-0.5B(-Instruct)
QWEN25_05B: ModelSpec = spec_by_name("qwen2.5-0.5b")


def spec(name: str = "qwen2.5-0.5b", **overrides) -> ModelSpec:
    return spec_by_name(name, **overrides)


def from_pretrained(ckpt_dir: str, dtype=None, put=None):
    """(spec, params) from a local HF Qwen2 checkpoint directory."""
    s = spec_from_hf_config(ckpt_dir, name="qwen2")
    params = load_checkpoint(ckpt_dir, s, dtype=dtype, put=put)
    return s, params
