"""LoRA adapters with a leading fold axis for fold-parallel SFT.

Requirement: blind *fine-tuning* of the LLM on test-set text (reference
README.md:35). LoRA is the TPU-idiomatic realization (north-star): the frozen
base stays one FSDP-sharded copy while each of the k folds owns only a tiny
adapter state — so all k fold-models train simultaneously as ONE vmapped
program (SURVEY.md §2b B11: "fold axis = leading batch axis on adapter
params"), the signature parallelism axis of this workload.

Adapters are stacked on the model's layer axis (matching the decoder's
``lax.scan``), so inside the scan each layer sees its own ``[r, in]``/
``[out, r]`` slices. B is zero-initialized ⇒ step-0 forward equals the base
model exactly.

Efficiency notes (PAPERS.md): the delta is computed as ``(x @ A^T) @ B^T``
(never materializing A^T B^T ∈ R^{in×out}) — the "Run LoRA Run" ordering; for
tensor-parallel serving the B projection shards over the same ``heads`` axis
as the base weight it patches, so no extra collectives are introduced
(block-diagonal-LoRA insight, PAPERS.md:9).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

#: target-name → (input-projection key, output dim attr) in the decoder layer
_TARGET_DIMS = {
    "q_proj": ("d_model", "q_dim"),
    "k_proj": ("d_model", "kv_dim"),
    "v_proj": ("d_model", "kv_dim"),
    "o_proj": ("q_dim", "d_model"),
    "gate_proj": ("d_model", "d_ff"),
    "up_proj": ("d_model", "d_ff"),
    "down_proj": ("d_ff", "d_model"),
}

#: decoder-internal projection name → LoRA target name
PROJ_TO_TARGET = {
    "q": "q_proj", "k": "k_proj", "v": "v_proj", "o": "o_proj",
    "gate": "gate_proj", "up": "up_proj", "down": "down_proj",
}


@dataclasses.dataclass(frozen=True)
class LoraSpec:
    rank: int = 16
    alpha: float = 32.0
    targets: Tuple[str, ...] = ("q_proj", "k_proj", "v_proj", "o_proj")
    dtype: Any = jnp.bfloat16
    #: train-time inverted dropout on the adapter input (PEFT convention);
    #: applied only when the caller threads an rng (training), never at
    #: inference/serving
    dropout: float = 0.0

    def __post_init__(self):
        bad = set(self.targets) - set(_TARGET_DIMS)
        if bad:
            raise ValueError(f"unknown LoRA targets {sorted(bad)}; have {sorted(_TARGET_DIMS)}")


def lora_scale(spec: LoraSpec) -> float:
    return spec.alpha / spec.rank


def init_lora(rng: jax.Array, model_spec, spec: LoraSpec) -> Params:
    """Adapter pytree: {proj_name: {"a": [L, r, in], "b": [L, out, r]}}.

    Keys use the decoder's internal projection names ("q", "gate", ...) so
    the layer scan can look them up directly.
    """
    L = model_spec.n_layers
    out: Params = {}
    keys = jax.random.split(rng, len(spec.targets))
    for key, target in zip(keys, spec.targets):
        in_attr, out_attr = _TARGET_DIMS[target]
        d_in = getattr(model_spec, in_attr)
        d_out = getattr(model_spec, out_attr)
        proj = {v: k for k, v in PROJ_TO_TARGET.items()}[target]
        out[proj] = {
            # A: gaussian / sqrt(in); B: zeros — standard LoRA init
            "a": (jax.random.normal(key, (L, spec.rank, d_in), jnp.float32)
                  / np.sqrt(d_in)).astype(spec.dtype),
            "b": jnp.zeros((L, d_out, spec.rank), spec.dtype),
        }
    return out


def apply_lora_delta(layer_lora: Params, x: jnp.ndarray, spec: LoraSpec,
                     rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Per-layer delta: scale * (x @ a^T) @ b^T. x: [B, S, in] → [B, S, out].

    ``layer_lora`` holds THIS layer's slices (leading layer axis consumed by
    the decoder's scan): a [r, in], b [out, r].

    ``rng``: when given and ``spec.dropout > 0``, inverted dropout is
    applied to the adapter INPUT (PEFT convention: only the low-rank path is
    regularized; the frozen base path is untouched). Inference/serving paths
    pass no rng — dropout is train-only by construction.
    """
    a = layer_lora["a"]
    b = layer_lora["b"]
    if rng is not None and spec.dropout > 0.0:
        keep = 1.0 - spec.dropout
        mask = jax.random.bernoulli(rng, keep, x.shape)
        x = jnp.where(mask, x / jnp.asarray(keep, x.dtype),
                      jnp.zeros((), x.dtype))
    # preferred_element_type = x.dtype: the MXU accumulates f32 internally
    # either way; emitting the working dtype directly makes the remat-saved
    # dot outputs half the bytes of an f32-out + astype pair (bit-identical
    # after rounding — docs/RESULTS.md round-2 profile). TPU-only
    # assumption: other XLA backends may legally accumulate a bf16-out dot
    # in reduced precision.
    z = jnp.einsum("bsi,ri->bsr", x, a.astype(x.dtype),
                   preferred_element_type=x.dtype)
    d = jnp.einsum("bsr,or->bso", z, b.astype(x.dtype),
                   preferred_element_type=x.dtype)
    return d * jnp.asarray(lora_scale(spec), x.dtype)


def merge_lora(params: Params, lora: Params, spec: LoraSpec) -> Params:
    """Fold adapters into base weights (export/serving path): w += scale·aᵀbᵀ."""
    import copy

    merged = dict(params)
    merged["layers"] = dict(params["layers"])
    name_map = {"q": "wq", "k": "wk", "v": "wv", "o": "wo",
                "gate": "w_gate", "up": "w_up", "down": "w_down"}
    for proj, ab in lora.items():
        wkey = name_map[proj]
        w = params["layers"][wkey]
        delta = jnp.einsum("lri,lor->lio", ab["a"].astype(jnp.float32),
                           ab["b"].astype(jnp.float32)) * lora_scale(spec)
        merged["layers"][wkey] = (w.astype(jnp.float32) + delta).astype(w.dtype)
    return merged


def lora_param_count(lora: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(lora))
