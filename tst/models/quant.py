"""Weights-only int8 quantization of the frozen base model.

Why this exists: the blind-SFT diagnostic freezes the base LLM — only LoRA
adapters train — so the base is a read-only memory payload. Per-channel int8
halves it: Llama-3-8B drops from 16.1 GB (bf16, does NOT fit a 16 GB v5e
chip) to 8.2 GB, making the k-fold 8B stress-test runnable on one chip and
halving HBM weight traffic everywhere (the usual TPU bottleneck).

Scheme: symmetric per-output-channel scales, f32 scale vector per matrix.
Dequantization (`q.astype(bf16) * scale`) happens inside the layer scan and
fuses into the consuming matmul's prologue — no materialized bf16 copy.
Norms and biases stay in the working dtype (tiny, precision-critical).
Gradients never flow to the base, so training semantics are unchanged;
forward error is the usual <1% per-channel weights-only noise (tested).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

#: leaves quantized: the large matmul weights (embed handled too — gather
#: rows dequantize just as cheaply). Norms/biases excluded.
_QUANT_KEYS = {"embed", "lm_head", "wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"}


def quantize_leaf(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[..., out] weight → {"q": int8, "scale": f32 [..., 1, out]-broadcastable}.

    Per-output-channel symmetric: scale over the input axis per last-axis
    column (for stacked [L, in, out] weights: per (L, out) — each layer keeps
    its own scales). Stacked weights quantize layer-by-layer (``lax.map``) so
    the f32 transient is ONE layer, not the whole stack — an 8B w_gate stack
    in f32 alone is 7.5 GB.
    """

    def one(w2d):
        wf = w2d.astype(jnp.float32)
        amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) if w2d.ndim >= 2 \
            else jnp.max(jnp.abs(wf))
        scale = jnp.maximum(amax / 127.0, 1e-12)
        q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
        return q, scale.astype(jnp.float32)

    if w.ndim == 3:
        q, scale = jax.lax.map(one, w)
    else:
        q, scale = one(w)
    return {"q": q, "scale": scale}


def dequantize_leaf(leaf, dtype) -> jnp.ndarray:
    if is_quantized_leaf(leaf):
        return (leaf["q"].astype(jnp.float32) * leaf["scale"]).astype(dtype)
    return leaf.astype(dtype)


def is_quantized_leaf(leaf) -> bool:
    return isinstance(leaf, dict) and "q" in leaf and "scale" in leaf


def quantize_params(params: Params) -> Params:
    """Quantize the big matrices of a base-param pytree (norms/biases kept).

    Mutates ``params`` IN PLACE, leaf by leaf, so each source leaf's buffer
    is freed as soon as its int8 replacement is enqueued — peak device
    memory is original + ONE leaf, not original + quantized copy. (An 8B
    bf16 tree alone is 16.1 GB — over a v5e's HBM — so the caller should
    also prefer :func:`quantizing_put` to never materialize it; this
    in-place path covers trees built leaf-wise on device.)
    """

    def walk(node):
        for key, child in node.items():
            if isinstance(child, dict) and not is_quantized_leaf(child):
                walk(child)
            elif key in _QUANT_KEYS and not is_quantized_leaf(child):
                node[key] = quantize_leaf(child)
        return node

    return walk(params)


def quantizing_put(dtype=jnp.bfloat16, device=None):
    """A ``put`` callback for tst.models.hf_load.load_checkpoint that
    quantizes each streamed tensor on arrival — the 8B checkpoint never
    exists on device (or host) in bf16 at once."""

    def put(path: str, a) -> Any:
        leaf_key = path.split(".")[-1]
        x = jnp.asarray(a, dtype)
        if device is not None:
            x = jax.device_put(x, device)
        if leaf_key in _QUANT_KEYS:
            return quantize_leaf(x)
        return x

    return put


def quantized_bytes(params: Params) -> int:
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total
