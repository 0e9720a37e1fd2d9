"""Weights-only int8/int4 quantization of the frozen base model.

Why this exists: the blind-SFT diagnostic freezes the base LLM — only LoRA
adapters train — so the base is a read-only memory payload. Per-channel int8
halves it: Llama-3-8B drops from 16.1 GB (bf16, does NOT fit a 16 GB v5e
chip) to 8.2 GB, making the k-fold 8B stress-test runnable on one chip and
halving HBM weight traffic everywhere (the usual TPU bottleneck).

int8 scheme: symmetric per-output-channel scales, f32 scale vector per
matrix. int4 scheme: symmetric group-wise scales (group=128 along the
input axis — the standard RTN-g128 recipe; plain per-channel int4 loses
too much signal). int4 applies to the stacked layer matrices only; embed
and lm_head stay int8 (gather-friendly, quality-critical), so "int4" on
Llama-3-8B is ~4.6 GB of weights and near-halves the per-step weight read
once more.

int4 STORAGE is two signed nibbles per int8 byte (rows 2i → low nibble,
2i+1 → high, packed along the input axis), NOT jnp.int4: this
environment's remote TPU backend cannot take S4 arrays as jit arguments —
the relayout device_put recurses ("Recursively calling jit",
RecursionError) — and eager S4 ops fail the same way. Packed int8 has
byte-identical HBM footprint to XLA's packed S4, transfers/shards like
any int8 array on every backend, and the unpack (two shifts) fuses into
the consuming matmul's dequant prologue. A packed leaf is recognized by
its grouped scale being one rank higher than ``q``.

Dequantization (`q.astype(bf16) * scale`) happens inside the layer scan and
fuses into the consuming matmul's prologue — no materialized bf16 copy.
Norms and biases stay in the working dtype (tiny, precision-critical).
Gradients never flow to the base, so training semantics are unchanged;
forward error is the usual <1% per-channel weights-only noise for int8
(tested); int4-g128 sits near ~2% and is opt-in where HBM capacity, not
fidelity, binds (it buys remat headroom on the 8B k=5 leg).
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

#: int4 applies to the stacked layer matrices only: embed/lm_head rows are
#: gathered (group scales would need index arithmetic) and are the most
#: fidelity-sensitive leaves — they stay int8 under bits=4.
_INT4_KEYS = {"wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"}

#: int4 group size along the input axis (RTN-g128). Every spec's input dims
#: (d_model, q_dim, d_ff) are multiples of 128; quantize_leaf falls back to
#: per-channel int8 for any leaf where they are not.
INT4_GROUP = 128


def quantize_leaf(w: jnp.ndarray, bits: int = 8) -> Dict[str, jnp.ndarray]:
    """[..., in, out] weight → {"q": int8|int4, "scale": f32 broadcastable}.

    bits=8: per-output-channel symmetric — scale over the input axis per
    last-axis column, shape [..., 1, out] (for stacked [L, in, out] weights:
    per (L, out) — each layer keeps its own scales).

    bits=4: symmetric group-wise — the input axis is cut into
    :data:`INT4_GROUP`-row groups, one scale per (group, out) column; scale
    shape [..., in/g, 1, out] (one rank higher than q — how
    :func:`dequantize_leaf` recognizes the grouped layout). q is int8 with
    two signed nibbles per byte, shape [..., in/2, out] (see module
    docstring for why not jnp.int4).

    Stacked weights quantize layer-by-layer (``lax.map``) so the f32
    transient is ONE layer, not the whole stack — an 8B w_gate stack in f32
    alone is 7.5 GB.
    """
    if bits == 4 and w.ndim >= 2 and w.shape[-2] % INT4_GROUP == 0:
        return _quantize_leaf_int4(w)
    if bits not in (4, 8):
        raise ValueError(f"quantize_leaf: bits must be 4 or 8, got {bits}")

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


def _quantize_leaf_int4(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    g = INT4_GROUP

    def one(w2d):
        n_in, n_out = w2d.shape
        wf = w2d.astype(jnp.float32).reshape(n_in // g, g, n_out)
        amax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)  # [in/g, 1, out]
        scale = jnp.maximum(amax / 7.0, 1e-12)
        q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
        # nibble-pack adjacent input rows (2i → low nibble, 2i+1 → high);
        # pairs never straddle a group boundary (g is even)
        q = q.reshape(n_in // g, g // 2, 2, n_out)
        packed = ((q[:, :, 0, :] & 0xF) | (q[:, :, 1, :] << 4)).astype(jnp.int8)
        return packed.reshape(n_in // 2, n_out), scale.astype(jnp.float32)

    if w.ndim == 3:
        q, scale = jax.lax.map(one, w)
    else:
        q, scale = one(w)
    return {"q": q, "scale": scale}


def dequantize_leaf(leaf, dtype) -> jnp.ndarray:
    if is_quantized_leaf(leaf):
        q, scale = leaf["q"], leaf["scale"]
        if scale.ndim == q.ndim + 1:  # packed int4, scale [..., in/g, 1, out]
            n_groups = scale.shape[-3]
            n_in, n_out = 2 * q.shape[-2], q.shape[-1]
            lead = q.shape[:-2]
            p = q.reshape(*lead, n_groups, n_in // n_groups // 2, n_out)
            low = ((p << 4) >> 4).astype(jnp.float32)   # sign-extend nibble
            high = (p >> 4).astype(jnp.float32)          # arithmetic shift
            grouped = jnp.stack([low, high], axis=-2)    # [.., G, g/2, 2, out]
            grouped = grouped.reshape(*lead, n_groups, n_in // n_groups, n_out)
            return (grouped * scale).reshape(*lead, n_in, n_out).astype(dtype)
        return (q.astype(jnp.float32) * scale).astype(dtype)
    return leaf.astype(dtype)


def is_quantized_leaf(leaf) -> bool:
    return isinstance(leaf, dict) and "q" in leaf and "scale" in leaf


def leaf_bits(leaf_key: str, bits: int) -> int:
    """Effective bit width for one leaf: under bits=4 only the stacked layer
    matrices go int4; embed/lm_head stay int8."""
    return 4 if (bits == 4 and leaf_key in _INT4_KEYS) else 8


def quantize_params(params: Params, bits: int = 8) -> Params:
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
                node[key] = quantize_leaf(child, bits=leaf_bits(key, bits))
        return node

    return walk(params)


def quantizing_put(dtype=jnp.bfloat16, device=None, bits: int = 8):
    """A ``put`` callback for tst.models.hf_load.load_checkpoint that
    quantizes each streamed tensor on arrival — the 8B checkpoint never
    exists on device (or host) in bf16 at once."""

    def put(path: str, a) -> Any:
        leaf_key = path.split(".")[-1]
        x = jnp.asarray(a, dtype)
        if device is not None:
            x = jax.device_put(x, device)
        if leaf_key in _QUANT_KEYS:
            return quantize_leaf(x, bits=leaf_bits(leaf_key, bits))
        return x

    return put


def quantized_bytes(params: Params) -> int:
    # int4 leaves are already nibble-packed into int8, so a plain
    # size × itemsize sum is exact for every representation.
    return sum(leaf.size * leaf.dtype.itemsize
               for leaf in jax.tree.leaves(params))


def leaf_logical_shape(leaf) -> tuple:
    """Pre-quantization shape of a plain or quantized leaf (undoes the
    packed-int4 halving of the input axis)."""
    if not is_quantized_leaf(leaf):
        return tuple(leaf.shape)
    q, scale = leaf["q"], leaf["scale"]
    if scale.ndim == q.ndim + 1:  # packed int4
        return (*q.shape[:-2], 2 * q.shape[-2], q.shape[-1])
    return tuple(q.shape)
