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

int4 STORAGE is two signed nibbles per int8 byte, NOT jnp.int4: this
environment's remote TPU backend cannot take S4 arrays as jit arguments —
the relayout device_put recurses ("Recursively calling jit",
RecursionError) — and eager S4 ops fail the same way. Packed int8 has
byte-identical HBM footprint to XLA's packed S4 and transfers/shards like
any int8 array on every backend. A packed leaf is recognized by its
grouped scale being one rank higher than ``q``.

The pack layout is PLANAR along the output axis — column ``j`` in the low
nibble, column ``j + out/2`` in the high nibble — so a matmul against the
packed weight splits into two dots whose operands are pure elementwise
chains over the packed bytes (shift, convert, group-scale via contiguous
reshapes): XLA fuses each chain into its dot's prologue and the int4
weight is never materialized (:func:`qdot`). An interleaved layout (row
pairs packed along the input axis) was measured first and is ~2x slower
end-to-end: its stack+reshape reconstruction defeats the dot-prologue
fusion and a full f32 weight spills to HBM per use
(scripts/microbench_int4_dequant.py: planar 2-dot +92 us over the pure
bf16 matmul at [3584,4096,4096] vs interleave's +774 us — planar even
beats fused int8's +158 us, the halved weight read showing through).

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
    two signed nibbles per byte packed planar along the output axis, shape
    [..., in, out/2] (see module docstring for why not jnp.int4 and why
    planar).

    Stacked weights quantize layer-by-layer (``lax.map``) so the f32
    transient is ONE layer, not the whole stack — an 8B w_gate stack in f32
    alone is 7.5 GB.
    """
    if (bits == 4 and w.ndim >= 2 and w.shape[-2] % INT4_GROUP == 0
            and w.shape[-1] % 2 == 0):
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
        q = q.reshape(n_in, n_out)
        # planar nibble pack along out: col j → low nibble, j + out/2 → high.
        # The low nibble is stored BIASED (+8, unsigned in [1, 15]) and the
        # high signed, so byte == 16*hi + lo_biased as a plain int8 value —
        # the bias keeps the low nibble non-negative so adding it cannot
        # carry into the high nibble's bits. The decode kernel's unpack is
        # then a short f32 chain with no shift ops (Mosaic cannot legalize
        # vector int8 shifts): hi = floor(byte/16), lo = byte - 16*hi - 8
        # (quant_matmul.py), and XLA's qdot path fuses the same chain.
        packed = ((q[:, n_out // 2:] << 4)
                  + (q[:, : n_out // 2] + 8)).astype(jnp.int8)
        return packed, scale.astype(jnp.float32)

    if w.ndim == 3:
        q, scale = jax.lax.map(one, w)
    else:
        q, scale = one(w)
    return {"q": q, "scale": scale}


def _unpack_half(q, scale, which: int, dtype) -> jnp.ndarray:
    """Dequantize one planar nibble half of a packed-int4 leaf → f32-scaled
    ``dtype`` [..., in, out/2]. ``which``: 0 = low nibbles (columns
    [0, out/2)), 1 = high (columns [out/2, out)). A pure elementwise chain
    plus contiguous reshapes — fuses into a consuming dot's prologue."""
    n_groups = scale.shape[-3]
    lead, n_in, n_half = q.shape[:-2], q.shape[-2], q.shape[-1]
    # low nibble is stored biased +8 (see _quantize_leaf_int4); high signed
    vals = ((q & 0xF) - 8) if which == 0 else (q >> 4)
    s = scale[..., :n_half] if which == 0 else scale[..., n_half:]
    wf = vals.reshape(*lead, n_groups, n_in // n_groups, n_half).astype(jnp.float32) * s
    return wf.reshape(*lead, n_in, n_half).astype(dtype)


def dequantize_leaf(leaf, dtype) -> jnp.ndarray:
    if is_quantized_leaf(leaf):
        q, scale = leaf["q"], leaf["scale"]
        if scale.ndim == q.ndim + 1:  # packed int4, scale [..., in/g, 1, out]
            return jnp.concatenate(
                [_unpack_half(q, scale, 0, dtype),
                 _unpack_half(q, scale, 1, dtype)], axis=-1)
        return (q.astype(jnp.float32) * scale).astype(dtype)
    return leaf.astype(dtype)


def qdot(y: jnp.ndarray, leaf, dtype, preferred=None) -> jnp.ndarray:
    """``y[..., in] @ W[in, out]`` against a plain or quantized 2-D weight
    leaf, without materializing a packed-int4 weight.

    Packed leaves run one dot per planar nibble half — each half's dequant
    chain is elementwise + contiguous reshapes, which XLA fuses into that
    dot's prologue — then a single output concat restores column order
    (measured: the fused pair beats even the int8 path at train shapes,
    scripts/microbench_int4_dequant.py). int8/plain leaves take the usual
    fused-dequant single dot.

    ``dtype`` is the weight working dtype; ``preferred`` the dot's
    accumulator/output dtype (defaults to ``dtype``)."""
    preferred = preferred or dtype
    if (is_quantized_leaf(leaf) and leaf["q"].ndim == 2
            and leaf["scale"].ndim == 3):
        q, scale = leaf["q"], leaf["scale"]
        lo = jnp.einsum("...k,kn->...n", y, _unpack_half(q, scale, 0, dtype),
                        preferred_element_type=preferred)
        hi = jnp.einsum("...k,kn->...n", y, _unpack_half(q, scale, 1, dtype),
                        preferred_element_type=preferred)
        return jnp.concatenate([lo, hi], axis=-1)
    return jnp.einsum("...k,kn->...n", y, dequantize_leaf(leaf, dtype),
                      preferred_element_type=preferred)


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
    packed-int4 halving of the output axis)."""
    if not is_quantized_leaf(leaf):
        return tuple(leaf.shape)
    q, scale = leaf["q"], leaf["scale"]
    if scale.ndim == q.ndim + 1:  # packed int4
        return (*q.shape[:-1], 2 * q.shape[-1])
    return tuple(q.shape)
