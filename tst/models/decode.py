"""KV-cached greedy decoding for numeric / open answers.

VSI-Bench's numerical-answer question types (object counting, distances,
room size — scored by MRA) need generated text, not a one-token option read
(reference README.md:35 benchmark list; SURVEY.md §2b B15 "greedy decode for
numeric/open answers"). TPU realization:

  * **prefill**: one batched forward over the (bucket-padded) prompt,
    returning final hidden states + post-RoPE per-layer K/V — the cache;
  * **decode**: ``lax.scan`` over ``max_new`` steps; each step runs the
    layer-scan on ONE token, attends over the fixed-size cache with a
    position mask (static shapes — no recompilation per step), and
    functionally updates the cache with a one-hot select over the position
    axis (a per-row dynamic_update_slice would lower to a batched scatter,
    whose TPU compile time is pathological — see the inline note);
  * greedy argmax; per-row prompt lengths handled by per-row cache
    positions. The whole prefill+decode is one jitted program, vmappable
    over the LoRA fold axis like every other stage.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tst.models.decoder import (
    ModelSpec,
    _qdot,
    apply_model,
    embed_lookup,
    apply_rope,
    lm_head_weight,
    rms_norm,
    rope_tables,
)
from tst.models.lora import LoraSpec, apply_lora_delta

# "scan" (default) or "unroll" — how the decode step iterates layers.
# Module-level like decoder.LAYER_LOOP so tests/benches can flip it.
LAYER_LOOP = "scan"

# Unrolling the decode layer loop makes the per-layer cache offsets static:
# XLA fuses the slice reads into the attention einsums instead of
# materializing per-layer copies (measured at 0.5B B=32: 3.42 → 2.83
# ms/step, compile 15 s). The env's remote compile helper rejects LARGE
# unrolled programs (the 24-layer train step crashes it), so gate unroll on
# layer count: fwd-only decode is measured-safe through 32 layers (8B-int8
# unrolled: compile 23.6 s, runs clean).
_UNROLL_MAX_LAYERS = 32

#: "auto" | "scan" | "unroll" — per-run override of ``layer_loop_for``'s
#: measured-safe gate (config ``perf.decode_layer_loop``, applied by
#: tst.runtime.knobs).
LAYER_LOOP_MODE = "auto"


def layer_loop_for(spec, fold_vmapped: bool = False) -> str:
    """The fastest measured-safe decode layer loop for a model geometry.

    Serving decode (one model, batch rows) measures unroll faster — the
    static cache offsets let XLA fuse slice reads into the attention dots.
    The FOLD-VMAPPED held-out decode inverts this at scale: vmapping the
    unrolled 32-layer int8 step makes XLA materialize per-layer bf16
    dequant temps, and the 8B [k=5, chunk=5] leg measures 86.6 s unrolled
    vs 16.9 s scanned; at 0.5B the two tie (5.06 vs 4.91 s)
    (scripts/probe_decode8b.py, probe_decode05b.py, 2026-08-19). So
    ``fold_vmapped`` always picks scan unless explicitly overridden.
    """
    if LAYER_LOOP_MODE != "auto":
        return LAYER_LOOP_MODE
    if fold_vmapped:
        return "scan"
    return "unroll" if spec.n_layers <= _UNROLL_MAX_LAYERS else "scan"


def _step_dot(y, leaf, dtype, use_pallas, stack=None, li=None) -> jnp.ndarray:
    """One decode-step projection dot, f32 out: y [B, T, D] @ W [D, F].

    Packed-int4 leaves on TPU route to the pallas dequant-matmul — at
    decode's tiny M, XLA does not fuse the planar dequant into the dot and
    the f32 halves spill to HBM (measured 57.8 vs 16.5 ms/step at 8B,
    tst/kernels/quant_matmul.py). The kernel is fed the UNSLICED layer
    stack (``stack``) plus the traced layer index (``li``): handing it the
    scan-sliced 2-D leaf instead forces XLA to copy that layer's packed
    bytes out of the stack every call — pallas inputs must be materialized
    — which re-triples the weight traffic the kernel exists to halve.
    Everything else (plain, int8, CPU, lane-misaligned halves) takes the
    XLA path via qdot on the sliced leaf."""
    from tst.models.quant import is_quantized_leaf

    if (use_pallas and stack is not None and li is not None
            and is_quantized_leaf(stack) and stack["q"].ndim == 3
            and stack["scale"].ndim == 4
            and stack["q"].shape[-1] % 128 == 0):
        from tst.kernels.quant_matmul import int4_matmul_stacked

        b, t = y.shape[0], y.shape[1]
        y2 = y.reshape(b * t, y.shape[-1])
        pad = (-(b * t)) % 8  # one sublane tile
        if pad:
            y2 = jnp.pad(y2, ((0, pad), (0, 0)))
        out = int4_matmul_stacked(y2, stack["q"], stack["scale"], li)
        return out[: b * t].reshape(b, t, out.shape[-1])
    return _qdot(y, leaf, dtype, preferred=jnp.float32)


def _chunk_step(params, lora, lora_spec, spec, tokens_bt, pos_bt, write_base,
                valid_mask, k_cache, v_cache, layer_loop=None,
                use_pallas=False):
    """T-token decode step with the contiguous-slot cache layout.

    ``tokens_bt`` [B, T] int32; ``pos_bt`` [B, T] = per-row semantic
    positions (drive RoPE); ``write_base`` = traced SCALAR cache slot — the
    chunk's K/V land at slots ``[write_base, write_base + T)`` shared by all
    rows, so the cache write is ONE dynamic_update_slice with a scalar start
    index instead of a per-row one-hot select over the whole cache (round
    2's select streamed + rewrote both [B, S, KVH, dh] caches per layer per
    step — ~0.5 GB/step of pure overhead at B=32; a per-row DUS would
    instead lower to a batched scatter whose TPU compile is pathological,
    >40 min). ``valid_mask`` [B, S] marks the committed slots each row may
    attend to; within the chunk, query ``t`` additionally sees chunk slots
    ``<= t`` (causal triangle) — so T=1 self-attends its own slot and the
    speculative verify chunk (tst/models/spec_decode.py) is causally exact.

    The FULL [L, B, S, KVH, dh] caches ride the layer scan's CARRY and each
    layer writes its T-token K/V via a scalar-indexed 5-D DUS at
    ``(layer, 0, write_base, 0, 0)`` — while-loop carries alias their
    buffers, so the write is in place. The earlier shape (caches as scan
    ``xs`` re-stacked as ``ys``) forced XLA to materialize a fresh cache
    pair every step: profiled at ~1.5 ms/step of pure DUS/slice/copy traffic
    at B=32×0.5B — ~40% of the step wall.

    Returns (greedy tokens [B, T], updated caches). Caches:
    [L, B, S, KVH, dh].
    """
    b, t_chunk = tokens_bt.shape
    s_max = k_cache.shape[2]
    x = embed_lookup(params, tokens_bt, spec)  # [B,T,D]
    cos_full, sin_full = rope_tables(s_max, spec.d_head, spec.rope_theta,
                                     spec.rope_scaling)
    cos_t = cos_full[pos_bt]  # [B,T,half]
    sin_t = sin_full[pos_bt]

    def rope_one(t):  # t: [B,T,H,dh] at per-row positions
        half = t.shape[-1] // 2
        t1, t2 = t[..., :half], t[..., half:]
        c = cos_t[:, :, None, :].astype(t.dtype)
        s = sin_t[:, :, None, :].astype(t.dtype)
        return jnp.concatenate([t1 * c - t2 * s, t2 * c + t1 * s], axis=-1)

    ar = jnp.arange(s_max, dtype=jnp.int32)
    tri = (ar[None, :] >= write_base) & (
        (ar[None, :] - write_base) <= jnp.arange(t_chunk, dtype=jnp.int32)[:, None]
    )  # [T, S] chunk-causal triangle at the shared slots
    mask = valid_mask[:, None, :] | tri[None]  # [B, T, S]

    def layer_body(carry, scanned):
        h_in, kc_all, vc_all = carry  # caches [L, B, S, KVH, dh]
        lw = scanned["w"]
        la = scanned.get("lora")
        li = scanned["i"]  # traced scalar layer index

        def proj(name, y, w_key):
            out = _step_dot(y, lw[w_key], spec.dtype, use_pallas,
                            stack=params["layers"].get(w_key),
                            li=li).astype(spec.dtype)
            if la is not None and name in la:
                out = out + apply_lora_delta(la[name], y, lora_spec)
            bias_key = {"q": "bq", "k": "bk", "v": "bv"}.get(name)
            if bias_key and bias_key in lw:
                out = out + lw[bias_key].astype(spec.dtype)
            return out

        h = rms_norm(h_in, lw["attn_norm"], spec.rms_eps)
        q = rope_one(proj("q", h, "wq").reshape(b, t_chunk, spec.n_heads, spec.d_head))
        k_new = rope_one(proj("k", h, "wk").reshape(b, t_chunk, spec.n_kv_heads, spec.d_head))
        v_new = proj("v", h, "wv").reshape(b, t_chunk, spec.n_kv_heads, spec.d_head)
        # ONE scalar-indexed DUS writes all rows' new K/V (slots shared);
        # indexing the carried full cache keeps the write in place
        zero = jnp.int32(0)
        kc_all = jax.lax.dynamic_update_slice(
            kc_all, k_new[None].astype(kc_all.dtype),
            (li, zero, write_base, zero, zero))
        vc_all = jax.lax.dynamic_update_slice(
            vc_all, v_new[None].astype(vc_all.dtype),
            (li, zero, write_base, zero, zero))
        kc = jax.lax.dynamic_index_in_dim(kc_all, li, axis=0, keepdims=False)
        vc = jax.lax.dynamic_index_in_dim(vc_all, li, axis=0, keepdims=False)
        # attend the T queries over the cache, masked per row + chunk triangle
        groups = spec.n_heads // spec.n_kv_heads
        qg = q.reshape(b, t_chunk, spec.n_kv_heads, groups, spec.d_head)
        scores = jnp.einsum("btkgd,bskd->bkgts", qg, kc,
                            preferred_element_type=jnp.float32) / np.sqrt(spec.d_head)
        scores = jnp.where(mask[:, None, None, :, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(spec.dtype)
        attn = jnp.einsum("bkgts,bskd->btkgd", probs, vc,
                          preferred_element_type=jnp.float32).astype(spec.dtype)
        attn = attn.reshape(b, t_chunk, spec.q_dim)
        h_mid = h_in + proj("o", attn, "wo")
        h = rms_norm(h_mid, lw["mlp_norm"], spec.rms_eps)
        gate = proj("gate", h, "w_gate")
        up = proj("up", h, "w_up")
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(spec.dtype) * up
        out = h_mid + proj("down", act, "w_down")
        return (out, kc_all, vc_all), None

    n_layers = k_cache.shape[0]
    if (layer_loop or LAYER_LOOP) == "unroll":
        # static layer indices: the per-layer weight reads and cache
        # slice/updates become static-offset ops XLA fuses into the consuming
        # einsums — kills the per-layer slice copies the scan form pays
        carry = (x, k_cache, v_cache)
        for i in range(n_layers):
            sc = {"w": jax.tree.map(lambda a: a[i], params["layers"]), "i": i}
            if lora is not None:
                sc["lora"] = jax.tree.map(lambda a: a[i], lora)
            carry, _ = layer_body(carry, sc)
        x, k_cache, v_cache = carry
    else:
        scanned = {"w": params["layers"],
                   "i": jnp.arange(n_layers, dtype=jnp.int32)}
        if lora is not None:
            scanned["lora"] = lora
        (x, k_cache, v_cache), _ = jax.lax.scan(
            layer_body, (x, k_cache, v_cache), scanned)
    x = rms_norm(x, params["final_norm"], spec.rms_eps)
    logits = jnp.einsum("btd,dv->btv", x, lm_head_weight(params, spec).astype(spec.dtype),
                        preferred_element_type=jnp.float32)  # [B, T, V]
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), k_cache, v_cache


def _decode_step(params, lora, lora_spec, spec, token_b, rope_pos_b,
                 write_slot, prompt_len_b, prompt_slots, k_cache, v_cache,
                 layer_loop=None, use_pallas=False):
    """One greedy step — the T=1 chunk step with the mask derived from the
    contiguous-slot layout: prompt slots ``[0, prompt_len)`` plus generated
    slots ``[prompt_slots, write_slot)`` (the chunk triangle supplies the
    self slot). Returns (next_token [B], updated caches)."""
    s_max = k_cache.shape[2]
    ar = jnp.arange(s_max, dtype=jnp.int32)[None, :]
    valid = (ar < prompt_len_b[:, None]) | (
        (ar >= prompt_slots) & (ar < write_slot))  # [B, S]
    nxt, k_cache, v_cache = _chunk_step(
        params, lora, lora_spec, spec, token_b[:, None], rope_pos_b[:, None],
        write_slot, valid, k_cache, v_cache, layer_loop=layer_loop,
        use_pallas=use_pallas)
    return nxt[:, 0], k_cache, v_cache


def greedy_decode(
    params,
    tokens: jnp.ndarray,  # int32 [B, S] right-padded prompts
    prompt_len: jnp.ndarray,  # int32 [B]
    max_new: int,
    spec: ModelSpec,
    lora=None,
    lora_spec: Optional[LoraSpec] = None,
    use_pallas: bool = False,
    pad_to: Optional[int] = None,
    layer_loop: Optional[str] = None,  # None → module LAYER_LOOP
) -> jnp.ndarray:
    """Greedy continuation of each prompt → int32 [B, max_new].

    Cache layout: prompt slots ``[0, S)`` (right-padded prompts as
    prefilled), then generated tokens left-aligned at the SHARED slots
    ``[S, S + step)`` — so each step's cache write is one scalar-indexed
    dynamic_update_slice (see :func:`_decode_step`). The generated region is
    padded to a 128 multiple so decode attention tiles cleanly.
    """
    b, s = tokens.shape
    gen_pad = max_new + (-max_new) % 128
    s_max = pad_to or (s + gen_pad)
    if s_max < s + max_new:
        # contiguous-slot layout writes generated K/V at [s, s + max_new);
        # a smaller cache would clamp later writes onto the last slot and
        # silently corrupt attention rather than fail
        raise ValueError(
            f"pad_to={pad_to} < prompt slots ({s}) + max_new ({max_new}); "
            "the KV cache needs room for every generated token")
    h, k_all, v_all = apply_model(params, tokens, spec, lora=lora,
                                  lora_spec=lora_spec, use_pallas=use_pallas,
                                  return_kv=True)
    pad = s_max - s
    k_cache = jnp.pad(k_all, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
    v_cache = jnp.pad(v_all, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
    # first generated token: argmax at the last prompt position
    h_last = jnp.take_along_axis(h, (prompt_len - 1)[:, None, None], axis=1)[:, 0]
    head = lm_head_weight(params, spec).astype(h.dtype)
    first = jnp.argmax(
        jnp.einsum("bd,dv->bv", h_last, head, preferred_element_type=jnp.float32),
        axis=-1,
    ).astype(jnp.int32)

    def step(carry, t):
        token, kc, vc = carry
        nxt, kc, vc = _decode_step(
            params, lora, lora_spec, spec, token,
            rope_pos_b=prompt_len + t, write_slot=jnp.int32(s) + t,
            prompt_len_b=prompt_len, prompt_slots=s, k_cache=kc, v_cache=vc,
            layer_loop=layer_loop, use_pallas=use_pallas)
        return (nxt, kc, vc), token

    (_, _, _), out = jax.lax.scan(
        step, (first, k_cache, v_cache), jnp.arange(max_new, dtype=jnp.int32)
    )
    return out.T  # [B, max_new]


def decode_text(
    gen_tokens: np.ndarray,  # greedy continuations [B, T]
    tokenizer,
) -> list:
    """Decode continuations to text, truncated at the first EOS token.

    (ByteTokenizer.decode silently drops ids >= 256, so without truncation
    the garbage generated *after* EOS would leak into the answer string.)
    """
    eos = getattr(tokenizer, "eos_id", None)
    out = []
    for ids in np.asarray(gen_tokens):
        ids = [int(t) for t in ids]
        if eos is not None and eos in ids:
            ids = ids[: ids.index(eos)]
        out.append(tokenizer.decode(ids).strip())
    return out


def decode_numeric(
    texts_tokens: np.ndarray,  # decoded token ids [B, T]
    tokenizer,
) -> np.ndarray:
    """Parse greedy continuations into float predictions (NaN if unparsable)."""
    import re

    out = np.full(texts_tokens.shape[0], np.nan, np.float32)
    for i, ids in enumerate(texts_tokens):
        text = tokenizer.decode([int(t) for t in ids])
        m = re.search(r"-?\d+(?:\.\d+)?", text.replace(",", ""))
        if m:
            try:
                out[i] = float(m.group())
            except ValueError:
                pass
    return out
