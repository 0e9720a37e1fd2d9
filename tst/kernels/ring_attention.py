"""Ring attention: causal attention with the sequence dim sharded over chips.

SURVEY.md §5 long-context: VideoMME subtitle transcripts blow past what one
chip's HBM holds at 32k+ tokens. Mechanism (the blockwise-parallel form):

  * Q/K/V are sequence-sharded over a mesh axis; each device keeps its Q
    block resident and computes partial attention against the K/V block it
    currently holds;
  * K/V blocks rotate around the ring with ``jax.lax.ppermute`` — point-to-
    point neighbor transfers that ride ICI and overlap with the next step's
    compute;
  * partial results carry (o, logsumexp) and merge with the same online-
    softmax correction flash attention uses within a chip, so the result is
    bit-comparable to unsharded attention;
  * causal masking is offset-aware: K/V blocks from entirely-future
    positions contribute nothing (their partial lse is -inf), the diagonal
    block is causally masked, past blocks attend fully.

The per-step partial is itself memory-bounded: a ``lax.scan`` over fixed
KV chunks with online softmax (never materializing [Sq_local, Skv_local]
beyond one chunk), differentiable end-to-end — long-sequence *training*
works, not just scoring.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _online_partial(q, k, v, q_off, kv_off, causal: bool, sm_scale: float,
                    chunk: int = 512):
    """Partial attention of local Q against one K/V block.

    q: [B, Sq, H, D]; k/v: [B, Skv, KVH, D]; offsets are global sequence
    positions of element 0 (traced scalars — fine in jnp, unlike in a Pallas
    grid). Returns (o [B, Sq, H, D] f32 — normalized within this block,
    lse [B, Sq, H] f32, -inf where fully masked).
    """
    b, sq, h, d = q.shape
    skv = k.shape[1]
    kvh = k.shape[2]
    groups = h // kvh
    chunk = min(chunk, skv)
    n_chunks = skv // chunk
    assert skv % chunk == 0, (skv, chunk)
    qg = q.reshape(b, sq, kvh, groups, d)
    q_pos = q_off + jnp.arange(sq)

    def body(carry, i):
        m_prev, l_prev, acc = carry
        ks = jax.lax.dynamic_slice_in_dim(k, i * chunk, chunk, axis=1)
        vs = jax.lax.dynamic_slice_in_dim(v, i * chunk, chunk, axis=1)
        s = jnp.einsum("bqkgd,bskd->bqkgs", qg, ks,
                       preferred_element_type=jnp.float32) * sm_scale
        if causal:
            kv_pos = kv_off + i * chunk + jnp.arange(chunk)
            mask = kv_pos[None, :] <= q_pos[:, None]  # [Sq, chunk]
            s = jnp.where(mask[None, :, None, None, :], s, NEG_INF)
        m_curr = jnp.max(s, axis=-1)
        m_next = jnp.maximum(m_prev, m_curr)
        # guard: fully-masked rows keep m at NEG_INF; exp(NEG_INF - NEG_INF)
        # would be 1, so shift against a safe max
        safe_m = jnp.maximum(m_next, NEG_INF + 1.0)
        alpha = jnp.exp(jnp.minimum(m_prev - safe_m, 0.0)) * (m_prev > NEG_INF / 2)
        p = jnp.exp(s - safe_m[..., None]) * (s > NEG_INF / 2)
        l_next = alpha * l_prev + p.sum(-1)
        pv = jnp.einsum("bqkgs,bskd->bqkgd", p.astype(v.dtype), vs,
                        preferred_element_type=jnp.float32)
        acc = acc * alpha[..., None] + pv
        return (m_next, l_next, acc), None

    m0 = jnp.full((b, sq, kvh, groups), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, sq, kvh, groups), jnp.float32)
    acc0 = jnp.zeros((b, sq, kvh, groups, d), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), jnp.arange(n_chunks))
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o = (acc / l_safe[..., None]).reshape(b, sq, h, d)
    lse = jnp.where(l > 0.0, m + jnp.log(l_safe), NEG_INF).reshape(b, sq, h)
    return o, lse


def _combine(o_a, lse_a, o_b, lse_b):
    """Merge two normalized partials by their logsumexps."""
    m = jnp.maximum(lse_a, lse_b)
    safe_m = jnp.maximum(m, NEG_INF + 1.0)
    wa = jnp.exp(jnp.minimum(lse_a - safe_m, 0.0)) * (lse_a > NEG_INF / 2)
    wb = jnp.exp(jnp.minimum(lse_b - safe_m, 0.0)) * (lse_b > NEG_INF / 2)
    denom = wa + wb
    safe = jnp.where(denom == 0.0, 1.0, denom)
    o = (o_a * wa[..., None] + o_b * wb[..., None]) / safe[..., None]
    lse = jnp.where(denom > 0.0, safe_m + jnp.log(safe), NEG_INF)
    return o, lse


def ring_attention(
    q: jnp.ndarray,  # [B, S, H, D] — S sharded over ``seq_axis``
    k: jnp.ndarray,  # [B, S, KVH, D]
    v: jnp.ndarray,
    mesh: Mesh,
    seq_axis: str = "data",
    causal: bool = True,
    sm_scale: Optional[float] = None,
    chunk: int = 512,
) -> jnp.ndarray:
    """Sequence-parallel attention over ``mesh[seq_axis]``; result matches
    unsharded attention. Call from ordinary (non-shard_map) code."""
    d = q.shape[-1]
    scale = sm_scale if sm_scale is not None else 1.0 / float(np.sqrt(d))
    n = mesh.shape[seq_axis]
    if n == 1:
        o, _ = _online_partial(q, k, v, 0, 0, causal, scale, chunk)
        return o.astype(q.dtype)

    spec = P(None, seq_axis, None, None)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=spec, check_vma=False,
    )
    def _ring(q_blk, k_blk, v_blk):
        s_local = q_blk.shape[1]
        idx = jax.lax.axis_index(seq_axis)
        perm = [(i, (i + 1) % n) for i in range(n)]

        def step(carry, i):
            o, lse, kb, vb = carry
            src = (idx - i) % n  # which device this K/V block came from
            o_i, lse_i = _online_partial(
                q_blk, kb, vb, idx * s_local, src * s_local, causal, scale, chunk
            )
            o, lse = _combine(o, lse, o_i, lse_i)
            kb = jax.lax.ppermute(kb, seq_axis, perm)
            vb = jax.lax.ppermute(vb, seq_axis, perm)
            return (o, lse, kb, vb), None

        b, sq, h, dd = q_blk.shape
        o0 = jnp.zeros((b, sq, h, dd), jnp.float32)
        lse0 = jnp.full((b, sq, h), NEG_INF, jnp.float32)
        (o, lse, _, _), _ = jax.lax.scan(
            step, (o0, lse0, k_blk, v_blk), jnp.arange(n)
        )
        return o.astype(q_blk.dtype)

    return _ring(q, k, v)
